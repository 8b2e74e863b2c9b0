#!/bin/bash
# The on-chip experiment queue — run this the moment the TPU tunnel is back.
#
#   bash scripts/onchip_queue.sh [outdir]      (default /tmp/onchip)
#
# Captures every measurement that was blocked on the round-2 tunnel outage,
# in value order, one log per step. Methodology per PERF.md: each step gets
# a hard timeout and ONE retry — fresh big-program compiles can wedge the
# remote compile service; a killed retry resumes from the incremental
# compile cache and completes.

set -u
cd "$(dirname "$0")/.."          # repo root: the axon backend needs cwd here
OUT="${1:-/tmp/onchip}"
mkdir -p "$OUT"
FAILED=0

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  if timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1; then
    tail -3 "$OUT/$name.log"
    return 0
  fi
  local rc=$?
  echo "--- $name failed (rc=$rc), retrying once (wedge methodology) ---"
  sleep 20
  timeout "$tmo" "$@" > "$OUT/$name.retry.log" 2>&1
  rc=$?
  tail -3 "$OUT/$name.retry.log"
  if [ $rc -ne 0 ]; then
    echo "!!! $name failed twice (rc=$rc)"
    FAILED=$((FAILED + 1))
  fi
  return $rc
}

# 1. Mosaic-vs-jnp kernel equivalence and the golden gates — these GATE
#    everything else: if the kernels or the fidelity gates are broken,
#    don't burn the tunnel window collecting numbers under a broken config
step kernels 1200 python bench.py kernels || { echo "ABORT: kernel gate failed"; exit 2; }
step golden  2400 python bench.py golden  || { echo "ABORT: golden gate failed"; exit 2; }

# 2. The north star, default config (30-frame 1080p measured)
step north_star 3600 python bench.py

# 3. A/B the two pending perf knobs on the north-star workload
step ab_warp_into_pack 3600 env BENCH_SET=morph.warp_into_pack=true python bench.py
step ab_bf16_pack      3600 env BENCH_SET=morph.pack_dtype=bfloat16 python bench.py
step ab_warp_prescreen 3600 env BENCH_SET=morph.warp_prescreen=true python bench.py

# 4. Quality probes for the knobs (decision data for flipping defaults)
step probe_bf16 2400 python scripts/probe_knob.py --set morph.pack_dtype=bfloat16
step probe_flow_scale 2400 python scripts/probe_knob.py --set video.flow_scale=0.25

# 5. Kernel-level cost attribution (relin vs iteration; split-pack timing)
step profile_relin 2400 python scripts/profile_relin.py

# 6. 4K: re-measure render with fresh inputs (round-2 figure was
#    result-cache-contaminated), fits diagnostics now mirror _prep_image
step profile_4k 3600 python scripts/profile_4k.py

# 7. The remaining BASELINE configs
step pair_256 1800 python bench.py pair_256
step pair_1k  2400 python bench.py pair_1k
step batch_4k 3600 python bench.py batch_4k

echo "=== queue done; $FAILED step(s) failed twice; logs in $OUT ==="
grep -h '"metric"' "$OUT"/*.log 2>/dev/null
exit "$FAILED"
