#!/bin/bash
# Round-3 continuation queue — the steps of scripts/onchip_queue.sh that had
# not yet run when the session driving it died (plus the round-3 additions:
# 4K VIDEO end-to-end, north-star phase breakdown, layered scaling).
#
#   bash scripts/onchip_queue_r3.sh [outdir]      (default /tmp/onchip)
#
# Same methodology as onchip_queue.sh: one retry per step (fresh big-program
# compiles can wedge the remote compile service; a retry resumes from the
# incremental cache), one log per step, chip kept exclusive per step.

set -u
cd "$(dirname "$0")/.."
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

# 1. 4K pair: re-measure solve + render with fresh inputs (the round-2
#    figure was result-cache-contaminated) + fits diagnostics
step profile_4k 3600 python scripts/profile_4k.py

# 2. 4K VIDEO end-to-end (VERDICT r2 task 4: config 5's video story above
#    1080p has never run on the chip) — 8-frame 2160x3840 clip through
#    morph_video incl. the auto 3-level warm-solve schedule
step video_4k 7200 env BENCH_FRAMES=8 BENCH_H=2160 BENCH_W=3840 BENCH_REPEATS=2 python bench.py

# 3. North-star phase breakdown: pick the round-3/4 perf target from
#    current data, not the round-2 table
step profile_northstar 3600 python scripts/profile_northstar.py

# 4. The remaining BASELINE configs (driver-visible artifact coverage)
step pair_256 1800 python bench.py pair_256
step pair_1k  2400 python bench.py pair_1k
step batch_4k 3600 python bench.py batch_4k

# 5. Finish the relin attribution (the make_state split timings were lost
#    when the prior session died mid-step)
step profile_relin 2400 python scripts/profile_relin.py

# 6. Layered-video scaling on the chip (VERDICT r2 task 8)
step profile_layered 3600 python scripts/profile_layered.py

echo "=== r3 queue done; $FAILED step(s) failed twice; logs in $OUT ==="
grep -h '"metric"' "$OUT"/*.log 2>/dev/null
exit "$FAILED"
