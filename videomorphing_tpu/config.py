"""Frozen configuration dataclasses for the morphing pipeline.

The reference keeps the energy weights, pyramid depth and iteration counts in
its project XML + Qt parameter dialogs (SURVEY.md section 6 "Config / flag
system"); here they are frozen dataclasses so a config hashes as a jit static
argument and every run is reproducible.

Defaults follow [TOG14] where the papers pin a value and otherwise use the
surveyed, tuned values (SURVEY.md section 1.2 marks the exact reference
constants as unverifiable — the reference mount was empty).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MorphParams:
    """Parameters of the halfway-domain correspondence optimization.

    Energy (per halfway pixel p, [TOG14] sections 3.1-3.3):
        E(v) = mean_p[ E_SIM(p) + lambda_tps * E_TPS(p) ]
               + gamma_ui * mean_p[ w_ui(p) |v(p) - v_ui(p)|^2 ]
               + beta_tc  * mean_p[ w_tc(p) |v(p) - v_tc(p)|^2 ]   (video)
    """

    # --- energy weights -------------------------------------------------
    lambda_tps: float = 0.005     # TPS smoothness weight [TOG14 s3.2]
    gamma_ui: float = 50.0        # user-point soft-constraint weight [TOG14 s3.3]
    beta_tc: float = 0.5          # temporal-coherence weight [EGSR14 s4]
    ui_sigma: float = 4.0         # spatial falloff (px) of a UI point's pull

    # --- SSIM data term [TOG14 s3.1] ------------------------------------
    ssim_window: int = 5          # Gaussian window diameter (odd)
    ssim_sigma: float = 1.0       # Gaussian window sigma (px)
    ssim_c1: float = 1e-4         # (0.01)^2 for images in [0,1]
    ssim_c2: float = 9e-4         # (0.03)^2
    ssim_use_luminance: bool = True   # full SSIM vs contrast*structure only

    # --- coarse-to-fine pyramid [TOG14 s4] -------------------------------
    n_levels: int = 0             # 0 = auto: down to min(H,W) ~ min_level_size
    # 16, not 32: the coarsest level must be small enough that unaided
    # displacements land inside the SSIM window's basin there. Probed on
    # chip with the golden gates (utils/golden.py): at 256^2 a 32^2
    # coarsest level fails to lock a (5, 8) px shift from zero init
    # (ssim_mid 0.79), a 16^2 coarsest locks it exactly (0.9999). The
    # extra level costs one ~16^2 solve — microseconds.
    min_level_size: int = 16
    iters_coarse: int = 200       # iterations at the coarsest level
    iters_fine: int = 30          # iterations at the finest level (geometric in
                                  # between; probed at 480p: vs 50 the morph
                                  # changes by ~1e-4 mean abs)
    tol: float = 1e-7             # early stop: relative energy decrease per iter

    # --- descent / line search (SURVEY.md s1.3) ---------------------------
    n_colors: int = 2             # checkerboard colors (1 = plain Jacobi)
    init_step: float = 1.0        # initial trust scale for preconditioned step
    step_grow: float = 1.25       # step growth after an accepted iteration
    step_shrink: float = 0.5      # backtracking shrink factor
    max_backtracks: int = 10
    armijo_c: float = 1e-4        # sufficient-decrease constant
    min_step: float = 1e-8

    # --- constraints -----------------------------------------------------
    fold_margin: float = 0.45     # fraction of neighbor gap an update may cover
    boundary_lock: bool = True    # edges map to edges [TOG14 s3.4]

    # --- numerics ---------------------------------------------------------
    dtype: str = "float32"
    precond_eps: float = 1e-3

    # --- execution backend (SURVEY.md s8 stage 4) -------------------------
    # "auto": fused Pallas sweep kernels on TPU, plain jnp elsewhere;
    # "pallas"/"jnp" force one path. Both compute identical math (the jnp
    # path is the oracle; tests/test_pallas.py checks equivalence).
    backend: str = "auto"
    # Re-warp (XLA gather of I0/I1 at p -/+ v) every `relin_every`
    # iterations; inner iterations use the first-order linearization of the
    # warp around the last re-warp point (the classic warping-scheme
    # structure of TV-L1/Horn-Schunck solvers). 1 = re-warp every iteration.
    # The gather is the single most expensive op on TPU (no texture units),
    # so this directly scales solver throughput. Default 8 since round 4:
    # the round-2 rejection of 4->8 (p99 0.04 diff-vs-default) predates the
    # relin_median robustifier; WITH the median the ground-truth gates are
    # neutral-to-better (golden rotation v_err 0.0061 -> 0.0043 px,
    # stressor robust 0.90911 vs 0.90914) and the 1080p cold solve drops
    # 1.27 -> 0.75 s (PERF.md round 4). exact_configs pins 1.
    relin_every: int = 8
    # Pallas kernels pay off only above this pixel count (per level).
    pallas_min_pixels: int = 16384
    # Use the fused Pallas warp kernel (pallas.warp) for re-warps on the
    # pallas backend; it falls back to the XLA gather per call when the
    # field's within-tile variation exceeds the kernel budget.
    fused_warp: bool = True
    # Storage dtype of the STATIC sweep pack (warp planes, derivatives,
    # v_lin, constraint/data planes): "float32" (exact; the oracle) or
    # "bfloat16" (halves the pack's HBM footprint and per-tile DMA). In
    # bf16 mode the linearization point is quantized to bf16 BEFORE the
    # re-warp so the stored planes and stored v_lin stay exactly
    # consistent; the per-call v planes and ALL in-kernel arithmetic stay
    # f32 (kernels upcast after the DMA), so the correction dv = v - v_lin
    # is computed exactly. Quality-probed end-to-end (PERF.md).
    pack_dtype: str = "float32"
    # Emit the fused warp kernel's output DIRECTLY in the sweep static-pack
    # layout (pallas.warp.fused_warp_planes_packed), splitting the pack
    # into warp / v_lin / per-level-const refs: the XLA stack/pad/column-
    # group repack of the warp planes disappears from every
    # re-linearization. Requires fused_warp and a compatible tile geometry
    # (falls back to the combined pack otherwise). Default pending the
    # on-chip measurement (TODO.md perf rank 1).
    warp_into_pack: bool = False
    # Run the cheap sufficient variation screen (4 diff+max reductions)
    # BEFORE the fused warp kernel's per-tile prep, per band: a wild band
    # skips straight to the XLA gather path instead of paying the full
    # prep only to cond it away (the sampler always screens —
    # pallas.warp.fused_sample). Trade-off: the screen is conservative,
    # so borderline-but-fitting bands lose the fast path; tame bands pay
    # the screen ON TOP of the prep. Default pending the on-chip A/B
    # (TODO.md perf ledger); exactness is unaffected either way — the
    # precise ``fits`` check remains the backstop.
    warp_prescreen: bool = False
    # Median-filter the field (3x3, per component) at each re-linearization
    # — the Sun-Roth-Black "secrets of optical flow" heuristic: equivalent
    # to optimizing a robustified energy, it rejects the salt-and-pepper
    # SSIM mislocks that descent cannot escape (scripts/diag_wild.py:
    # p99.9 field error 10.9 px at 768p on quasi-periodic texture, NOT
    # fixed by 2x iterations — it is the energy landscape, not
    # under-convergence). Those mislocks are also what busts the fused
    # warp/sampler kernels' per-tile residual budgets (17-28% of 4K tiles
    # -> the render runs ~all-gather, 15x slower; PERF.md round 3), so
    # this is a quality AND throughput knob. Locked boundary components
    # are excluded from the filter; pure elementwise min/max network
    # (ops/windows.py median3x3) at relin cadence, so its cost is noise.
    # Default ON since round 4 — the on-chip A/B and quality sweep
    # (PERF.md round 4): 1080p north-star wall neutral (19.16 vs 19.06 s),
    # 4K solve 11.93 -> 6.6 s, golden rotation SSIM 0.99949 -> 0.99988,
    # stressor mid-SSIM +0.027 (hs) / +0.029 (robust) at 480p/0.12 drift.
    # The paper-exact oracle (exact_configs) pins it OFF.
    relin_median: bool = True

    def iters_for_level(self, level: int, n_levels: int) -> int:
        """Iteration budget per level; geometric from coarse to fine.

        ``level`` counts 0 = finest .. n_levels-1 = coarsest.
        """
        if n_levels <= 1:
            return self.iters_coarse
        frac = level / (n_levels - 1)          # 1 at coarsest, 0 at finest
        it = self.iters_fine * (self.iters_coarse / self.iters_fine) ** frac
        return max(1, int(round(it)))


@dataclasses.dataclass(frozen=True)
class SynthParams:
    """Parameters of morph synthesis (paths, warps, blending) [TOG14 s5]."""

    # quadratic motion paths [TOG14 s5.1]
    quadratic_paths: bool = True
    path_smooth_mu: float = 25.0     # screened-Poisson smoothing of the bulge field
    max_bulge: float = 32.0          # clamp on |b| in pixels (robustness)

    # backward path inversion (SURVEY.md s1.4 item 2)
    invert_iters: int = 6            # fixed-point iterations to invert x_t(p)=q
    invert_multiscale: bool = True   # run all but the last iter at half res
    fused_sampling: bool = True      # Pallas fused sampler for render warps (TPU)
    # Final color-sampling interpolant: "bilinear" (default; fused-sampler
    # eligible) or "bicubic" (Catmull-Rom, sharper renders, ~4x gather cost,
    # XLA path only). Solver sampling is always bilinear — the SSIM window
    # statistics don't benefit from a higher-order interpolant.
    sampling: str = "bilinear"

    # blending [TOG14 s5.2]
    blend_mode: str = "poisson"      # "linear" | "poisson" (gradient-domain)
    blend_screen_lambda: float = 0.1  # data-term weight of the screened blend
    extend_levels: int = 0           # 0 = auto pull-push depth
    occlusion_weighting: bool = True  # video: shift weights off occluded source

    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class VideoParams:
    """Parameters of the video pipeline [EGSR14]."""

    # optical flow (pyramid Horn-Schunck; any flow of similar quality
    # satisfies the contract — SURVEY.md s1.5)
    flow_alpha: float = 12.0         # smoothness weight (8-bit intensity units)
    flow_iters: int = 40             # Jacobi iterations per level (probed at
                                     # 480p: vs 60 the morph changes by ~1e-4
                                     # mean abs — flow is only a prior)
    flow_levels: int = 0             # 0 = auto
    flow_warps: int = 2              # warping (outer) iterations per level
                                     # (probed at 480p: vs 3, ~2e-4 mean abs)
    flow_clamp: float = 1.0          # max |du| (px) per warp iteration
    # Brox/TV-L1-class robust option (video/flow.py _robust_level):
    # structure-texture (high-pass) prefilter + coupled Charbonnier data
    # penalty + gradient-constancy channels + TV-like smoothness. Survives
    # lighting/gain drift and motion discontinuities that break plain
    # Horn-Schunck; ~3x the FLOPs per iteration. All constants probed on a
    # synthetic multi-scale texture with a +0.15 brightness shift
    # (tests/test_video.py): plain HS EPE 8.2 px, robust 0.4-0.6 px. The
    # prefilter carries most of the lighting invariance (the second-order
    # gradient-constancy linearization alone proved too fragile to carry
    # the flow through the pyramid at high gamma); Charbonnier handles
    # occlusions/specular outliers; TV keeps motion boundaries sharp.
    #
    # DECISION RULE (measured on the real-footage-class stressor,
    # utils/stressor.py — moving occluder + motion discontinuity +
    # lighting drift): keep OFF when the two takes are exposure-matched —
    # HS tracks the stressor background to <0.5 px EPE with drift=0 and
    # the flow phase stays ~3x cheaper. Turn ON when the takes have
    # exposure/lighting drift or hard motion discontinuities: under a 12%
    # gain drift HS background EPE blows up (6.0 px) and the END-TO-END
    # morph LOSES to a plain cross-dissolve (mid-frame SSIM 0.883 vs
    # 0.917) while robust stays at 0.11 px EPE and wins (0.935)
    # (tests/test_stressor.py; 480p confirmation:
    # scripts/probe_stressor.py, table in PERF.md).
    flow_robust: bool = False
    flow_alpha_robust: float = 6.0   # smoothness weight in robust mode (the
                                     # TV reweighting changes the effective
                                     # scale, hence separate from flow_alpha)
    flow_irls: int = 5               # lagged-nonlinearity (weight) updates
                                     # per warp; flow_iters splits across them
    flow_gamma: float = 10.0         # gradient-constancy weight vs intensity
    flow_eps: float = 3.0            # Charbonnier eps, intensity units (0-255)
    flow_eps_s: float = 0.5          # TV eps for smoothness, pixel units
    # Structure-texture prefilter sigma (px, at the flow's working
    # resolution): grayscale input becomes I - gauss_blur(I) + 127.5 before
    # the solve, killing additive/low-frequency lighting. Active in robust
    # mode only; 0 disables.
    flow_hp_sigma: float = 6.0
    # Flow is only used to warm-start/regularize the halfway solve and for
    # occlusion masks (SURVEY.md s1.5: "any flow of similar quality
    # satisfies the contract"), so it runs at a reduced resolution and is
    # upsampled; 1.0 = full resolution.
    flow_scale: float = 0.5

    # occlusion detection [EGSR14 s5]
    occlusion_thresh: float = 1.0    # fwd/bwd inconsistency threshold (px)
    occlusion_soft: float = 0.5      # softness of the occlusion sigmoid
    # Route the round-trip lookup bwd(p + fwd(p)) through the Pallas fused
    # sampler on TPU (exact twin of the XLA gather path, which cost 9.7 s
    # of the 34.2 s north star — PERF.md round 3). Off = plain gather.
    fused_occlusion: bool = True
    # Same routing for the advection inversion's six samples per warm
    # frame (temporal.advect_halfway_field) — the warm scan's gather tax.
    fused_advect: bool = True
    # Same routing for the flow solver's one warp-update gather per outer
    # iteration (video/flow.py _warp_gray); tiny pyramid levels stay on
    # the plain gather either way.
    fused_flow: bool = True

    # temporal propagation [EGSR14 s4]
    propagate: bool = True
    tc_fill_thresh: float = 0.25     # min splat weight to trust a propagated v (splat oracle)
    advect_invert_iters: int = 3     # fixed-point iters inverting the advection map
    advect_residual: float = 0.75    # px: inversion residual where confidence hits 0
    advect_scale: float = 0.5        # resolution the advection inversion runs at
    # warm-solve schedule for propagated frames [EGSR14 s4: far fewer
    # iterations than a cold start]: mid = half-res level, fine = full res
    # (probed at 480p: halving these vs 30/20 changes output by ~2e-4 mean
    # abs — warm frames start close to the optimum)
    warm_iters_mid: int = 20
    warm_iters_fine: int = 12
    # number of warm-solve pyramid levels; 0 = auto (1 — full res only —
    # up to ~1080p since round 4, stressor-gated; 3 above so 4K keeps a
    # coarse safety net when advection confidence is low; see
    # video.pipeline.warm_level_count). Non-finest levels run
    # warm_iters_mid, the finest warm_iters_fine.
    warm_levels: int = 0
    # Re-warp cadence DURING THE WARM SCAN (0 = inherit morph.relin_every).
    # Warm-started frames move the field far less per level than a cold
    # solve, so the first-order warp linearization stays valid across more
    # iterations — and on real converged 1080p fields the exact re-warp is
    # the warm scan's single most expensive op (the within-tile coordinate
    # variation busts the fused-warp kernel's residual budget, so every
    # relin pays the index-count-bound XLA gather: 51 ms at 1080p, 16 ms
    # at the mid level — round-4 device trace). Default 12 (fine level:
    # initial warp only; mid: initial + one relin): warm scan 12.18 ->
    # 5.96 s / north star 1.57 -> 2.32 f/s on chip, stressor analytic
    # mid-frame gate UNCHANGED (0.90914 vs 0.90913 robust, 0.88913 vs
    # 0.88883 hs — PERF.md round 4). The paper-exact oracle pins 1.
    # ESCAPE HATCH for fast-motion / low-advect-confidence content outside
    # the stressor's distribution (ADVICE r4): --set video.warm_levels=2
    # restores the half-res coarse recovery level and --set
    # video.warm_relin_every=1 restores exact re-warps every iteration;
    # both revert to the pre-round-4 conservative warm schedule.
    warm_relin_every: int = 12

    dtype: str = "float32"


def exact_configs() -> Tuple[MorphParams, SynthParams, VideoParams]:
    """The "paper-exact" slow reference configuration (in-repo oracle).

    Every speed default that trades work for fidelity is reverted to its
    exact/slow setting: jnp backend (no fused kernels), re-warp every
    iteration (no linearized inner iterations), full-resolution flow and
    advection, full iteration budgets, full-resolution path inversion,
    f32 pack. With the reference mount empty (SURVEY.md section 0), this
    is the strongest in-repo stand-in for "what the paper's algorithm
    computes" — the fast defaults are regression-tested against it
    (tests/test_exact_oracle.py), and any future knob must keep the gap
    to this configuration inside the probe tolerances logged in PERF.md.
    """
    mp = MorphParams(
        backend="jnp",          # plain-jnp oracle path, no Pallas
        fused_warp=False,
        relin_every=1,          # exact warp every iteration
        relin_median=False,     # no robustification: the raw paper energy
        pack_dtype="float32",
        iters_coarse=200,
        iters_fine=50,          # pre-probe budget (30 is the probed fast value)
    )
    sp = SynthParams(
        invert_multiscale=False,  # full-res fixed-point path inversion
        fused_sampling=False,
        invert_iters=10,
    )
    vp = VideoParams(
        flow_iters=60,
        flow_warps=3,
        flow_scale=1.0,           # full-resolution flow
        advect_scale=1.0,         # full-resolution advection inversion
        warm_iters_mid=30,
        warm_iters_fine=20,
        warm_relin_every=1,       # exact warp every warm iteration
        warm_levels=2,            # the pre-round-4 half-res safety level
        fused_occlusion=False,    # plain-gather twins of the fused samples
        fused_advect=False,
        fused_flow=False,
    )
    return mp, sp, vp


# Canonical benchmark configurations from BASELINE.json `configs`.
BENCH_CONFIGS: Tuple[str, ...] = (
    "pair_256",        # config 1: 256x256 pair, 16 in-betweens
    "pair_1k",         # config 2: 1024x1024, 5-level pyramid, UI points, Poisson blend
    "video_480p",      # config 3: 30 frames 480p, temporal propagation
    "video_1080p",     # config 4: 1080p, quadratic paths, occlusion-aware blend, DP
    "batch_4k",        # config 5: multi-pair 4K streaming over a v5e-8
)
