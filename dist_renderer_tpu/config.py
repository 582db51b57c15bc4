"""Unified dataclass config tree.

The reference has no unified config: each task script uses argparse and the
decoder architecture comes from DeepSDF ``specs.json`` (SURVEY.md §5,
"Config / flag system"). Here everything lives in one frozen-dataclass tree so
configs are hashable and can be passed as static args under ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """DeepSDF decoder architecture (mirror of specs.json "NetworkSpecs").

    Defaults match the published DeepSDF architecture the reference consumes
    (core/net/deep_sdf_decoder.py in the reference): 8 hidden layers x 512,
    latent 256, skip-concat of the network input at layer 4, final tanh.
    """

    latent_size: int = 256
    hidden_dims: Tuple[int, ...] = (512,) * 8
    latent_in: Tuple[int, ...] = (4,)
    xyz_in_all: bool = False
    use_tanh: bool = False          # tanh between hidden layers (DeepSDF "use_tanh")
    final_tanh: bool = True         # DeepSDF always applies nn.Tanh() at the output
    clamp_dist: float = 0.1         # DeepSDF "ClampingDistance" (training-time loss clamp)
    dropout_prob: float = 0.0       # eval mode: dropout off (reference renders in eval)

    @property
    def input_dim(self) -> int:
        return self.latent_size + 3

    @property
    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        """(in_dim, out_dim) per linear layer, replicating DeepSDF's rule:
        a layer feeding a skip-concat layer has its output shrunk so that
        concat([h, input]) lands back on the configured width."""
        dims = (self.input_dim,) + self.hidden_dims + (1,)
        out = []
        n_layers = len(dims) - 1
        for l in range(n_layers):
            in_dim = dims[l]
            out_dim = dims[l + 1]
            if (l + 1) in self.latent_in and (l + 1) < n_layers:
                out_dim = out_dim - dims[0]
            if self.xyz_in_all and 0 < l < n_layers - 1 and l not in self.latent_in:
                in_dim = in_dim + 3
            if l in self.latent_in:
                in_dim = dims[l]  # concat already accounted for by previous shrink
            out.append((in_dim, out_dim))
        return tuple(out)


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Sphere-tracing schedule (SURVEY.md §3.1).

    Reference analog: SDFRenderer constructor args in
    core/sdfrenderer/renderer.py (march_step/threshold defaults tagged
    [R, verify] in SURVEY.md — mount was empty, values from the paper).
    """

    max_steps: int = 50
    alpha: float = 1.5              # aggressive marching gain (paper §3.3)
    convergence_eps: float = 5e-5   # |sdf| < eps => surface hit (normalized units)
    depth_eps: float = 1e-5         # secant bracket width => converged (robust
                                    # criterion for learned/noisy SDFs)
    sphere_radius: float = 1.0      # DeepSDF shapes normalized into unit sphere
    far_margin: float = 0.05        # march past sphere exit by this before "miss"
    use_compaction: bool = False    # fixed-shape live-ray compaction buckets
    bucket_frac: int = 4            # bucket capacity = n_rays / bucket_frac
    inner_steps: int = 16           # march steps per compaction round
    coarse_to_fine: bool = False    # staged-resolution marching (perf layer)
    c2f_strides: Tuple[int, ...] = (4,)    # coarse levels (then full res)
    c2f_backoff: float = 0.05       # step back from upsampled coarse depth
    c2f_coarse_steps: int = 24      # step cap at coarse levels (classification
                                    # only needs approximate convergence; rays
                                    # that get close but don't resolve still
                                    # count as hit_any, so no skip is wrong)
    c2f_classify: bool = True       # work-class partition: rays whose whole
                                    # coarse neighborhood missed skip the fine
                                    # march (margin anchored at the coarse
                                    # min-SDF point); rays sorted by class so
                                    # Pallas blocks are work-homogeneous
    scheduler: str = "auto"         # fine-march scheduler: "rounds" (multi-
                                    # round XLA sort re-binning) | "queue"
                                    # (one-launch in-kernel work queue;
                                    # semantically ONE full-budget march) |
                                    # "auto" (queue at F=1, rounds batched)
    queue_caps: Tuple[int, ...] = (1, 2, 6, 16)  # work-queue generation caps
    queue_dense_frac: float = 0.5   # gen-0 chunks below this occupancy are
                                    # packed to the queue WITHOUT marching
                                    # (pure scheduling — bit-identical; 0.5
                                    # measured best at 512^2 on v5e)
    proxy_backoff: float = 0.015    # distilled-proxy march (models/proxy.py):
                                    # the verify stage's full-decoder march
                                    # seeds at (proxy depth - backoff).
                                    # CONSERVATIVE default for arbitrary
                                    # proxies — tune per proxy to ~its
                                    # error-report p99 (every extra retreat
                                    # adds ~1 step of block residency to
                                    # EVERY seeded block: 0.015 measured 4.7
                                    # vs ~2 at 0.005 on the bench proxy;
                                    # models/proxy.py::proxy_march_margins
                                    # derives it, bench.py applies it), but
                                    # never zero: demoted-false-hit margin
                                    # sampling needs the pre-surface retreat
                                    # (ops/pallas/batched_march.py verify
                                    # docstring)
    proxy_verify_mode: str = "march"  # "march": every proxy hit confirmed by
                                    # a seeded full-decoder march (MEASURED
                                    # BEST on v5e: 18.3 vs cert's 20.6-23.1
                                    # ms/frame at 512^2 F=8 — the cert
                                    # kernel's per-block probe cost + extra
                                    # glue exceed the ~2.5-step seeded march
                                    # it replaces; scripts/diag_proxy_ab.py).
                                    # "cert": proxy hits certified with 2
                                    # dense full-decoder probe evals around
                                    # the proxy depth (ops/cert.py; failures
                                    # demote to the re-march)
    proxy_verify_hits: str = "march"  # proxy-HIT verify treatment
                                    # (render_batched_c2f verify_hits):
                                    # "march" — seeded full-decoder
                                    # confirmation march per proxy hit;
                                    # depth/hit genuine out of the trace.
                                    # "polish" — hits skip the verify
                                    # march (only band/unres rays
                                    # re-march); the full-decoder Newton
                                    # polish in renderer compose()
                                    # re-anchors depth and demotes hits
                                    # whose polished |f| exceeds
                                    # convergence_eps, so RENDERED outputs
                                    # stay genuine while the verify stage
                                    # shrinks from ~24% of rays to ~3.4%.
                                    # Use polish_iters >= 2 with this.
                                    # Trace-only consumers (raw
                                    # render_batched_c2f without compose)
                                    # should finalize hits themselves —
                                    # see verify_hits docs.
                                    # "polish-all" — additionally, fine
                                    # band rays skip their entry-seeded
                                    # re-march (the EXPENSIVE verify term:
                                    # 6.8 of 11.6 ms/frame at F=64 for
                                    # 3.4% of rays, r5) and become weak
                                    # candidates polished from the proxy
                                    # dip anchor; stalled weak rays
                                    # default to miss. Batched
                                    # trace+finalize contract; the
                                    # single-frame render path maps it
                                    # to "polish".
    proxy_verify_band: str = "march"  # band rays under verify_mode="cert":
                                    # "march" (full-decoder march from sphere
                                    # entry — margin error ~1-2e-3) or
                                    # "probe" (3-probe parabola at the proxy
                                    # argmin — ~15x cheaper, margin error
                                    # bounded by ~2x the proxy's field error
                                    # on grazing dips; hit/miss verdicts stay
                                    # genuine). See render_batched_c2f's
                                    # verify_band docstring.
    proxy_band: float = 0.02        # proxy-miss rays with margin below this
                                    # get a full re-march (the hit/miss
                                    # verdict band the proxy cannot decide).
                                    # CONSERVATIVE default — tune per proxy
                                    # to (error max + ~2.5x march eps): band
                                    # re-marches from sphere entry are the
                                    # dominant verify cost and scale
                                    # linearly with this (bench proxy: max
                                    # 7.3e-3 -> band 0.012)
    proxy_verify_caps: Optional[Tuple[int, ...]] = (2, 4, 12)
                                    # round caps (rounds scheduler) / gen caps
                                    # (queue) for the VERIFY stage only; None
                                    # = the main schedule. The verify step
                                    # distribution is bimodal (seeded hits
                                    # ~1-3 evals, band/unres long), so a tiny
                                    # round 0 + repack stops straggler
                                    # residency-max on converged lanes.
                                    # (2,4,12) MEASURED BEST on v5e at 512^2
                                    # F=64: 16.41 -> 15.47 ms/frame vs the
                                    # main (4,12), hit flips 0, depth deltas
                                    # confined to salvage-boundary rays
                                    # <= 3.4e-3 pre-polish
                                    # (scripts/diag_verify_caps.py, r5)
    proxy_verify_caps_queue: Optional[Tuple[int, ...]] = None
                                    # gen caps (queue scheduler, F=1 latency
                                    # path) for the VERIFY stage; None = the
                                    # main queue gen caps (6, 16). Kept
                                    # separate from proxy_verify_caps: the
                                    # rounds-tuned (2,4,12) reused as queue
                                    # gen caps REGRESSED F=1 fwd 25.3 ->
                                    # 26.5 ms (r5 batch #1 bench vs
                                    # BENCH_r04; diag_verify_caps F=1 queue
                                    # sweep decides any non-None default)
    proxy_block_width: Optional[int] = 1024
                                    # Pallas block (ray lanes) for the PROXY
                                    # march stage only; None = the main
                                    # block (512). The proxy's weights are
                                    # ~20x smaller, so wider blocks amortize
                                    # the march's per-block VPU machinery
                                    # (2.36 us/512 lanes at 512 vs 2.00 at
                                    # 2048 on uniform work) — but block
                                    # residency is a max over the block, so
                                    # width also coarsens the work grouping.
                                    # 1024 MEASURED BEST in the full graph on
                                    # v5e at 512^2 F=64 (16.43 -> 15.98
                                    # ms/frame, bit-identical; 2048 ties at
                                    # 16.01 — scripts/diag_proxy_block.py,
                                    # r5). Rounds scheduler only (the queue
                                    # kernel's compaction one-hots scale as
                                    # block^2 in VMEM; queue clamps to the
                                    # main block).


@dataclasses.dataclass(frozen=True)
class GradConfig:
    """Backward-pass mode for the tracer (SURVEY.md §3.2)."""

    mode: str = "last_step"   # "last_step" (DIST) | "ift" (implicit function thm)
    ift_min_denom: float = 1e-2   # clamp on n·v in the IFT denominator
    polish_iters: int = 1     # fp32 Newton refinements of the converged depth
                              # (>1 lets the bf16 march stop at a loose eps;
                              # extra iterations run under stop_gradient, the
                              # final one stays differentiable)
    compact_frac: int = 0     # >0: run the differentiable recompute (precise
                              # value + normals/IFT vjp) on a hit-compacted
                              # bucket of n/compact_frac rays instead of full
                              # width — misses only need a cheap margin eval.
                              # A lax.cond falls back to full width whenever
                              # the hit count exceeds the bucket, so results
                              # never depend on the hit fraction.
    compact_min: int = 16384  # smallest ray count where compaction pays
    fused_dd: bool = False    # IFT denominator from the fused value+tangent
                              # eval (decoder_apply_with_dd) instead of a
                              # separate jvp. MEASURED NEGATIVE on v5e in
                              # context (fwd 34.8 -> 39.4 ms) despite being
                              # 2 ms faster in isolation — XLA schedules the
                              # separate jvp better inside the full graph;
                              # kept as an option for other deployments.
    recompute_block: int = 512  # ray-lane block of the fused recompute
                              # kernels (fwd kernel VMEM at 512 lanes is
                              # ~14.8 MB of the 16 MB budget — drop to 256
                              # if a hardware lowering rejects it)
    recompute: str = "pallas" # "xla": precise value + jvp denominator +
                              # normals vjp as separate XLA computations
                              # (each materializes [bucket, 512] activations
                              # in HBM — bandwidth-bound). "pallas" (the
                              # default since it was measured on v5e: fwd
                              # 34.5 -> 29.8 ms, fwd+bwd 43.5 -> 34.4 ms at
                              # 512^2, grad cos 1.0000): ONE fused kernel
                              # returns (value, denominator, spatial
                              # gradient) with everything VMEM-resident
                              # (ops/pallas/recompute.py); the custom VJP
                              # runs a second fused kernel.
                              # Caveats of "pallas": requires mode="ift" and
                              # autograd normals (normal_eps==0); normals
                              # come back VALUE-exact but stop-gradient (no
                              # pose Hessian flow through normal losses).
                              # polish_iters>1 runs safeguarded full-Newton
                              # refinements (fresh denominator, monotone-|f|
                              # acceptance). Latent gradients use precise-
                              # forward gates — measured ~10x CLOSER to the
                              # fp32 composition than the XLA bf16 backward
                              # (tests/test_recompute.py).


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Top-level render configuration."""

    img_h: int = 256
    img_w: int = 256
    march: MarchConfig = dataclasses.field(default_factory=MarchConfig)
    grad: GradConfig = dataclasses.field(default_factory=GradConfig)
    normal_eps: float = 0.0         # 0 => autograd normals; >0 => central differences
    background_depth: float = 0.0   # sentinel depth for missed rays
    compute_dtype: str = "float32"  # "float32" | "bfloat16" (matmul inputs)
    use_pallas: bool = False        # fused Pallas MLP march kernel

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def c2f_strides_valid(self) -> Tuple[int, ...]:
        """Coarse-to-fine strides that evenly divide this image size."""
        return tuple(
            s for s in self.march.c2f_strides
            if s > 1 and self.img_h % s == 0 and self.img_w % s == 0
        )


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Inverse-rendering loss weights (SURVEY.md §3.3-3.5)."""

    w_depth: float = 10.0
    w_silhouette: float = 1.0
    w_photometric: float = 1.0
    w_normal: float = 0.0
    w_latent_reg: float = 1e-4


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer harness for latent / pose fitting."""

    lr: float = 1e-2
    steps: int = 200
    lr_decay_steps: int = 100
    lr_decay_rate: float = 0.5
    checkpoint_every: int = 50      # orbax checkpoint cadence (0 = off)


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Mesh layout for multi-chip rendering (SURVEY.md §2 parallelism table)."""

    mesh_axes: Tuple[str, ...] = ("latents", "rays")
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = infer from device count
