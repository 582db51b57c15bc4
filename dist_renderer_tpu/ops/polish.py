"""Full-decoder Newton polish for raw batched marches.

The batched throughput path (ops/pallas/batched_march.py::render_batched_c2f
— BASELINE.json config #5, bench.py's headline) returns the MARCH depth
directly: there is no differentiable composition, so nothing re-anchors it.
That was fine while the march ran the full decoder (bf16 bracket width
depth_eps ~5e-4); marching a distilled proxy (models/proxy.py) leaves
proxy-sized error (~few e-3) in the depth, which would fail the ≤1e-3
parity bar (SURVEY.md §6).

polish_depth_batched runs 1-2 safeguarded fp32 full-decoder Newton
iterations at the marched hit points via the fused recompute kernel
(ops/pallas/recompute.py: value + directional derivative in one
VMEM-resident launch, ~2.5 eval-equivalents/ray) on a hit-first bucket —
the VERDICT-r3 "verification eval": ~0.2-0.6 full-eval equivalents per
frame ray, quadratically collapsing proxy depth error onto the full
decoder's fp32 zero set. It also returns the full-decoder residual |f| at
the converged point, which tests use to certify hits against the full
field (a proxy false-hit shows up as a residual the polish cannot shrink).

Everything here is stop-gradient (a forward-path utility); the
differentiable paths (render_rays / fit loops) already polish through
sdf_fn inside compose().
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import Params

_sg = jax.lax.stop_gradient


def polish_depth_batched(
    params: Params,
    dcfg: DecoderConfig,
    latents: jax.Array,          # [F, L]
    origins: jax.Array,          # [F, N, 3]
    dirs: jax.Array,             # [F, N, 3]
    depth: jax.Array,            # [F, N] march depth (proxy or full)
    hit: jax.Array,              # [F, N] bool
    iters: int = 2,
    bucket_frac: int = 4,
    block: int = 512,
    min_denom: float = 1e-2,
    max_step: float = 0.05,
    interpret: Optional[bool] = None,
    return_residual: bool = False,
) -> jax.Array | Tuple[jax.Array, jax.Array]:
    """Newton-polish batched hit depths against the FULL decoder.

    Hit rays are sorted to a static bucket of N//bucket_frac per frame
    (the per-frame lax.sort vectorizes over F — same glue pattern as the
    rounds scheduler); each polish iteration is one fused value+gradient
    launch, with the compose()-style safeguards: denominator clamped
    front-facing, step clamped to ±max_step, accepted only where |f|
    shrinks (false hits cannot diverge). Hits beyond the bucket (never at
    production hit fractions — ~21% at 512²; bucket_frac=4 covers 25%)
    keep their march depth.

    Returns polished depth [F, N]; with return_residual=True also the
    full-decoder |f| at the final point per ray (+inf where miss) —
    the hit-certification signal.
    """
    from dist_renderer_tpu.ops.pallas.recompute import make_precise_sdg

    F, N = depth.shape
    bucket = min(((N // bucket_frac + block - 1) // block) * block, N)
    sdg = make_precise_sdg(params, dcfg, block=block, interpret=interpret)

    key = (~hit).astype(jnp.int32)
    pix = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (F, N))
    _, pix_s = jax.lax.sort((key, pix), dimension=1, num_keys=1,
                            is_stable=True)
    idx_b = _sg(pix_s[:, :bucket])                      # [F, bucket]

    take = lambda a: jnp.take_along_axis(
        a, idx_b[..., None] if a.ndim == 3 else idx_b, axis=1
    )
    o_b = take(origins)
    v_b = take(dirs)
    d_b = _sg(take(depth))
    hit_b = take(hit)

    def one_frame(z, o, v, d, h):
        s, dd, _ = sdg(z, o + d[:, None] * v, v)
        s, dd = _sg(s), _sg(dd)
        best = jnp.abs(s)
        resid = best
        for _ in range(iters):
            denom = jnp.minimum(dd, -min_denom)
            step = jnp.clip(s / denom, -max_step, max_step)
            ok = h & (dd < -min_denom)
            d_try = jnp.where(ok, d - step, d)
            s2, dd2, _ = sdg(z, o + d_try[:, None] * v, v)
            s2, dd2 = _sg(s2), _sg(dd2)
            accept = ok & (jnp.abs(s2) <= best)
            d = jnp.where(accept, d_try, d)
            s = jnp.where(accept, s2, s)
            dd = jnp.where(accept, dd2, dd)
            best = jnp.minimum(best, jnp.abs(s2))
            resid = jnp.where(accept, jnp.abs(s2), resid)
        return d, jnp.where(h, resid, jnp.inf)

    d_pol, resid_b = jax.vmap(one_frame)(latents, o_b, v_b, d_b, hit_b)

    # scatter the polished bucket back (misses in the bucket are untouched
    # by construction: one_frame only moves rays with h=True)
    d_pol = jnp.where(hit_b, d_pol, d_b)
    depth_out = jax.vmap(lambda base, idx, val: base.at[idx].set(val))(
        depth, idx_b, d_pol
    )
    if not return_residual:
        return depth_out
    res_full = jnp.full((F, N), jnp.inf, depth.dtype)
    res_full = jax.vmap(lambda base, idx, val: base.at[idx].set(val))(
        res_full, idx_b, resid_b
    )
    return depth_out, res_full
