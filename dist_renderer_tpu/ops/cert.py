"""Probe-bracket certification of proxy-claimed hits + dense probing of
proxy near-misses (the "band").

The proxy verify stage's original design re-marched the full decoder for
BOTH classes: proxy hits got a seeded confirmation march (~4.9 ms/frame
of block-steps at 512^2 F=8) and band rays a full march from sphere
entry (~3.2 ms/frame) — block residency is the MAX over 512 rays and
pins at the round cap, so per-ray seeding quality barely moves it
(scripts/diag_proxy_ab.py + block-residency accounting). Neither class
needs a march:

HIT CERTIFICATION — a proxy hit whose depth is within +-delta of the
true surface is certified by TWO dense full-decoder evals:

    f_a = f(o + a.v), a = max(d_proxy - delta, t_near)
    f_b = f(o + b.v), b = d_proxy + delta

    f_a > 0 >= f_b  =>  the full field crosses zero in [a, b]: HIT, with
    depth = the secant point — the same regula-falsi estimator the march
    itself applies to a fresh bracket of this width (+ optional
    regula-falsi refinement rounds, one eval each). Anything else =>
    DEMOTED: the ray falls back to a seeded full-decoder march (seed
    d - delta — exactly the verify_mode="march" treatment), so a proxy
    false hit or a depth error beyond delta still ends in a genuine
    full-decoder march verdict. delta is the caller's proxy_backoff
    (tuned to the proxy's error p99 by models/proxy.proxy_march_margins),
    so demotions are the measured-rare tail.

BAND PROBING — a proxy miss with margin < proxy_band only needs (1) a
genuine full-decoder hit/miss verdict and (2) an accurate near-zero
margin for silhouette losses. The proxy's argmin depth t_m localizes
the field dip; THREE dense evals at t_m - w, t_m + w, t_m fit a
quadratic through the dip:

    margin = the parabola's vertex value (clamped by the sample min
    when the fit is non-convex or the vertex leaves the window).

If the estimated minimum dips <= promote_eps (callers pass ~the proxy
error p99 — the estimate's own error bound, see the promote_eps arg)
the full field may cross where the proxy read a miss: the ray is
PROMOTED to a seeded full-decoder march at (t_vertex - delta), whose
verdict is exact. Why probing beats the entry-seeded re-march it
replaces: the dip-flatness argument — if |f_proxy - f_full| <= e
everywhere, the full field at the proxy argmin is within ~2e of the
true minimum REGARDLESS of how badly the argmin itself is localized
(quadratic dip: value error kappa/2*dt^2 = e exactly when dt =
sqrt(2e/kappa)), and the parabola removes the second-order term. The
march it replaces sampled the dip by aggressive-step luck (same
failure mode the window-seeded march had, batched_march docstring) at
~50x the eval cost.

Both classes ride ONE hit-sorted static bucket per frame through the
bank-aware eval kernel (ops/pallas/mlp_eval.pallas_point_eval_banked).
Positions use the bf16x2 split path (march_body.mlp_apply p8_lo): probe
spacing ~0.01 is ~2.5x the bf16 position quantum at |p|~1, so
single-bf16 positions would alias probes onto the same lattice site.

Everything here is stop-gradient (forward-path march machinery;
gradients flow only through the differentiable recompute in
ops/renderer.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import MarchConfig
from dist_renderer_tpu.ops.camera import ray_sphere_entry

_sg = jax.lax.stop_gradient


class CertResult(NamedTuple):
    certified: jax.Array   # [F, N] bool — bracket confirmed by the full field
    depth: jax.Array       # [F, N] secant depth where certified, else input
    f_inside: jax.Array    # [F, N] full-decoder value at probe b (<= 0 where
                           # certified; +inf where never probed)
    overflow: jax.Array    # [F, N] bool — candidates beyond the bucket
                           # (never at production hit fractions); the caller
                           # must route them through the march fallback
    band_margin: jax.Array  # [F, N] full-decoder dip-minimum estimate for
                            # band rays (+inf where not band-probed)
    band_tmin: jax.Array    # [F, N] depth of that estimate (anchor input
                            # where not band-probed)
    promoted: jax.Array     # [F, N] bool — band rays whose full-field dip
                            # crosses zero: re-march seeded at tmin - delta


def certify_hits_batched(
    shared,                    # SharedDecoder of the FULL decoder
    bank: jax.Array,           # [total, F_pad] full-decoder bias bank
    origins: jax.Array,        # [F, N, 3] or [F, 1, 3] (shared origin)
    dirs: jax.Array,           # [F, N, 3]
    depth: jax.Array,          # [F, N] proxy march depth
    seeded: jax.Array,         # [F, N] bool — proxy hits to certify
    march: MarchConfig,
    delta: float,
    block: int = 512,
    bucket_frac: int = 4,
    refine: int = 1,
    interpret: bool = False,
    band: Optional[jax.Array] = None,    # [F, N] bool — proxy near-misses
    anchor: Optional[jax.Array] = None,  # [F, N] proxy argmin depth (required
                                         # with band)
    band_w: float = 0.02,                # band probe half-window
    promote_eps: float = 0.0,            # band rays with estimated dip min
                                         # <= promote_eps re-march seeded.
                                         # The parabola vertex carries up to
                                         # ~2x the PROXY's field error (the
                                         # dip-flatness bound above: the
                                         # probe WINDOW is proxy-localized
                                         # even though probe VALUES are
                                         # full-decoder), so a true hit with
                                         # a shallow dip can estimate
                                         # slightly positive. Callers must
                                         # pass ~the proxy error p99 (the
                                         # same quantity as proxy_backoff)
                                         # for genuine hit/miss verdicts;
                                         # 0.0 trusts the estimate exactly.
) -> CertResult:
    from dist_renderer_tpu.ops.pallas.batched_march import _round_up
    from dist_renderer_tpu.ops.pallas.mlp_eval import pallas_point_eval_banked

    F, N = depth.shape
    if band is None:
        band = jnp.zeros((F, N), bool)
        anchor = depth
    else:
        if anchor is None:
            raise ValueError("band probing requires the proxy argmin anchor")
        # the band's center probe rides the first refinement round
        refine = max(refine, 1)

    # bucket: a block multiple >= block; gathered entries capped at N (the
    # probe lanes beyond N are padded dead below)
    K = _round_up(max(N // bucket_frac, block), block)
    K_idx = min(K, N)

    depth = _sg(depth)
    anchor = _sg(anchor)
    cand = seeded | band

    # hit-first compaction (same sort-with-payload glue as the rounds
    # scheduler / polish_depth_batched: TPU gathers are the expensive op,
    # one multi-operand lax.sort moves key+pix together)
    key = (~cand).astype(jnp.int32)
    pix = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (F, N))
    _, pix_s = jax.lax.sort((key, pix), dimension=1, num_keys=1,
                            is_stable=True)
    idx = pix_s[:, :K_idx]                               # [F, K_idx]

    take2 = lambda a: jnp.take_along_axis(a, idx, axis=1)
    take3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
    v_b = take3(dirs)                                    # [F, K_idx, 3]
    o_b = (jnp.broadcast_to(origins, (F, K_idx, 3))
           if origins.shape[1] == 1 else take3(origins))
    hit_b = take2(seeded)
    band_b = take2(band)
    act_b = hit_b | band_b
    d_b = jnp.where(hit_b, take2(depth), take2(anchor))

    # overflow: candidates that did not fit the bucket (route to the march
    # fallback). in_bucket via scatter of the bucket indices.
    in_bucket = jnp.zeros((F, N), bool)
    in_bucket = jax.vmap(lambda m, i: m.at[i].set(True))(in_bucket, idx)
    overflow = cand & ~in_bucket

    t_near, _, _ = ray_sphere_entry(
        o_b.reshape(-1, 3), v_b.reshape(-1, 3), march.sphere_radius, 0.0
    )
    t_near = t_near.reshape(F, K_idx)
    wlo = jnp.where(hit_b, delta, band_w)
    whi = jnp.where(hit_b, delta, band_w)
    a = jnp.maximum(d_b - wlo, t_near)
    b = d_b + whi

    if K_idx < K:  # sub-block frame: pad probe lanes with dead entries
        pad = K - K_idx
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        o_p = jnp.pad(o_b, ((0, 0), (0, pad), (0, 0)))
        v_p = jnp.pad(v_b, ((0, 0), (0, pad), (0, 0)))
    else:
        pad = 0
        padf = lambda x: x
        o_p, v_p = o_b, v_b
    a_p, b_p, act_p = padf(a), padf(b), padf(act_b)

    # probe layout: per frame, K a-probes then K b-probes — blocks stay
    # frame-pure and hit-sorted, so trailing blocks are dead and the eval
    # kernel's dead-block fast path skips them
    p_a = o_p + a_p[..., None] * v_p
    p_b = o_p + b_p[..., None] * v_p
    pts = jnp.concatenate([p_a, p_b], axis=1).reshape(-1, 3)   # [F*2K, 3]
    act2 = jnp.concatenate([act_p, act_p], axis=1).reshape(-1)
    frame_of_block = jnp.repeat(
        jnp.arange(F, dtype=jnp.int32), (2 * K) // block
    )

    vals = pallas_point_eval_banked(
        shared, bank, frame_of_block, pts, act2, block=block,
        interpret=interpret,
    ).reshape(F, 2 * K)
    f_a = vals[:, :K][:, :K_idx]
    f_b = vals[:, K:][:, :K_idx]

    cert_b = hit_b & (f_a > 0.0) & (f_b <= 0.0)

    def secant(lo, f_lo, hi, f_hi, clamp):
        denom = f_lo - f_hi
        t = f_lo / jnp.where(denom == 0.0, 1.0, denom)
        # refinement PROBES keep the march's 5% interior clamp so the
        # bracket strictly shrinks; the FINAL estimate is unclamped (a
        # clamped final secant floors the error at 0.05 x window)
        if clamp:
            t = jnp.clip(t, 0.05, 0.95)
        else:
            t = jnp.clip(t, 0.0, 1.0)
        return lo + t * (hi - lo)

    # regula-falsi refinement: each round evaluates the full decoder at
    # the secant point and halves into the sign-preserving sub-bracket —
    # the initial 2*delta window collapses quadratically (+1 eval/hit
    # ray per round; the seeded march this replaces paid ~4.5
    # block-steps). refine=1 measured p95 ~6e-4 vs the march's own
    # bracket output at delta=0.015. Band rays ride the FIRST refinement
    # round with their center probe at the proxy argmin.
    f_c = jnp.full_like(f_a, jnp.inf)
    lo, f_lo, hi, f_hi = a, f_a, b, f_b
    for r in range(refine):
        m = secant(lo, f_lo, hi, f_hi, clamp=True)
        if r == 0:
            m = jnp.where(band_b, d_b, m)
        live_r = cert_b | (band_b if r == 0 else jnp.zeros_like(band_b))
        p_m = o_p + padf(m)[..., None] * v_p
        f_m = pallas_point_eval_banked(
            shared, bank,
            jnp.repeat(jnp.arange(F, dtype=jnp.int32), K // block),
            p_m.reshape(-1, 3), padf(live_r).reshape(-1), block=block,
            interpret=interpret,
        ).reshape(F, K)[:, :K_idx]
        if r == 0:
            f_c = jnp.where(band_b, f_m, f_c)
        go_lo = f_m > 0.0
        lo = jnp.where(cert_b & go_lo, m, lo)
        f_lo = jnp.where(cert_b & go_lo, f_m, f_lo)
        hi = jnp.where(cert_b & ~go_lo, m, hi)
        f_hi = jnp.where(cert_b & ~go_lo, f_m, f_hi)

    d_cert_b = secant(lo, f_lo, hi, f_hi, clamp=False)
    d_cert_b = jnp.where(cert_b, d_cert_b, d_b)

    # ---- band margin: quadratic through (ta, f_a), (0, f_c), (tb, f_b)
    # in offsets from the anchor (ta/tb asymmetric when the low probe hit
    # the sphere-entry clamp). Newton divided differences; vertex value
    # only trusted where the fit is convex and the vertex stays inside
    # the probe window, else the sample minimum stands.
    ta = jnp.minimum(a - d_b, -1e-6)
    tb = b - d_b
    have_c = jnp.isfinite(f_c)
    d1 = (f_c - f_a) / (-ta)
    g2 = jnp.where(have_c, (f_b - f_c), 0.0) / tb
    d2 = (g2 - d1) / (tb - ta)
    x_v = ta / 2.0 - d1 / (2.0 * jnp.where(d2 == 0.0, 1.0, d2))
    q_v = f_a + d1 * (x_v - ta) + d2 * (x_v - ta) * x_v
    convex = (d2 > 0.0) & (x_v >= ta) & (x_v <= tb) & have_c
    f_c_s = jnp.where(have_c, f_c, jnp.inf)
    min3 = jnp.minimum(jnp.minimum(f_a, f_b), f_c_s)
    marg_b = jnp.where(convex, jnp.minimum(q_v, min3), min3)
    t3 = jnp.where(
        f_a <= jnp.minimum(f_b, f_c_s), ta,
        jnp.where(f_b <= f_c_s, tb, 0.0),
    )
    tmin_b = jnp.where(
        band_b, d_b + jnp.where(convex & (q_v < min3), x_v, t3), d_b
    )
    prom_b = band_b & (marg_b <= promote_eps)
    marg_b = jnp.where(band_b, marg_b, jnp.inf)

    scat = lambda base, val: jax.vmap(
        lambda bs, i, v_: bs.at[i].set(v_)
    )(base, idx, val)
    certified = scat(jnp.zeros((F, N), bool), cert_b)
    d_out = scat(depth, d_cert_b)
    f_in = scat(jnp.full((F, N), jnp.inf, jnp.float32),
                jnp.where(cert_b, f_b, jnp.inf))
    band_margin = scat(jnp.full((F, N), jnp.inf, jnp.float32), marg_b)
    band_tmin = scat(anchor, tmin_b)
    promoted = scat(jnp.zeros((F, N), bool), prom_b)
    return CertResult(certified=certified, depth=d_out, f_inside=f_in,
                      overflow=overflow, band_margin=band_margin,
                      band_tmin=band_tmin, promoted=promoted)
