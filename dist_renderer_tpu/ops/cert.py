"""Probe-bracket certification of proxy-claimed hits.

The proxy verify stage's original design confirmed every proxy hit with a
SEEDED full-decoder march (seed at proxy depth - backoff, ~2-4 steps).
Measured on v5e at 512² (scripts/diag_proxy_ab.py + block-residency
accounting): those seeded blocks are ~4.2 ms/frame of the verify stage's
~9.3 ms/frame march cost, because block residency is the MAX over 512
rays and pins at the round cap — per-ray seeding quality barely moves it.

A proxy hit does not need a march to be verified. The march's own
convergence contract is |f| < eps OR a sign bracket of width < depth_eps;
a proxy hit whose depth is within ±delta of the true surface is certified
by TWO dense full-decoder evals:

    f_a = f(o + a·v), a = max(d_proxy - delta, t_near)
    f_b = f(o + b·v), b = d_proxy + delta

    f_a > 0 >= f_b  =>  the full field crosses zero in [a, b]: HIT, with
    depth = the secant point a + (b-a)·f_a/(f_a - f_b) — the same
    regula-falsi estimator the march itself applies to a fresh bracket of
    this width. Anything else => DEMOTED: the ray joins the verify
    re-march class (full bracket-secant march from sphere entry), so a
    proxy false hit or a depth error beyond delta still ends in a genuine
    full-decoder march verdict.

delta is the caller's proxy_backoff (tuned to the proxy's error p99 by
models/proxy.proxy_march_margins), so demotions are the measured-rare
tail. Probes run through the bank-aware eval kernel
(ops/pallas/mlp_eval.pallas_point_eval_banked) on a hit-sorted static
bucket per frame — cost ~2 full evals per certified ray vs ~4.5 march
block-steps, and the rays leave the verify scheduler's sorts entirely.

Positions use the bf16x2 split path (march_body.mlp_apply p8_lo): probe
spacing 2·delta ~ 0.01 is ~2.5x the bf16 position quantum at |p|~1, so
single-bf16 positions would alias both probes onto the same lattice site.

Everything here is stop-gradient (forward-path march machinery; gradients
flow only through the differentiable recompute in ops/renderer.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

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
    overflow: jax.Array    # [F, N] bool — seeded rays beyond the bucket
                           # (never at production hit fractions); the caller
                           # must route them through the seeded-march class


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
) -> CertResult:
    from dist_renderer_tpu.ops.pallas.batched_march import _round_up
    from dist_renderer_tpu.ops.pallas.mlp_eval import pallas_point_eval_banked

    F, N = depth.shape
    # bucket: a block multiple >= block; gathered entries capped at N (the
    # probe lanes beyond N are padded dead below)
    K = _round_up(max(N // bucket_frac, block), block)
    K_idx = min(K, N)

    depth = _sg(depth)

    # hit-first compaction (same sort-with-payload glue as the rounds
    # scheduler / polish_depth_batched: TPU gathers are the expensive op,
    # one multi-operand lax.sort moves key+pix together)
    key = (~seeded).astype(jnp.int32)
    pix = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (F, N))
    _, pix_s = jax.lax.sort((key, pix), dimension=1, num_keys=1,
                            is_stable=True)
    idx = pix_s[:, :K_idx]                               # [F, K_idx]

    take2 = lambda a: jnp.take_along_axis(a, idx, axis=1)
    take3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
    v_b = take3(dirs)                                    # [F, K_idx, 3]
    o_b = (jnp.broadcast_to(origins, (F, K_idx, 3))
           if origins.shape[1] == 1 else take3(origins))
    d_b = take2(depth)
    act_b = take2(seeded)

    # overflow: seeded rays that did not fit the bucket (route to the
    # seeded-march fallback). in_bucket via scatter of the bucket indices.
    in_bucket = jnp.zeros((F, N), bool)
    in_bucket = jax.vmap(lambda m, i: m.at[i].set(True))(in_bucket, idx)
    overflow = seeded & ~in_bucket

    t_near, _, _ = ray_sphere_entry(
        o_b.reshape(-1, 3), v_b.reshape(-1, 3), march.sphere_radius, 0.0
    )
    t_near = t_near.reshape(F, K_idx)
    a = jnp.maximum(d_b - delta, t_near)
    b = d_b + delta

    if K_idx < K:  # sub-block frame: pad probe lanes with dead entries
        pad = K - K_idx
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        a_p, b_p = padf(a), padf(b)
        act_p = padf(act_b)
        o_p = jnp.pad(o_b, ((0, 0), (0, pad), (0, 0)))
        v_p = jnp.pad(v_b, ((0, 0), (0, pad), (0, 0)))
    else:
        a_p, b_p, act_p, o_p, v_p = a, b, act_b, o_b, v_b

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

    cert_b = act_b & (f_a > 0.0) & (f_b <= 0.0)

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
    # the initial 2·delta window collapses quadratically (+1 eval/hit
    # ray per round; the seeded march this replaces paid ~4.5
    # block-steps). refine=1 measured p95 ~6e-4 vs the march's own
    # bracket output at delta=0.015.
    lo, f_lo, hi, f_hi = a, f_a, b, f_b
    for _ in range(refine):
        m = secant(lo, f_lo, hi, f_hi, clamp=True)
        if K_idx < K:
            m_p = jnp.pad(m, ((0, 0), (0, K - K_idx)))
        else:
            m_p = m
        p_m = o_p + m_p[..., None] * v_p
        cert_p = (jnp.pad(cert_b, ((0, 0), (0, K - K_idx)))
                  if K_idx < K else cert_b)
        f_m = pallas_point_eval_banked(
            shared, bank,
            jnp.repeat(jnp.arange(F, dtype=jnp.int32), K // block),
            p_m.reshape(-1, 3), cert_p.reshape(-1), block=block,
            interpret=interpret,
        ).reshape(F, K)[:, :K_idx]
        go_lo = f_m > 0.0
        lo = jnp.where(cert_b & go_lo, m, lo)
        f_lo = jnp.where(cert_b & go_lo, f_m, f_lo)
        hi = jnp.where(cert_b & ~go_lo, m, hi)
        f_hi = jnp.where(cert_b & ~go_lo, f_m, f_hi)

    d_cert_b = secant(lo, f_lo, hi, f_hi, clamp=False)
    d_cert_b = jnp.where(cert_b, d_cert_b, d_b)

    scat = lambda base, val: jax.vmap(
        lambda bs, i, v_: bs.at[i].set(v_)
    )(base, idx, val)
    certified = scat(jnp.zeros((F, N), bool), cert_b)
    d_out = scat(depth, d_cert_b)
    f_in = scat(jnp.full((F, N), jnp.inf, jnp.float32),
                jnp.where(cert_b, f_b, jnp.inf))
    return CertResult(certified=certified, depth=d_out, f_inside=f_in,
                      overflow=overflow)
