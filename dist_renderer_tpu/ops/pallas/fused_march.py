"""Pallas fused persistent-march kernel — the native component of this
build (SURVEY.md §2 'Native components': the reference has none; the TPU
equivalent is a Mosaic kernel fusing the DeepSDF MLP march).

Design:
  - ONE pallas_call performs the ENTIRE sphere trace. Grid = ray blocks;
    each block holds its ray state in VMEM/registers and iterates march
    steps locally. Decoder weights (~3.6 MB bf16) are resident in VMEM for
    the whole kernel — zero HBM traffic for weights or activations between
    layers OR between march steps (the XLA while_loop path re-streams
    ~270 MB of activations per step).
  - Per-block early exit: each step is wrapped in lax.cond on "any ray in
    this block still live" — converged blocks skip the MLP entirely. Rays
    are spatially coherent per block, so this recovers the reference's
    live-set shrinkage at block granularity with NO sort/gather (the
    compaction tracer's argsort costs more than it saves once the march
    itself is this cheap).
  - Layout: everything [features(sublane), batch(lane)] — activations
    [512, B], rays packed into a [16, N] fp32 array (rows: origin 0-2,
    dir 3-5, d0 6, t_near 7, far 8, active 9). B = 512 lanes.
  - Matmuls run bf16 x bf16 -> fp32 on the MXU (preferred_element_type);
    march state stays fp32. The fp32 IFT polish in the renderer re-anchors
    the final depth, so bf16 march precision costs no output accuracy.

The kernel implements the same bracket-secant march as ops/tracer.py
(march_step) — tested for parity in interpret mode and on-device.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.folded import FoldedLayer
from dist_renderer_tpu.ops.camera import ray_sphere_entry
from dist_renderer_tpu.ops.tracer import TraceResult

_NEG_BIG = -3.0e38  # stand-ins for +-inf that survive bf16/fp32 where-games
_POS_BIG = 3.0e38


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PackedDecoder(NamedTuple):
    """Folded decoder weights padded/transposed for the [feat, B] layout.

    Per layer: whT [out_p, in_p] bf16 (or None), wxT [out_p, 8] bf16 (or
    None), b [out_p, 1] fp32. out_p/in_p are the 8-padded true dims."""

    whT: Tuple[Optional[jax.Array], ...]
    wxT: Tuple[Optional[jax.Array], ...]
    b: Tuple[jax.Array, ...]
    final_tanh: bool


def pack_folded(folded: Sequence[FoldedLayer], cfg: DecoderConfig) -> PackedDecoder:
    whT, wxT, bs = [], [], []
    prev_out_p = None
    for l in folded:
        out_dim = l.b.shape[0]
        out_p = _round_up(out_dim, 8)
        if l.wh is not None:
            in_dim = l.wh.shape[0]
            in_p = prev_out_p if prev_out_p is not None else _round_up(in_dim, 8)
            w = jnp.zeros((out_p, in_p), jnp.bfloat16)
            w = w.at[:out_dim, :in_dim].set(l.wh.T.astype(jnp.bfloat16))
            whT.append(w)
        else:
            whT.append(None)
        if l.wx is not None:
            w = jnp.zeros((out_p, 8), jnp.bfloat16)
            w = w.at[:out_dim, :3].set(l.wx.T.astype(jnp.bfloat16))
            wxT.append(w)
        else:
            wxT.append(None)
        b = jnp.zeros((out_p, 1), jnp.float32)
        b = b.at[:out_dim, 0].set(l.b.astype(jnp.float32))
        bs.append(b)
        prev_out_p = out_p
    return PackedDecoder(tuple(whT), tuple(wxT), tuple(bs), cfg.final_tanh)


def _mlp(p8, w_refs, layout, final_tanh: bool):
    """p8 [8, B] bf16 (rows 0-2 = xyz). Returns sdf [1, B] fp32.
    `layout` is a list of ('h'|'x'|'hx') describing each layer's inputs.

    w_refs are pl.Refs read AT USE inside the march loop — materializing
    all ~3.6 MB of weights up front (outside the while_loop) made every
    DEAD block pay an ~11.6 us VMEM sweep before its early exit (measured,
    scripts/diag_kernel.py).

    Precision note: hidden dots accumulate in fp32 and round ONCE to bf16
    at the activation (bf16 accumulation was tried and rejected — it puts
    p95 ~3.6e-3 of noise on the sdf VALUE, beyond the march's own
    convergence eps, and broke the kernel-vs-fp32 parity bar)."""
    h = None
    idx = 0
    n_layers = len(layout)
    for i, kind in enumerate(layout):
        acc = None
        if "h" in kind:
            w = w_refs[idx][:, :]; idx += 1
            acc = jax.lax.dot_general(
                w, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if "x" in kind:
            w = w_refs[idx][:, :]; idx += 1
            xz = jax.lax.dot_general(
                w, p8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = xz if acc is None else acc + xz
        b = w_refs[idx][:, :]; idx += 1
        acc = acc + b
        if i < n_layers - 1:
            h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
        else:
            h = acc
    sdf = h[0:1, :]
    if final_tanh:
        sdf = jnp.tanh(sdf)
    return sdf


def _make_kernel(layout, final_tanh: bool, march: MarchConfig, max_steps: int,
                 salvage: bool = True):
    eps = march.convergence_eps
    deps = march.depth_eps
    alpha = march.alpha
    margin = march.far_margin

    def kernel(rays_ref, *refs):
        w_refs = refs[:-1]
        out_ref = refs[-1]
        rays = rays_ref[:, :]                      # [16, B] fp32
        o = rays[0:3, :]
        v = rays[3:6, :]
        d = rays[6:7, :]
        near = rays[7:8, :]
        far = rays[8:9, :]
        act0 = rays[9:10, :]                       # 1.0 / 0.0

        B = d.shape[1]
        f32 = jnp.float32
        zeros = jnp.zeros((1, B), f32)

        # dead-block fast path: emit the init-state outputs and return —
        # class-sorted launches have many all-inactive blocks, and the
        # per-block prologue (carry init + loop entry) is the bulk of
        # their ~11 us cost (scripts/diag_kernel.py)
        big = jnp.full((1, B), _POS_BIG, f32)
        out_ref[:, :] = jnp.concatenate(
            [d, zeros, big, d, big, zeros, zeros, zeros], axis=0
        )

        @pl.when(jnp.max(act0) > 0.5)
        def _march_block():
            _kernel_body(rays_ref, w_refs, out_ref)

    def _kernel_body(rays_ref, w_refs, out_ref):
        rays = rays_ref[:, :]                      # [16, B] fp32
        o = rays[0:3, :]
        v = rays[3:6, :]
        d = rays[6:7, :]
        near = rays[7:8, :]
        far = rays[8:9, :]
        act0 = rays[9:10, :]
        B = d.shape[1]
        f32 = jnp.float32
        zeros = jnp.zeros((1, B), f32)
        # NOTE: every carried value is fp32 — Mosaic fails to legalize i1
        # vectors in the scf.for carry (observed: roll_vectors on
        # vector<1x512xi1>). Flags travel as 0.0/1.0 and are re-derived as
        # bools locally each step.
        carry0 = (
            d,                                   # d
            act0,                                # active flag
            zeros,                               # hit flag
            jnp.full((1, B), _NEG_BIG, f32),     # d_lo
            jnp.full((1, B), _POS_BIG, f32),     # f_lo
            jnp.full((1, B), _POS_BIG, f32),     # d_hi
            jnp.full((1, B), _NEG_BIG, f32),     # f_hi
            jnp.full((1, B), _POS_BIG, f32),     # min_sdf
            d,                                   # d_at_min
            jnp.full((1, B), _POS_BIG, f32),     # last_f
            zeros,                               # steps
            zeros,                               # exhausted-without-bracket
        )

        def march_one(c):
            (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
             last_f, steps, unres_f) = c
            act = act_f > 0.5
            p = o + d * v                          # [3, B]
            p8 = jnp.concatenate([p, jnp.zeros((5, B), f32)], axis=0)
            f = _mlp(p8.astype(jnp.bfloat16), w_refs, layout, final_tanh)

            better = act & (f < min_sdf)
            min_sdf = jnp.where(better, f, min_sdf)
            d_at_min = jnp.where(better, d, d_at_min)

            outside = f > 0.0
            d_lo = jnp.where(act & outside, d, d_lo)
            f_lo = jnp.where(act & outside, f, f_lo)
            d_hi = jnp.where(act & ~outside, d, d_hi)
            f_hi = jnp.where(act & ~outside, f, f_hi)
            bracketed = (d_lo > _NEG_BIG / 2) & (d_hi < _POS_BIG / 2)
            width = d_hi - d_lo

            converged = act & (
                (jnp.abs(f) < eps) | (bracketed & (width < deps))
            )

            d_aggr = d + alpha * f
            denom = f_hi - f_lo
            secant = (d_lo * f_hi - d_hi * f_lo) / jnp.where(denom == 0.0, 1.0, denom)
            secant = jnp.clip(secant, d_lo + 0.05 * width, d_hi - 0.05 * width)
            d_back = d + f
            d_next = jnp.where(
                bracketed, secant, jnp.where(outside, d_aggr, d_back)
            )

            steps = steps + jnp.where(act, 1.0, 0.0)
            exhausted = steps >= float(max_steps)
            escaped = (~bracketed) & ((d_next > far) | (d_next < near - margin))
            missed = act & ~converged & (escaped | exhausted)
            if salvage:
                # final round: accept the bracket midpoint on exhaustion
                salvaged = act & ~converged & exhausted & bracketed
            else:
                # step-capped round: bracketed-but-unconverged rays REQUEUE
                salvaged = jnp.zeros_like(act)
            missed = missed & ~salvaged
            converged = converged | salvaged

            still = act & ~converged & ~missed
            d = jnp.where(
                still, d_next, jnp.where(salvaged, 0.5 * (d_lo + d_hi), d)
            )
            last_f = jnp.where(act, f, last_f)
            hit_f = jnp.maximum(hit_f, jnp.where(converged, 1.0, 0.0))
            open_exh = act & ~converged & exhausted & (
                jnp.ones_like(act) if not salvage else ~bracketed
            )
            unres_f = jnp.maximum(unres_f, jnp.where(open_exh, 1.0, 0.0))
            return (d, jnp.where(still, 1.0, 0.0), hit_f, d_lo, f_lo, d_hi,
                    f_hi, min_sdf, d_at_min, last_f, steps, unres_f)

        # Genuine early exit: the while_loop ENDS when the block's rays are
        # all done — a fori_loop + cond still cycles max_steps iterations
        # per block, and that fixed overhead dominated dead blocks
        # (measured: classified c2f gained nothing under fori).
        def loop_cond(kc):
            k, c = kc
            return (k < max_steps) & (jnp.max(c[1]) > 0.5)

        def loop_body(kc):
            k, c = kc
            return (k + 1, march_one(c))

        _, out = jax.lax.while_loop(loop_cond, loop_body, (0, carry0))
        (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
         last_f, steps, unres_f) = out

        brk = ((d_lo > _NEG_BIG / 2) & (d_hi < _POS_BIG / 2)).astype(f32)
        res = jnp.concatenate(
            [
                d,
                hit_f,
                min_sdf,
                d_at_min,
                last_f,
                steps,
                jnp.maximum(act_f, unres_f),        # unresolved at exit
                brk,                                # owns a bracket at exit
            ],
            axis=0,
        )                                           # [8, B]
        out_ref[:, :] = res

    return kernel


def _layer_layout(packed: PackedDecoder) -> List[str]:
    layout = []
    for wh, wx in zip(packed.whT, packed.wxT):
        kind = ""
        if wh is not None:
            kind += "h"
        if wx is not None:
            kind += "x"
        layout.append(kind)
    return layout


def pallas_sphere_trace(
    packed: PackedDecoder,
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    block: int = 512,
    interpret: bool = False,
    init_active: Optional[jax.Array] = None,
    salvage: bool = True,
) -> TraceResult:
    """Full sphere trace as one fused Pallas kernel. Drop-in for
    ops.tracer.sphere_trace (same TraceResult semantics; live-ray
    telemetry derived from per-ray step counts). salvage=False marks
    bracketed-but-unconverged rays at the step cap as unresolved for a
    later requeue round instead of accepting the bracket midpoint."""
    n = origins.shape[0]
    n_pad = _round_up(max(n, block), block)

    t_near, t_far, enters = ray_sphere_entry(origins, dirs, march.sphere_radius, 0.0)
    far_bound = t_far + march.far_margin
    t_closest = jnp.maximum(-jnp.sum(origins * dirs, axis=-1), 0.0)
    d0 = jnp.where(enters, t_near, t_closest).astype(jnp.float32)
    if init_depth is not None:
        seeded = jnp.isfinite(init_depth) & enters
        d0 = jnp.where(seeded, jnp.maximum(init_depth, t_near), d0)
    active0 = enters if init_active is None else (enters & init_active)

    rays = jnp.zeros((16, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origins.T)
    rays = rays.at[3:6, :n].set(dirs.T)
    rays = rays.at[6, :n].set(d0)
    rays = rays.at[7, :n].set(t_near)
    rays = rays.at[8, :n].set(far_bound)
    rays = rays.at[9, :n].set(active0.astype(jnp.float32))

    layout = _layer_layout(packed)
    weights = []
    for wh, wx, b in zip(packed.whT, packed.wxT, packed.b):
        if wh is not None:
            weights.append(wh)
        if wx is not None:
            weights.append(wx)
        weights.append(b)
    specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    grid = (n_pad // block,)
    kernel = _make_kernel(layout, packed.final_tanh, march, march.max_steps,
                          salvage)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            *specs,
        ],
        out_specs=pl.BlockSpec(
            (8, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, *weights)

    d = out[0, :n]
    hit = out[1, :n] > 0.5
    min_sdf = out[2, :n]
    d_at_min = out[3, :n]
    last_f = out[4, :n]
    steps = out[5, :n]
    unresolved = out[6, :n] > 0.5

    p_closest = origins + t_closest[:, None] * dirs
    geo_margin = jnp.linalg.norm(p_closest, axis=-1) - march.sphere_radius
    min_sdf = jnp.where(enters, min_sdf, geo_margin)
    min_sdf = jnp.where(min_sdf > _POS_BIG / 2, geo_margin, min_sdf)

    from dist_renderer_tpu.ops.tracer import live_counts_from_steps

    steps_i = steps.astype(jnp.int32)
    return TraceResult(
        depth=d,
        hit=hit,
        min_sdf=min_sdf,
        depth_at_min=d_at_min,
        last_sdf=last_f,
        steps_used=jnp.max(steps_i),
        live_counts=live_counts_from_steps(steps_i, march.max_steps),
        unresolved=unresolved,
        steps_per_ray=steps_i,
        bracketed=out[7, :n] > 0.5,
    )


def pallas_sphere_trace_rounds(
    packed: PackedDecoder,
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    block: int = 512,
    interpret: bool = False,
    init_active: Optional[jax.Array] = None,
    round_caps: Tuple[int, ...] = (4, 12),
    live_frac: int = 2,
) -> TraceResult:
    """Multi-round straggler re-binning for the single-frame fused march
    (the 1-D sibling of batched_march.fine_march_rounds).

    Block residency = max over the block's 512 rays, so a few 30-50-step
    stragglers dominate class-sorted blocks. Round i caps every live ray
    at round_caps[i] steps (no midpoint salvage — bracketed-but-
    unconverged rays REQUEUE); survivors re-pack densely live-first (one
    payload sort) and later rounds march a shrinking static prefix; the
    final round gets the full budget. When the caller provides
    init_active (the c2f skip class, sorted last by the renderer), round
    0 marches only the first n/live_frac columns with a lax.cond
    full-width fallback — dead blocks cost ~11 us of grid machinery each
    even when empty (scripts/diag_kernel.py), so not launching them is
    the only cure."""
    import dataclasses as _dc

    from dist_renderer_tpu.ops.tracer import live_counts_from_steps

    n = origins.shape[0]

    # same ray init as pallas_sphere_trace, so rays that never enter any
    # kernel (c2f skip class, non-entering rays) carry the init-state
    # outputs the renderer expects: depth/d_at_min at the seed anchor,
    # geometric sphere margin as min_sdf
    t_near, t_far, enters = ray_sphere_entry(
        origins, dirs, march.sphere_radius, 0.0
    )
    t_closest = jnp.maximum(-jnp.sum(origins * dirs, axis=-1), 0.0)
    d0 = jnp.where(enters, t_near, t_closest).astype(jnp.float32)
    if init_depth is not None:
        seeded = jnp.isfinite(init_depth) & enters
        d0 = jnp.where(seeded, jnp.maximum(init_depth, t_near), d0)

    # carried per-ray state, re-packed between rounds. Results merge into
    # (d, hit, msdf, dam, lastf, unres, steps) in CURRENT order; pix
    # carries the original position for the final unsort.
    pix = jnp.arange(n, dtype=jnp.int32)
    state = dict(
        o=origins, v=dirs, d=d0, pix=pix,
        seed=(init_depth if init_depth is not None
              else jnp.full((n,), jnp.nan, jnp.float32)),
        live=((enters if init_active is None else (enters & init_active))),
        hit=jnp.zeros((n,), bool),
        msdf=jnp.full((n,), jnp.inf, jnp.float32),
        dam=d0,
        lastf=jnp.full((n,), jnp.inf, jnp.float32),
        steps=jnp.zeros((n,), jnp.int32),
        unres=jnp.zeros((n,), bool),
        started=jnp.zeros((n,), bool),  # has a round marched this ray?
        brk=jnp.zeros((n,), bool),      # owns a bracket (difficulty key)
    )

    def run_round(st, r, m, salvage):
        """March the first r columns; merge results into full state."""
        res = pallas_sphere_trace(
            packed, st["o"][:r], st["v"][:r], m,
            jnp.where(st["started"][:r], st["d"][:r], st["seed"][:r]),
            block=block, interpret=interpret, init_active=st["live"][:r],
            salvage=salvage,
        )
        was = st["live"][:r]
        upd = lambda full, part: full.at[:r].set(
            jnp.where(was, part, full[:r]))
        st = dict(st)
        st["d"] = upd(st["d"], res.depth)
        st["hit"] = upd(st["hit"], st["hit"][:r] | res.hit)
        st["msdf"] = upd(st["msdf"], jnp.minimum(st["msdf"][:r], res.min_sdf))
        better = was & (res.min_sdf <= st["msdf"][:r])
        st["dam"] = st["dam"].at[:r].set(
            jnp.where(better, res.depth_at_min, st["dam"][:r]))
        st["lastf"] = upd(st["lastf"], res.last_sdf)
        st["steps"] = st["steps"].at[:r].set(
            st["steps"][:r] + jnp.where(was, res.steps_per_ray, 0))
        st["unres"] = upd(st["unres"], res.unresolved)
        st["started"] = st["started"].at[:r].set(st["started"][:r] | was)
        st["brk"] = upd(st["brk"], res.bracketed)
        st["live"] = upd(st["live"], res.unresolved)
        return st

    def repack(st):
        """Difficulty-grouped live-first re-pack (one payload sort):
        open (still aggressive-marching) survivors first, bracketed
        (a few cheap secant steps) next, dead last — blocks pay the max
        over their rays, so grouping by remaining work keeps them
        homogeneous."""
        key = jnp.where(~st["live"], 2,
                        jnp.where(st["brk"], 1, 0)).astype(jnp.int32)
        pays = [st["o"][:, 0], st["o"][:, 1], st["o"][:, 2],
                st["v"][:, 0], st["v"][:, 1], st["v"][:, 2],
                st["d"], st["pix"], st["seed"],
                st["hit"], st["msdf"], st["dam"], st["lastf"],
                st["steps"], st["unres"], st["started"], st["brk"]]
        out = jax.lax.sort((key,) + tuple(pays), dimension=0, num_keys=1,
                           is_stable=True)
        k_s, p = out[0], list(out[1:])
        return dict(
            o=jnp.stack(p[0:3], axis=-1), v=jnp.stack(p[3:6], axis=-1),
            d=p[6], pix=p[7], seed=p[8], hit=p[9], msdf=p[10], dam=p[11],
            lastf=p[12], steps=p[13], unres=p[14], started=p[15],
            brk=p[16], live=k_s != 2,
        )

    caps = tuple(round_caps)
    bucket0 = min(_round_up(max(n // max(live_frac, 1), block), block), n)
    for ri, cap in enumerate(caps):
        m = _dc.replace(march, max_steps=min(cap, march.max_steps))
        if ri == 0:
            if init_active is None or bucket0 >= n:
                state = run_round(state, n, m, False)
            else:
                n_live = jnp.sum(state["live"])
                state = jax.lax.cond(
                    n_live > bucket0,
                    lambda s: run_round(s, n, m, False),
                    lambda s: run_round(s, bucket0, m, False),
                    state,
                )
        else:
            state = repack(state)
            bucket = min(_round_up(max(n // 4, block), block), n)
            state = run_round(state, bucket, m, False)

    # FINAL round: full remaining budget, bucketed with overflow fallback
    state = repack(state)
    bucket = min(_round_up(max(n // 8, block), block), n)
    if bucket >= n:
        state = run_round(state, n, march, True)
    else:
        n_live = jnp.sum(state["live"])
        state = jax.lax.cond(
            n_live > bucket,
            lambda s: run_round(s, n, march, True),
            lambda s: run_round(s, bucket, march, True),
            state,
        )

    # one unsort back to original order
    out = jax.lax.sort(
        (state["pix"], state["d"], state["hit"], state["msdf"],
         state["dam"], state["lastf"], state["unres"], state["steps"]),
        dimension=0, num_keys=1, is_stable=False,
    )
    _, d, hit, msdf, dam, lastf, unres, steps = out
    # geometric sphere margin for rays whose march never sampled the SDF
    p_closest = origins + t_closest[:, None] * dirs
    geo_margin = jnp.linalg.norm(p_closest, axis=-1) - march.sphere_radius
    msdf = jnp.where(enters, msdf, geo_margin)
    msdf = jnp.where(jnp.isinf(msdf) | (msdf > _POS_BIG / 2), geo_margin, msdf)
    return TraceResult(
        depth=d, hit=hit, min_sdf=msdf, depth_at_min=dam, last_sdf=lastf,
        steps_used=jnp.max(steps),
        live_counts=live_counts_from_steps(steps, march.max_steps),
        unresolved=unres, steps_per_ray=steps,
    )


class PallasMarchFn:
    """Callable point-function wrapper that also carries packed weights, so
    the renderer can route the whole trace through the fused kernel
    (cfg.use_pallas) while losses/normals keep using the plain decoder."""

    def __init__(self, folded: Sequence[FoldedLayer], cfg: DecoderConfig,
                 point_fn, block: int = 512, two_round: bool = True,
                 round_caps: Tuple[int, ...] = (4, 12)):
        self.packed = pack_folded(folded, cfg)
        self.point_fn = point_fn
        self.block = block
        self.two_round = two_round
        self.round_caps = round_caps

    def __call__(self, p):
        return self.point_fn(p)

    def trace(self, origins, dirs, march, init_depth=None, init_active=None,
              interpret=False):
        if self.two_round and march.max_steps > 2 * max(self.round_caps):
            return pallas_sphere_trace_rounds(
                self.packed, origins, dirs, march, init_depth,
                block=self.block, interpret=interpret,
                init_active=init_active, round_caps=self.round_caps,
            )
        return pallas_sphere_trace(
            self.packed, origins, dirs, march, init_depth,
            block=self.block, interpret=interpret, init_active=init_active,
        )
