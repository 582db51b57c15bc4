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
from dist_renderer_tpu.ops.pallas.march_body import (
    _NEG_BIG, _POS_BIG, default_rows, march_rows, mlp_apply,
)
from dist_renderer_tpu.ops.tracer import TraceResult


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


def _make_kernel(layout, final_tanh: bool, march: MarchConfig, max_steps: int,
                 salvage: bool = True):
    """Grid kernel: one ray block per grid step; march body + MLP shared
    with the batched kernels (ops/pallas/march_body.py)."""

    def kernel(rays_ref, *refs):
        refs_all = refs[:-1]
        out_ref = refs[-1]
        rays = rays_ref[:, :]                      # [16, B] fp32
        o = rays[0:3, :]
        v = rays[3:6, :]
        d = rays[6:7, :]
        near = rays[7:8, :]
        far = rays[8:9, :]
        act0 = rays[9:10, :]                       # 1.0 / 0.0

        B = d.shape[1]
        zeros = jnp.zeros((1, B), jnp.float32)

        # dead-block fast path: emit the init-state outputs and return —
        # class-sorted launches have many all-inactive blocks, and the
        # per-block prologue (carry init + loop entry) is the bulk of
        # their ~11 us cost (scripts/diag_kernel.py)
        out_ref[:, :] = default_rows(d, zeros)

        @pl.when(jnp.max(act0) > 0.5)
        def _march_block():
            # split the interleaved (wh?, wx?, b) refs into weight refs
            # and per-layer [out_p, 1] bias columns (read once, alive only)
            w_refs, biases = [], []
            idx = 0
            for kind in layout:
                for _ in kind:
                    w_refs.append(refs_all[idx])
                    idx += 1
                biases.append(refs_all[idx][:, :])
                idx += 1
            mlp = lambda p8: mlp_apply(layout, w_refs, biases, final_tanh, p8)
            out_ref[:, :] = march_rows(
                mlp, o, v, d, near, far, act0, march, max_steps, salvage
            )

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
            if bucket >= n:
                state = run_round(state, bucket, m, False)
            else:
                # overflow guard (mirrors fine_march_rounds): every live
                # ray must receive every round's cap, else total budget
                # depends on how many rays fit the bucket
                n_live = jnp.sum(state["live"])
                state = jax.lax.cond(
                    n_live > bucket,
                    lambda s, m=m: run_round(s, n, m, False),
                    lambda s, m=m, b=bucket: run_round(s, b, m, False),
                    state,
                )

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
