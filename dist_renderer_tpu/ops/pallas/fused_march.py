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

import functools
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

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

        res = jnp.concatenate(
            [
                d,
                hit_f,
                min_sdf,
                d_at_min,
                last_f,
                steps,
                jnp.maximum(act_f, unres_f),        # unresolved at exit
                jnp.zeros((1, d.shape[1]), f32),
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
    )


def pallas_sphere_trace_two_round(
    packed: PackedDecoder,
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    block: int = 512,
    interpret: bool = False,
    init_active: Optional[jax.Array] = None,
    cap: int = 8,
) -> TraceResult:
    """Two-round straggler re-binning for the single-frame fused march.

    Block residency = max over the block's 512 rays, so a few 30-50-step
    stragglers dominate class-sorted blocks (measured mean residency ~16
    vs ray mean ~4 at 512^2 — scripts/diag_binning.py). Round A caps every
    ray at `cap` steps (no midpoint salvage); survivors are densely
    re-packed live-first (counting sort) and finish in round B with the
    remaining budget (+8 to re-establish the bracket, which does not carry
    across rounds). Simulated residency on recorded true step counts:
    16451 -> 9318 at cap=8."""
    import dataclasses as _dc

    from dist_renderer_tpu.ops.tracer import live_counts_from_steps

    n = origins.shape[0]
    march_a = _dc.replace(march, max_steps=min(cap, march.max_steps))
    res_a = pallas_sphere_trace(
        packed, origins, dirs, march_a, init_depth,
        block=block, interpret=interpret, init_active=init_active,
        salvage=False,
    )
    unres = res_a.unresolved

    # live-first re-pack via ONE multi-operand sort (TPU gathers cost
    # ~20 ms per 262k take; lax.sort moves key+payloads together for less
    # than one gather — scripts/diag_glue.py)
    idx = jnp.arange(n, dtype=jnp.int32)
    key = (~unres).astype(jnp.int32)
    sorted_ = jax.lax.sort(
        (key, origins[:, 0], origins[:, 1], origins[:, 2],
         dirs[:, 0], dirs[:, 1], dirs[:, 2], res_a.depth, idx),
        dimension=0, num_keys=1, is_stable=True,
    )
    key_s = sorted_[0]
    o_s = jnp.stack(sorted_[1:4], axis=-1)
    v_s = jnp.stack(sorted_[4:7], axis=-1)
    d_s = sorted_[7]
    idx_s = sorted_[8]
    live_s = key_s == 0

    march_b = _dc.replace(march, max_steps=max(march.max_steps - cap + 8, 8))

    def round_b(r):
        res = pallas_sphere_trace(
            packed, o_s[:r], v_s[:r], march_b, d_s[:r],
            block=block, interpret=interpret, init_active=live_s[:r],
        )
        pad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((n - r,), fill, a.dtype)]
        ) if r < n else a
        return (pad(res.depth, 0.0), pad(res.hit, False),
                pad(res.min_sdf, jnp.inf), pad(res.depth_at_min, 0.0),
                pad(res.last_sdf, jnp.inf), pad(res.unresolved, False),
                pad(res.steps_per_ray, 0))

    bucket = min(_round_up(max(n // 8, block), block), n)
    if bucket >= n:
        d_b, hit_b, ms_b, dam_b, lf_b, un_b, st_b = round_b(n)
    else:
        max_live = jnp.sum(live_s)
        d_b, hit_b, ms_b, dam_b, lf_b, un_b, st_b = jax.lax.cond(
            max_live > bucket, lambda: round_b(n), lambda: round_b(bucket)
        )

    # merge in sorted order, then ONE unsort keyed on the carried index
    merged = jax.lax.sort(
        (idx_s,
         jnp.where(live_s, d_b, d_s),
         jnp.where(live_s, hit_b, False),
         jnp.where(live_s, ms_b, jnp.inf),
         jnp.where(live_s, dam_b, 0.0),
         jnp.where(live_s, lf_b, jnp.inf),
         jnp.where(live_s, un_b, False),
         jnp.where(live_s, st_b, 0)),
        dimension=0, num_keys=1, is_stable=False,
    )
    d_p, hit_p, ms_p, dam_p, lf_p, un_p, st_p = merged[1:]

    depth = jnp.where(unres, d_p, res_a.depth)
    hit = res_a.hit | (unres & hit_p)
    msdf_b2 = jnp.where(unres, ms_p, jnp.inf)
    better_b = unres & (msdf_b2 < res_a.min_sdf)
    steps = res_a.steps_per_ray + jnp.where(unres, st_p, 0)
    return TraceResult(
        depth=depth,
        hit=hit,
        min_sdf=jnp.where(unres, jnp.minimum(res_a.min_sdf, msdf_b2), res_a.min_sdf),
        depth_at_min=jnp.where(better_b, dam_p, res_a.depth_at_min),
        last_sdf=jnp.where(unres, lf_p, res_a.last_sdf),
        steps_used=jnp.max(steps),
        live_counts=live_counts_from_steps(steps, march.max_steps),
        unresolved=jnp.where(unres, un_p, False),
        steps_per_ray=steps,
    )


class PallasMarchFn:
    """Callable point-function wrapper that also carries packed weights, so
    the renderer can route the whole trace through the fused kernel
    (cfg.use_pallas) while losses/normals keep using the plain decoder."""

    def __init__(self, folded: Sequence[FoldedLayer], cfg: DecoderConfig,
                 point_fn, block: int = 512, two_round: bool = True,
                 cap: int = 8):
        self.packed = pack_folded(folded, cfg)
        self.point_fn = point_fn
        self.block = block
        self.two_round = two_round
        self.cap = cap

    def __call__(self, p):
        return self.point_fn(p)

    def trace(self, origins, dirs, march, init_depth=None, init_active=None,
              interpret=False):
        if self.two_round and march.max_steps > 2 * self.cap:
            return pallas_sphere_trace_two_round(
                self.packed, origins, dirs, march, init_depth,
                block=self.block, interpret=interpret,
                init_active=init_active, cap=self.cap,
            )
        return pallas_sphere_trace(
            self.packed, origins, dirs, march, init_depth,
            block=self.block, interpret=interpret, init_active=init_active,
        )
