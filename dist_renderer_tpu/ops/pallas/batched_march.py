"""Multi-frame fused march: many latents/views in ONE Pallas kernel.

Key observation (models/folded.py): after latent folding, the decoder's
big weight matrices are LATENT-INDEPENDENT — frames differ only in the
per-layer bias vectors (b + z @ W_z). So category-scale rendering
(BASELINE.json config #5: 1k latents x 16 views at 512^2) runs as one
kernel with:

  - shared whT/wxT weights resident in VMEM for the whole launch,
  - a bias BANK [sum_bias_dims, F] in HBM; each grid block DMAs the
    128-frame bias tile containing its frame (BlockSpec index driven by a
    scalar-prefetched frame-of-block array) and slices its column,
  - rays laid out frame-major so every block belongs to exactly one frame.

This amortizes all per-launch overhead across frames and keeps the MXU at
the ~190 TFLOPs effective rate measured for the single-frame kernel, with
zero per-frame weight re-uploads. (The reference renders one frame per
Python call — SURVEY.md §2 'Parallelism strategies'.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.decoder import Params
from dist_renderer_tpu.models.folded import fold_latent
from dist_renderer_tpu.ops.camera import ray_sphere_entry
from dist_renderer_tpu.ops.pallas.fused_march import (
    _NEG_BIG, _POS_BIG, _round_up,
)
from dist_renderer_tpu.ops.tracer import TraceResult

FRAME_TILE = 128  # frames per bias-bank tile (lane width)


class SharedDecoder(NamedTuple):
    """Latent-independent weights + static bias layout."""

    whT: Tuple[Optional[jax.Array], ...]   # [out_p, in_p] bf16
    wxT: Tuple[Optional[jax.Array], ...]   # [out_p, 8] bf16
    offsets: Tuple[Tuple[int, int], ...]   # (offset, out_p) per layer
    total: int                             # sum of out_p (bias rows)
    final_tanh: bool


def pack_shared(params: Params, cfg: DecoderConfig) -> SharedDecoder:
    """Pack the z-independent parts (weights) + bias layout."""
    folded = fold_latent(params, jnp.zeros((cfg.latent_size,)), cfg)
    whT, wxT, offsets = [], [], []
    off = 0
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
        offsets.append((off, out_p))
        off += out_p
        prev_out_p = out_p
    total = _round_up(off, 8)
    return SharedDecoder(
        whT=tuple(whT), wxT=tuple(wxT), offsets=tuple(offsets),
        total=total, final_tanh=cfg.final_tanh,
    )


def fold_bias_bank(
    params: Params, latents: jax.Array, cfg: DecoderConfig,
    shared: SharedDecoder,
) -> jax.Array:
    """latents [F, L] -> bias bank [total, F_pad] fp32 (F padded to 128)."""
    def one(z):
        folded = fold_latent(params, z, cfg)
        row = jnp.zeros((shared.total,), jnp.float32)
        for (off, out_p), l in zip(shared.offsets, folded):
            row = jax.lax.dynamic_update_slice(
                row, jnp.pad(l.b.astype(jnp.float32), (0, out_p - l.b.shape[0])),
                (off,),
            )
        return row

    bank = jax.vmap(one)(latents)           # [F, total]
    f = bank.shape[0]
    f_pad = _round_up(f, FRAME_TILE)
    bank = jnp.pad(bank, ((0, f_pad - f), (0, 0)))
    return bank.T                            # [total, F_pad]


def _make_multi_kernel(shared: SharedDecoder, march: MarchConfig, max_steps: int,
                       salvage: bool = True):
    eps = march.convergence_eps
    deps = march.depth_eps
    alpha = march.alpha
    margin = march.far_margin
    layers = list(zip(shared.whT, shared.wxT, shared.offsets))

    def kernel(frame_ids_ref, rays_ref, bias_ref, *refs):
        # bias_ref: the [total, 128] frame tile holding this block's frame
        # column (scalar-prefetch-indexed; Mosaic only re-DMAs it when the
        # tile index changes). NOTE a per-block [total, 1] column BlockSpec
        # would be cheaper but is ILLEGAL on the TPU lowering (last block
        # dim must be 128-divisible or full) — interpret mode accepts it,
        # hardware rejects it.
        w_refs = list(refs[:-1])
        out_ref = refs[-1]
        i = pl.program_id(0)
        lane = frame_ids_ref[i] % FRAME_TILE

        rays = rays_ref[:, :]
        o = rays[0:3, :]
        v = rays[3:6, :]
        d = rays[6:7, :]
        near = rays[7:8, :]
        far = rays[8:9, :]
        act0 = rays[9:10, :]

        B = d.shape[1]
        f32 = jnp.float32
        zeros = jnp.zeros((1, B), f32)

        def select_biases():
            """Per-layer bias columns for this block's frame: one-hot
            reduction over the tile (width-1 dynamic lane slices are
            hostile to Mosaic layouts). Called only under pl.when(alive) —
            a ~2.2 MB VMEM sweep dead blocks must not pay."""
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, FRAME_TILE), 1) == lane
            )
            biases = []
            for _, _, (off, out_p) in layers:
                tile = bias_ref[off:off + out_p, :]
                biases.append(
                    jnp.sum(jnp.where(onehot, tile, 0.0), axis=1,
                            keepdims=True)
                )
            return biases

        def mlp(p8, biases):
            # fp32 accumulation, one rounding at the activation (bf16
            # accumulation rejected — see fused_march._mlp precision note);
            # weights read AT USE from refs (dead blocks never touch them)
            h = None
            wi = 0
            n_layers = len(layers)
            for li, (wh, wx, _) in enumerate(layers):
                acc = None
                if wh is not None:
                    acc = jax.lax.dot_general(
                        w_refs[wi][:, :], h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    wi += 1
                if wx is not None:
                    xz = jax.lax.dot_general(
                        w_refs[wi][:, :], p8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = xz if acc is None else acc + xz
                    wi += 1
                acc = acc + biases[li]
                if li < n_layers - 1:
                    h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
                else:
                    h = acc
            sdf = h[0:1, :]
            if shared.final_tanh:
                sdf = jnp.tanh(sdf)
            return sdf

        # dead-block fast path: emit the init-state outputs and skip the
        # bias select + march entirely (a dead 512-lane block otherwise
        # pays the full per-block prologue before its early exit)
        big = jnp.full((1, B), _POS_BIG, f32)
        out_ref[:, :] = jnp.concatenate(
            [d, zeros, big, d, big, zeros, zeros, zeros], axis=0
        )

        @pl.when(jnp.max(act0) > 0.5)
        def _march_block():
            biases = select_biases()
            carry0 = (
                d, act0, zeros,
                jnp.full((1, B), _NEG_BIG, f32), jnp.full((1, B), _POS_BIG, f32),
                jnp.full((1, B), _POS_BIG, f32), jnp.full((1, B), _NEG_BIG, f32),
                jnp.full((1, B), _POS_BIG, f32), d,
                jnp.full((1, B), _POS_BIG, f32), zeros,
                zeros,                           # exhausted-without-bracket
            )

            def march_one(c):
                (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
                 last_f, steps, unres_f) = c
                act = act_f > 0.5
                p = o + d * v
                p8 = jnp.concatenate([p, jnp.zeros((5, B), f32)], axis=0)
                f = mlp(p8.astype(jnp.bfloat16), biases)

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

                converged = act & ((jnp.abs(f) < eps) | (bracketed & (width < deps)))

                d_aggr = d + alpha * f
                denom = f_hi - f_lo
                secant = (d_lo * f_hi - d_hi * f_lo) / jnp.where(denom == 0.0, 1.0, denom)
                secant = jnp.clip(secant, d_lo + 0.05 * width, d_hi - 0.05 * width)
                d_back = d + f
                d_next = jnp.where(bracketed, secant, jnp.where(outside, d_aggr, d_back))

                steps = steps + jnp.where(act, 1.0, 0.0)
                exhausted = steps >= float(max_steps)
                escaped = (~bracketed) & ((d_next > far) | (d_next < near - margin))
                missed = act & ~converged & (escaped | exhausted)
                if salvage:
                    # final march: accept the bracket midpoint on exhaustion
                    salvaged = act & ~converged & exhausted & bracketed
                else:
                    # step-capped round: bracketed-but-unconverged rays REQUEUE
                    # (midpoint depth at a small cap can be off by width/2)
                    salvaged = jnp.zeros_like(act)
                missed = missed & ~salvaged
                converged = converged | salvaged

                still = act & ~converged & ~missed
                d = jnp.where(still, d_next, jnp.where(salvaged, 0.5 * (d_lo + d_hi), d))
                last_f = jnp.where(act, f, last_f)
                hit_f = jnp.maximum(hit_f, jnp.where(converged, 1.0, 0.0))
                open_exh = act & ~converged & exhausted & (
                    jnp.ones_like(act) if not salvage else ~bracketed
                )
                unres_f = jnp.maximum(unres_f, jnp.where(open_exh, 1.0, 0.0))
                return (d, jnp.where(still, 1.0, 0.0), hit_f, d_lo, f_lo, d_hi,
                        f_hi, min_sdf, d_at_min, last_f, steps, unres_f)

            def loop_cond(kc):
                k, c = kc
                return (k < max_steps) & (jnp.max(c[1]) > 0.5)

            def loop_body(kc):
                k, c = kc
                return (k + 1, march_one(c))

            _, outc = jax.lax.while_loop(loop_cond, loop_body, (0, carry0))
            (d_out, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
             last_f, steps, unres_f) = outc
            brk = ((d_lo > _NEG_BIG / 2) & (d_hi < _POS_BIG / 2)).astype(f32)
            out_ref[:, :] = jnp.concatenate(
                [d_out, hit_f, min_sdf, d_at_min, last_f, steps,
                 jnp.maximum(act_f, unres_f),    # unresolved at exit
                 brk],                           # owns a bracket at exit
                axis=0,
            )

    return kernel


def _make_persistent_kernel(shared: SharedDecoder, march: MarchConfig,
                            max_steps: int, salvage: bool, block: int,
                            n_chunks: int):
    """ONE grid step; an in-kernel scalar loop walks the PRECOMPUTED list
    of live chunk indices, DMAs each HBM->VMEM, marches it, and DMAs the
    result back. Dead chunks never reach so much as a branch (the host
    builds the live list with one static-size jnp.where) — a dead grid
    block costs ~11 us of per-grid-step Mosaic machinery and even a
    skipped pl.when iteration measured ~16 us (scripts/diag_kernel.py),
    so iterating only live chunks is the only cheap formulation. Dead
    chunks' outputs come pre-seeded via input_output_aliases."""
    eps = march.convergence_eps
    deps = march.depth_eps
    alpha = march.alpha
    margin = march.far_margin
    layers = list(zip(shared.whT, shared.wxT, shared.offsets))
    total = shared.total

    def kernel(live_idx_ref, n_live_ref, rays_hbm, bias_hbm, *refs):
        # trailing refs: defaults (aliased to the output, unread), out,
        # then the scratch buffers and semaphores in declaration order
        (_defaults, out_hbm, rays_v, out_v, bias_v, tile_state,
         sem_in, sem_out, sem_bias) = refs[-9:]
        w_refs = refs[:-9]
        f32 = jnp.float32
        B = block

        tile_state[0] = -1  # current bias tile in bias_v (none yet)

        def mlp(p8, biases):
            h = None
            wi = 0
            n_layers = len(layers)
            for li, (wh, wx, _) in enumerate(layers):
                acc = None
                if wh is not None:
                    acc = jax.lax.dot_general(
                        w_refs[wi][:, :], h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    wi += 1
                if wx is not None:
                    xz = jax.lax.dot_general(
                        w_refs[wi][:, :], p8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = xz if acc is None else acc + xz
                    wi += 1
                acc = acc + biases[li]
                if li < n_layers - 1:
                    h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
                else:
                    h = acc
            sdf = h[0:1, :]
            if shared.final_tanh:
                sdf = jnp.tanh(sdf)
            return sdf

        def run_chunk(ci):
            tile = ci // FRAME_TILE

            @pl.when(tile != tile_state[0])
            def _fetch_tile():
                cp = pltpu.make_async_copy(
                    bias_hbm.at[:, pl.ds(tile * FRAME_TILE, FRAME_TILE)],
                    bias_v, sem_bias,
                )
                cp.start()
                cp.wait()
                tile_state[0] = tile

            cin = pltpu.make_async_copy(
                rays_hbm.at[:, pl.ds(ci * B, B)], rays_v, sem_in
            )
            cin.start()
            cin.wait()

            rays = rays_v[:, :]
            o = rays[0:3, :]
            v = rays[3:6, :]
            d = rays[6:7, :]
            near = rays[7:8, :]
            far = rays[8:9, :]
            act0 = rays[9:10, :]
            zeros = jnp.zeros((1, B), f32)

            lane = ci % FRAME_TILE
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, FRAME_TILE), 1) == lane
            )
            biases = []
            for _, _, (off, out_p) in layers:
                t = bias_v[off:off + out_p, :]
                biases.append(
                    jnp.sum(jnp.where(onehot, t, 0.0), axis=1, keepdims=True)
                )

            carry0 = (
                d, act0, zeros,
                jnp.full((1, B), _NEG_BIG, f32), jnp.full((1, B), _POS_BIG, f32),
                jnp.full((1, B), _POS_BIG, f32), jnp.full((1, B), _NEG_BIG, f32),
                jnp.full((1, B), _POS_BIG, f32), d,
                jnp.full((1, B), _POS_BIG, f32), zeros,
                zeros,
            )

            def march_one(c):
                (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
                 last_f, steps, unres_f) = c
                act = act_f > 0.5
                p = o + d * v
                p8 = jnp.concatenate([p, jnp.zeros((5, B), f32)], axis=0)
                f = mlp(p8.astype(jnp.bfloat16), biases)

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
                secant = (d_lo * f_hi - d_hi * f_lo) / jnp.where(
                    denom == 0.0, 1.0, denom
                )
                secant = jnp.clip(secant, d_lo + 0.05 * width,
                                  d_hi - 0.05 * width)
                d_back = d + f
                d_next = jnp.where(
                    bracketed, secant, jnp.where(outside, d_aggr, d_back)
                )

                steps = steps + jnp.where(act, 1.0, 0.0)
                exhausted = steps >= float(max_steps)
                escaped = (~bracketed) & (
                    (d_next > far) | (d_next < near - margin)
                )
                missed = act & ~converged & (escaped | exhausted)
                if salvage:
                    salvaged = act & ~converged & exhausted & bracketed
                else:
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
                return (d, jnp.where(still, 1.0, 0.0), hit_f, d_lo, f_lo,
                        d_hi, f_hi, min_sdf, d_at_min, last_f, steps, unres_f)

            def loop_cond(kc):
                k, c = kc
                return (k < max_steps) & (jnp.max(c[1]) > 0.5)

            def loop_body(kc):
                k, c = kc
                return (k + 1, march_one(c))

            _, outc = jax.lax.while_loop(loop_cond, loop_body, (0, carry0))
            (d_out, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
             last_f, steps, unres_f) = outc
            brk = ((d_lo > _NEG_BIG / 2) & (d_hi < _POS_BIG / 2)).astype(f32)
            out_v[:, :] = jnp.concatenate(
                [d_out, hit_f, min_sdf, d_at_min, last_f, steps,
                 jnp.maximum(act_f, unres_f), brk],
                axis=0,
            )
            cout = pltpu.make_async_copy(
                out_v, out_hbm.at[:, pl.ds(ci * B, B)], sem_out
            )
            cout.start()
            cout.wait()

        def cond(kc):
            return kc < n_live_ref[0]

        def body(kc):
            run_chunk(live_idx_ref[kc])
            return kc + 1

        jax.lax.while_loop(cond, body, 0)

    return kernel


def pallas_sphere_trace_persistent(
    shared: SharedDecoder,
    bias_bank: jax.Array,          # [total, F_pad]
    frame_of_ray: jax.Array,       # [N] int32 (frame-major)
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    init_active: Optional[jax.Array] = None,
    block: int = 512,
    interpret: bool = False,
    salvage: bool = True,
) -> TraceResult:
    """Persistent-formulation multi-frame trace: same contract as
    pallas_sphere_trace_batched, but the whole launch is ONE grid step
    whose in-kernel loop walks chunks and SKIPS dead ones (cost: a scalar
    branch vs ~11 us per dead grid block). Per-chunk bias columns are
    pregathered into chunk order so the kernel streams [total, 128] tiles
    sequentially."""
    n = origins.shape[0]
    if n % block:
        raise ValueError(f"ray count {n} not a multiple of block {block}")
    n_chunks = n // block
    frame_of_block = frame_of_ray[::block].astype(jnp.int32)

    t_near, t_far, enters = ray_sphere_entry(origins, dirs, march.sphere_radius, 0.0)
    far_bound = t_far + march.far_margin
    t_closest = jnp.maximum(-jnp.sum(origins * dirs, axis=-1), 0.0)
    d0 = jnp.where(enters, t_near, t_closest).astype(jnp.float32)
    if init_depth is not None:
        seeded = jnp.isfinite(init_depth) & enters
        d0 = jnp.where(seeded, jnp.maximum(init_depth, t_near), d0)
    active0 = enters if init_active is None else (enters & init_active)

    rays = jnp.zeros((16, n), jnp.float32)
    rays = rays.at[0:3, :].set(origins.T)
    rays = rays.at[3:6, :].set(dirs.T)
    rays = rays.at[6, :].set(d0)
    rays = rays.at[7, :].set(t_near)
    rays = rays.at[8, :].set(far_bound)
    rays = rays.at[9, :].set(active0.astype(jnp.float32))

    # live-chunk index list (static size, ascending; padded with 0) + the
    # per-chunk bias columns in CHUNK order
    alive = active0.reshape(n_chunks, block).any(axis=1)
    live_idx = jnp.where(alive, size=n_chunks, fill_value=0)[0].astype(
        jnp.int32
    )
    n_live = jnp.sum(alive).astype(jnp.int32).reshape(1)
    nc_pad = _round_up(n_chunks, FRAME_TILE)
    cols = jnp.pad(frame_of_block, (0, nc_pad - n_chunks))
    bias_cols = jnp.take(bias_bank, cols, axis=1)      # [total, nc_pad]

    # dead chunks keep these pre-seeded outputs (input_output_aliases)
    zeros_n = jnp.zeros((n,), jnp.float32)
    defaults = jnp.stack([
        d0, zeros_n, jnp.full((n,), _POS_BIG, jnp.float32), d0,
        jnp.full((n,), _POS_BIG, jnp.float32), zeros_n, zeros_n, zeros_n,
    ])

    weights = []
    for wh, wx in zip(shared.whT, shared.wxT):
        if wh is not None:
            weights.append(wh)
        if wx is not None:
            weights.append(wx)

    kernel = _make_persistent_kernel(
        shared, march, march.max_steps, salvage, block, n_chunks
    )

    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # live chunk indices
            pl.BlockSpec(memory_space=pltpu.SMEM),     # n_live
            pl.BlockSpec(memory_space=pl.ANY),         # rays (HBM)
            pl.BlockSpec(memory_space=pl.ANY),         # bias cols (HBM)
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
            pl.BlockSpec(memory_space=pl.ANY),         # defaults -> out
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        input_output_aliases={4 + len(weights): 0},
        scratch_shapes=[
            pltpu.VMEM((16, block), jnp.float32),
            pltpu.VMEM((8, block), jnp.float32),
            pltpu.VMEM((shared.total, FRAME_TILE), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(live_idx, n_live, rays, bias_cols, *weights, defaults)

    d = out[0]
    hit = out[1] > 0.5
    min_sdf = out[2]
    p_closest = origins + t_closest[:, None] * dirs
    geo_margin = jnp.linalg.norm(p_closest, axis=-1) - march.sphere_radius
    min_sdf = jnp.where(enters, min_sdf, geo_margin)
    min_sdf = jnp.where(min_sdf > _POS_BIG / 2, geo_margin, min_sdf)
    from dist_renderer_tpu.ops.tracer import live_counts_from_steps

    steps_i = out[5].astype(jnp.int32)
    return TraceResult(
        depth=d, hit=hit, min_sdf=min_sdf, depth_at_min=out[3],
        last_sdf=out[4], steps_used=jnp.max(steps_i),
        live_counts=live_counts_from_steps(steps_i, march.max_steps),
        unresolved=out[6] > 0.5,
        steps_per_ray=steps_i,
        bracketed=out[7] > 0.5,
    )


def pallas_sphere_trace_batched(
    shared: SharedDecoder,
    bias_bank: jax.Array,          # [total, F_pad]
    frame_of_ray: jax.Array,       # [N] int32 (frame-major: constant per block)
    origins: jax.Array,            # [N, 3]
    dirs: jax.Array,               # [N, 3]
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    init_active: Optional[jax.Array] = None,
    block: int = 512,
    interpret: bool = False,
    salvage: bool = True,
) -> TraceResult:
    """Multi-frame fused trace. N must be a multiple of `block` and each
    block's rays must belong to ONE frame (frame-major layout with
    per-frame padding to the block size). salvage=False marks
    bracketed-but-unconverged rays at the step cap as unresolved (for
    requeue in a later round) instead of accepting the bracket midpoint."""
    n = origins.shape[0]
    if n % block:
        raise ValueError(f"ray count {n} not a multiple of block {block}")
    n_blocks = n // block
    frame_of_block = frame_of_ray[::block].astype(jnp.int32)

    t_near, t_far, enters = ray_sphere_entry(origins, dirs, march.sphere_radius, 0.0)
    far_bound = t_far + march.far_margin
    t_closest = jnp.maximum(-jnp.sum(origins * dirs, axis=-1), 0.0)
    d0 = jnp.where(enters, t_near, t_closest).astype(jnp.float32)
    if init_depth is not None:
        seeded = jnp.isfinite(init_depth) & enters
        d0 = jnp.where(seeded, jnp.maximum(init_depth, t_near), d0)
    active0 = enters if init_active is None else (enters & init_active)

    rays = jnp.zeros((16, n), jnp.float32)
    rays = rays.at[0:3, :].set(origins.T)
    rays = rays.at[3:6, :].set(dirs.T)
    rays = rays.at[6, :].set(d0)
    rays = rays.at[7, :].set(t_near)
    rays = rays.at[8, :].set(far_bound)
    rays = rays.at[9, :].set(active0.astype(jnp.float32))

    weights = []
    for wh, wx in zip(shared.whT, shared.wxT):
        if wh is not None:
            weights.append(wh)
        if wx is not None:
            weights.append(wx)

    kernel = _make_multi_kernel(shared, march, march.max_steps, salvage)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((16, block), lambda i, fb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bias_bank.shape[0], FRAME_TILE),
                lambda i, fb: (0, fb[i] // FRAME_TILE),
                memory_space=pltpu.VMEM,
            ),
            *[
                pl.BlockSpec(w.shape, lambda i, fb: (0, 0),
                             memory_space=pltpu.VMEM)
                for w in weights
            ],
        ],
        out_specs=pl.BlockSpec((8, block), lambda i, fb: (0, i),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )(frame_of_block, rays, bias_bank, *weights)

    d = out[0]
    hit = out[1] > 0.5
    min_sdf = out[2]
    p_closest = origins + t_closest[:, None] * dirs
    geo_margin = jnp.linalg.norm(p_closest, axis=-1) - march.sphere_radius
    min_sdf = jnp.where(enters, min_sdf, geo_margin)
    min_sdf = jnp.where(min_sdf > _POS_BIG / 2, geo_margin, min_sdf)
    from dist_renderer_tpu.ops.tracer import live_counts_from_steps

    steps_i = out[5].astype(jnp.int32)
    return TraceResult(
        depth=d, hit=hit, min_sdf=min_sdf, depth_at_min=out[3],
        last_sdf=out[4], steps_used=jnp.max(steps_i),
        live_counts=live_counts_from_steps(steps_i, march.max_steps),
        unresolved=out[6] > 0.5,
        steps_per_ray=steps_i,
        bracketed=out[7] > 0.5,
    )


def batched_trace_padded(
    shared: SharedDecoder,
    bank: jax.Array,
    o: jax.Array,                  # [F, R, 3]
    v: jax.Array,                  # [F, R, 3]
    march: MarchConfig,
    seed: Optional[jax.Array],     # [F, R] or None
    active: jax.Array,             # [F, R] bool
    block: int = 512,
    interpret: bool = False,
    salvage: bool = True,
    persistent: bool = True,
) -> TraceResult:
    """Frame-major multi-frame trace with per-frame padding to the kernel
    block size. Returns a TraceResult whose per-ray fields are [F, R]
    (padding trimmed). Shared by render_batched_c2f and the shard_map
    wrapper in parallel/sharding.py. persistent=True routes through the
    one-grid-step kernel (dead chunks ~free)."""
    f, r = o.shape[0], o.shape[1]
    r_pad = _round_up(max(r, block), block)
    pad = r_pad - r
    o_p = jnp.pad(o, ((0, 0), (0, pad), (0, 0))).reshape(-1, 3)
    v_p = jnp.pad(v, ((0, 0), (0, pad), (0, 0)), constant_values=1.0).reshape(-1, 3)
    s_p = None
    if seed is not None:
        s_p = jnp.pad(seed, ((0, 0), (0, pad)), constant_values=jnp.nan).reshape(-1)
    a = jnp.pad(active, ((0, 0), (0, pad))).reshape(-1)
    frame_of_ray = jnp.repeat(jnp.arange(f, dtype=jnp.int32), r_pad)
    trace_fn = (
        pallas_sphere_trace_persistent if persistent
        else pallas_sphere_trace_batched
    )
    res = trace_fn(
        shared, bank, frame_of_ray, o_p, v_p, march, s_p,
        init_active=a, block=block, interpret=interpret, salvage=salvage,
    )
    unflat = lambda x: x.reshape(f, r_pad)[:, :r]
    return TraceResult(
        depth=unflat(res.depth), hit=unflat(res.hit),
        min_sdf=unflat(res.min_sdf), depth_at_min=unflat(res.depth_at_min),
        last_sdf=unflat(res.last_sdf), steps_used=res.steps_used,
        live_counts=res.live_counts, unresolved=unflat(res.unresolved),
        steps_per_ray=res.steps_per_ray,   # kept PADDED+BLOCKED: residency
                                           # telemetry needs kernel layout
        bracketed=unflat(res.bracketed),
    )


def fine_march_rounds(
    shared: SharedDecoder,
    bank: jax.Array,
    origins: jax.Array,            # [F, N, 3] or [F, 1, 3] (shared origin)
    dirs: jax.Array,               # [F, N, 3]
    key: jax.Array,                # [F, N] int32: 0 rim / 1 interior / 2 skip
    init_depth: jax.Array,         # [F, N] seed (NaN = start at sphere entry)
    march: MarchConfig,
    block: int = 512,
    round_caps: Tuple[int, ...] = (4, 12),
    interpret: bool = False,
    diag: Optional[dict] = None,
    live_frac: int = 2,
    return_anchor: bool = False,
    return_steps: bool = False,
) -> Tuple[jax.Array, ...]:
    """Multi-round straggler-rebinned fine march; outputs in PIXEL order.
    return_anchor=True additionally returns depth_at_min (the recorded
    min-|SDF| distance — the renderer's miss-ray margin anchor);
    return_steps=True appends per-ray step counts (live-ray telemetry on
    the production path, SURVEY.md §5 'Tracing / profiling').

    Why rounds: block residency is the MAX over a block's 512 rays, so a
    few 30-50-step stragglers hold class-sorted blocks at ~16 steps where
    the ray mean is ~4 (scripts/diag_binning.py). Each round caps every
    live ray at round_caps[i] steps (no midpoint salvage); survivors are
    re-packed densely and continue; the last round gets the full budget.
    Simulated residency on recorded true step counts: 16451 (one round) ->
    9258 (caps 4,12) at 512^2.

    Why lax.sort with payloads: TPU gathers cost ~20 ms per [8,262k]
    take_along_axis (scripts/diag_glue.py) — the round-1 implementation
    spent ~100 ms/launch on argsort+gather glue. A multi-operand lax.sort
    moves key+payloads together at ~19 ms total, and the final unsort is
    one sort keyed on the carried pixel index.

    Why a live-prefix (live_frac): after the class sort the skip rays form
    a dead suffix (~70% of a typical frame). Confining every round AND
    every repack sort to the first N/live_frac columns removes their dead
    kernel blocks and halves the repack-sort width. A lax.cond falls back
    to the full width whenever rim+interior overflow the prefix, so
    correctness never depends on the scene.

    Why buckets: re-packed survivors fill the leading columns, so later
    rounds march a STATIC slice (n/4, then n/8) — fewer dead blocks (one
    dead 512-lane block still costs ~4.4 us of launch). If survivors ever
    overflow the final bucket (never at measured 3.4% live; the slice has
    4-8x headroom), a lax.cond falls back to a full-width final round, so
    correctness never depends on the straggler fraction.
    """
    import dataclasses as _dc

    f, n = key.shape
    f32 = jnp.float32
    shared_origin = origins.shape[1] == 1

    def sort_by(k, payloads):
        out = jax.lax.sort((k,) + tuple(payloads), dimension=1,
                           num_keys=1, is_stable=True)
        return out[0], list(out[1:])

    pix = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (f, n))
    o_pay = [] if shared_origin else [origins[..., i] for i in range(3)]
    key_s, pays = sort_by(
        key, [dirs[..., 0], dirs[..., 1], dirs[..., 2], init_depth, pix] + o_pay
    )
    v_s0 = jnp.stack(pays[0:3], axis=-1)
    d0 = pays[3]
    pix_s0 = pays[4]
    o_s0 = origins if shared_origin else jnp.stack(pays[5:8], axis=-1)
    live0 = key_s != 2
    hit0 = jnp.zeros((f, n), f32)
    msdf0 = jnp.full((f, n), jnp.inf, f32)
    brk0 = jnp.zeros((f, n), bool)
    dam0 = jnp.where(jnp.isfinite(d0), d0, 0.0)  # skip rays: coarse anchor
    steps0 = jnp.zeros((f, n), jnp.int32)

    caps = tuple(round_caps)

    def rounds(width, state):
        """All rounds + repacks confined to the first `width` columns.
        Assumes every live ray is within that prefix. Returns full-width
        (d, hit_f, msdf, pix_s)."""
        v_s, d, hit_f, msdf, pix_s, o_s, live, brk, dam, stp = state
        # slice the working prefix once; the dead suffix rejoins at the end
        suffix = (d[:, width:], hit_f[:, width:], msdf[:, width:],
                  pix_s[:, width:], dam[:, width:], stp[:, width:])
        v_s, d, hit_f, msdf, pix_s, live, brk, dam, stp = (
            v_s[:, :width], d[:, :width], hit_f[:, :width],
            msdf[:, :width], pix_s[:, :width], live[:, :width],
            brk[:, :width], dam[:, :width], stp[:, :width],
        )
        if not shared_origin:
            o_s = o_s[:, :width]

        def o_slice(r):
            if shared_origin:
                return jnp.broadcast_to(o_s, (f, r, 3))
            return o_s[:, :r]

        def run_round(ri, r, m, salvage, d, live, hit_f, msdf, brk, dam,
                      stp):
            """March the first r columns (current order); merge back."""
            res = batched_trace_padded(
                shared, bank, o_slice(r), v_s[:, :r], m,
                d[:, :r], live[:, :r], block, interpret, salvage,
            )
            if diag is not None:
                diag[f"fine_r{ri}_block_residency"] = res.steps_per_ray.reshape(
                    -1, block).max(axis=1)
            was = live[:, :r]
            upd = lambda full, part: full.at[:, :r].set(
                jnp.where(was, part, full[:, :r]))
            d = upd(d, res.depth)
            hit_f = upd(hit_f, jnp.maximum(hit_f[:, :r], res.hit.astype(f32)))
            dam = dam.at[:, :r].set(
                jnp.where(was & (res.min_sdf <= msdf[:, :r]),
                          res.depth_at_min, dam[:, :r]))
            msdf = upd(msdf, jnp.minimum(msdf[:, :r], res.min_sdf))
            brk = upd(brk, res.bracketed)
            if return_steps:
                r_pad = res.steps_per_ray.shape[0] // f
                st_r = res.steps_per_ray.reshape(f, r_pad)[:, :r]
                stp = stp.at[:, :r].set(
                    stp[:, :r] + jnp.where(was, st_r, 0))
            live = upd(live, res.unresolved)
            return d, live, hit_f, msdf, brk, dam, stp

        def repack(v_s, d, hit_f, msdf, pix_s, o_s, live, brk, dam, stp):
            """Difficulty-grouped live-first re-pack (one payload sort):
            open (still aggressive-marching) survivors first, bracketed
            (a few cheap secant steps) next, dead last — blocks pay the
            max over their rays, so grouping by remaining work keeps
            them homogeneous."""
            k2 = jnp.where(~live, 2, jnp.where(brk, 1, 0)).astype(jnp.int32)
            k2_s, pays = sort_by(k2, [v_s[..., 0], v_s[..., 1], v_s[..., 2],
                                      d, hit_f, msdf, pix_s, brk, dam, stp] + (
                [] if shared_origin else
                [o_s[..., 0], o_s[..., 1], o_s[..., 2]]))
            v_s = jnp.stack(pays[0:3], axis=-1)
            d, hit_f, msdf, pix_s, brk, dam, stp = (
                pays[3], pays[4], pays[5], pays[6], pays[7], pays[8],
                pays[9])
            if not shared_origin:
                o_s = jnp.stack(pays[10:13], axis=-1)
            live = k2_s != 2  # live-first prefix in the new order
            return v_s, d, hit_f, msdf, pix_s, o_s, live, brk, dam, stp

        for ri, cap in enumerate(caps):
            m = _dc.replace(march, max_steps=min(cap, march.max_steps))
            if ri > 0:
                (v_s, d, hit_f, msdf, pix_s, o_s, live, brk, dam,
                 stp) = repack(v_s, d, hit_f, msdf, pix_s, o_s, live, brk,
                               dam, stp)
                bucket = min(_round_up(max(n // 4, block), block), width)
            else:
                bucket = width
            d, live, hit_f, msdf, brk, dam, stp = run_round(
                ri, bucket, m, False, d, live, hit_f, msdf, brk, dam, stp)

        # FINAL round: full remaining budget; bucketed w/ overflow fallback
        v_s, d, hit_f, msdf, pix_s, o_s, live, brk, dam, stp = repack(
            v_s, d, hit_f, msdf, pix_s, o_s, live, brk, dam, stp)
        bucket = min(_round_up(max(n // 8, block), block), width)

        if bucket >= width or diag is not None:
            # diag mode: cond branches may not write telemetry (the tracer
            # would leak out of the cond) — run unconditionally
            d, live, hit_f, msdf, brk, dam, stp = run_round(
                len(caps), width, march, True, d, live, hit_f, msdf, brk,
                dam, stp)
        else:
            max_live = jnp.max(jnp.sum(live, axis=1))
            state2 = (d, live, hit_f, msdf, brk, dam, stp)
            d, live, hit_f, msdf, brk, dam, stp = jax.lax.cond(
                max_live > bucket,
                lambda s: run_round(len(caps), width, march, True, *s),
                lambda s: run_round(len(caps), bucket, march, True, *s),
                state2,
            )
        cat = lambda a, sfx: jnp.concatenate([a, sfx], axis=1)
        return (cat(d, suffix[0]), cat(hit_f, suffix[1]),
                cat(msdf, suffix[2]), cat(pix_s, suffix[3]),
                cat(dam, suffix[4]), cat(stp, suffix[5]))

    state = (v_s0, d0, hit0, msdf0, pix_s0, o_s0, live0, brk0, dam0, steps0)
    prefix = min(_round_up(max(n // max(live_frac, 1), block), block), n)
    if prefix >= n or diag is not None:
        d, hit_f, msdf, pix_s, dam, stp = rounds(n, state)
    else:
        max_live0 = jnp.max(jnp.sum(live0, axis=1))
        d, hit_f, msdf, pix_s, dam, stp = jax.lax.cond(
            max_live0 > prefix,
            lambda s: rounds(n, s),
            lambda s: rounds(prefix, s),
            state,
        )

    # one unsort back to pixel order, results as payloads
    _, outs = sort_by(pix_s, [d, hit_f, msdf, dam, stp])
    out = (outs[0], outs[1] > 0.5, outs[2])
    if return_anchor:
        out = out + (outs[3],)
    if return_steps:
        out = out + (outs[4],)
    return out


def render_batched_c2f(
    params: Params,
    dcfg: DecoderConfig,
    latents: jax.Array,            # [F, L]
    origins: jax.Array,            # [F, H*W, 3] (square images)
    dirs: jax.Array,               # [F, H*W, 3]
    img_hw: Tuple[int, int],
    march: MarchConfig,
    block: int = 512,
    backoff: float = 0.05,
    coarse_steps: int = 16,
    strides: Tuple[int, ...] = (16, 4),
    interpret: bool = False,
    round_caps: Tuple[int, ...] = (4, 12),
    shared_origin: bool = False,
    with_diag: bool = False,
    live_frac: int = 3,
    return_anchor: bool = False,
    return_steps: bool = False,
) -> Tuple[jax.Array, ...]:
    """Coarse-to-fine classified BATCHED rendering — the full config-#5
    pipeline: coarse levels, classification, and the final march all run
    through the multi-frame fused kernel; sorting is per frame so blocks
    stay frame-pure AND work-homogeneous.

    Returns (depth [F, N], hit [F, N], min_sdf [F, N]); with_diag=True
    appends a dict of straggler telemetry: per-kernel-block march
    residency (max steps over the block's rays — what the block actually
    pays) and per-ray step counts for each phase. return_anchor=True
    appends depth_at_min (miss-ray margin anchors — what the single-frame
    renderer needs to route its whole trace through this path)."""
    import dataclasses as _dc

    f = origins.shape[0]
    h, w = img_hw
    n = h * w
    shared = pack_shared(params, dcfg)
    bank = fold_bias_bank(params, latents, dcfg, shared)
    coarse_march = _dc.replace(
        march, max_steps=min(march.max_steps, coarse_steps)
    )
    diag = {}

    def batched_trace(o, v, m, seed, active, tag=None, salvage=True):
        """o/v [F, R, 3] -> per-ray fields, each [F, R]."""
        res = batched_trace_padded(
            shared, bank, o, v, m, seed, active, block, interpret, salvage
        )
        if with_diag and tag:
            r_pad = res.steps_per_ray.shape[0] // f
            diag[f"{tag}_block_residency"] = res.steps_per_ray.reshape(
                -1, block
            ).max(axis=1)
            diag[f"{tag}_ray_steps"] = res.steps_per_ray.reshape(
                f, r_pad
            )[:, :o.shape[1]]
        return res.depth, res.hit, res.min_sdf, res.depth_at_min, res.unresolved

    o_g = origins.reshape(f, h, w, 3)
    v_g = dirs.reshape(f, h, w, 3)
    seed_full = None      # [F, H, W]
    hit_any_full = None
    hit_all_full = None
    anchor_full = None

    for stride in strides:
        if h % stride or w % stride:
            continue
        hh, ww = h // stride, w // stride
        o_l = o_g[:, ::stride, ::stride].reshape(f, -1, 3)
        v_l = v_g[:, ::stride, ::stride].reshape(f, -1, 3)
        if seed_full is None:
            seed = None
            active = jnp.ones((f, hh * ww), bool)
        else:
            seed = seed_full[:, ::stride, ::stride].reshape(f, -1)
            active = hit_any_full[:, ::stride, ::stride].reshape(f, -1)
            seed = jnp.where(
                active, seed,
                anchor_full[:, ::stride, ::stride].reshape(f, -1),
            )
        d, hit, msdf, dam, unres = batched_trace(
            o_l, v_l, coarse_march, seed, active, tag=f"coarse{stride}"
        )
        seedable = hit | unres
        depth_grid = jnp.where(seedable, d, jnp.inf).reshape(f, hh, ww)
        hitish = seedable.reshape(f, hh, ww)
        strict = hit.reshape(f, hh, ww)
        rw = lambda g, init, op: jax.lax.reduce_window(
            g, init, op, (1, 3, 3), (1, 1, 1), "SAME"
        )
        dmin = rw(depth_grid, jnp.inf, jax.lax.min)
        dmax = rw(jnp.where(jnp.isfinite(depth_grid), depth_grid, -jnp.inf),
                  -jnp.inf, jax.lax.max)
        hit_any = rw(hitish, False, jax.lax.bitwise_or)
        hit_all = rw(strict, True, jax.lax.bitwise_and)
        up = lambda g: jnp.repeat(jnp.repeat(g, stride, 1), stride, 2)
        # tight seeds on depth-flat windows (see renderer.c2f_plan)
        bo = jnp.where((dmax - dmin) < backoff, 0.2 * backoff, backoff)
        seed_full = jnp.where(jnp.isfinite(up(dmin)), up(dmin) - up(bo), jnp.nan)
        hit_any_full = up(hit_any)
        hit_all_full = up(hit_all)
        anchor_full = up(dam.reshape(f, hh, ww))
        margin_full = up(msdf.reshape(f, hh, ww))
        width_full = up(jnp.where(jnp.isfinite(dmax - dmin), dmax - dmin, jnp.inf))

    if seed_full is None:  # no valid strides: plain batched march
        res = batched_trace_padded(
            shared, bank, origins, dirs, march, None,
            jnp.ones((f, n), bool), block, interpret, True,
        )
        out = (res.depth, res.hit, res.min_sdf)
        if return_anchor:
            out = out + (res.depth_at_min,)
        if return_steps:
            r_pad = res.steps_per_ray.shape[0] // f
            out = out + (res.steps_per_ray.reshape(f, r_pad)[:, :n],)
        return out + ((diag,) if with_diag else ())

    seed = seed_full.reshape(f, n)
    hit_any = hit_any_full.reshape(f, n)
    hit_all = hit_all_full.reshape(f, n)
    anchor = anchor_full.reshape(f, n)
    margin = margin_full.reshape(f, n)

    skip = ~hit_any
    init_depth = jnp.where(skip, anchor, seed)
    rim = hit_any & ~hit_all
    key = jnp.where(rim, 0, jnp.where(hit_all, 1, 2)).astype(jnp.int32)
    if with_diag:
        diag["plan_key"] = key
        diag["plan_width"] = width_full.reshape(f, n)
        diag["plan_seed"] = seed

    o_in = origins[:, :1, :] if shared_origin else origins
    fine = fine_march_rounds(
        shared, bank, o_in, dirs, key, init_depth, march,
        block=block, round_caps=round_caps, interpret=interpret,
        diag=diag if with_diag else None, live_frac=live_frac,
        return_anchor=return_anchor, return_steps=return_steps,
    )
    d, hit, msdf = fine[:3]
    # skip rays never marched: their silhouette margin is the coarse one
    msdf = jnp.where(skip, margin, msdf)
    out = (d, hit, msdf)
    k = 3
    if return_anchor:
        # skip rays' margin anchor is the coarse min-SDF point
        out = out + (jnp.where(skip, anchor, fine[k]),)
        k += 1
    if return_steps:
        out = out + (fine[k],)
    return out + ((diag,) if with_diag else ())


def render_depth_batched(
    params: Params,
    dcfg: DecoderConfig,
    latents: jax.Array,            # [F, L]
    origins: jax.Array,            # [F, R, 3] per-frame rays
    dirs: jax.Array,               # [F, R, 3]
    march: MarchConfig,
    block: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched depth/hit for F frames (config #5 forward path).

    Returns (depth [F, R], hit [F, R])."""
    f, r = origins.shape[0], origins.shape[1]
    r_pad = _round_up(r, block)
    shared = pack_shared(params, dcfg)
    bank = fold_bias_bank(params, latents, dcfg, shared)

    o = jnp.pad(origins, ((0, 0), (0, r_pad - r), (0, 0))).reshape(-1, 3)
    v = jnp.pad(
        dirs, ((0, 0), (0, r_pad - r), (0, 0)),
        constant_values=1.0,  # pad rays point somewhere harmless
    ).reshape(-1, 3)
    frame_of_ray = jnp.repeat(jnp.arange(f, dtype=jnp.int32), r_pad)
    active = jnp.tile(
        jnp.arange(r_pad) < r, (f,)
    )

    res = pallas_sphere_trace_batched(
        shared, bank, frame_of_ray, o, v, march,
        init_active=active, block=block, interpret=interpret,
    )
    depth = res.depth.reshape(f, r_pad)[:, :r]
    hit = res.hit.reshape(f, r_pad)[:, :r]
    return depth, hit
