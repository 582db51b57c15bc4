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
from dist_renderer_tpu.ops.pallas.march_body import (
    default_rows, march_rows, mlp_apply,
)
from dist_renderer_tpu.ops.tracer import TraceResult

FRAME_TILE = 128  # frames per bias-bank tile (lane width)


def _kinds(shared: "SharedDecoder"):
    """Per-layer 'h'/'x'/'hx' input descriptor for march_body.mlp_apply."""
    return [
        ("h" if wh is not None else "") + ("x" if wx is not None else "")
        for wh, wx in zip(shared.whT, shared.wxT)
    ]


def _select_bank_biases(bias_tile, offsets, lane):
    """Per-layer bias columns for one frame out of a [total, FRAME_TILE]
    bias-bank tile: one-hot reduction over the tile lanes (width-1 dynamic
    lane slices are hostile to Mosaic layouts). ~2.2 MB VMEM sweep — call
    only for blocks that actually march."""
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, FRAME_TILE), 1) == lane
    )
    biases = []
    for off, out_p in offsets:
        tile = bias_tile[off:off + out_p, :]
        biases.append(
            jnp.sum(jnp.where(onehot, tile, 0.0), axis=1, keepdims=True)
        )
    return biases


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
    kinds = _kinds(shared)
    offsets = shared.offsets

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
        zeros = jnp.zeros((1, d.shape[1]), jnp.float32)

        # dead-block fast path: emit the init-state outputs and skip the
        # bias select + march entirely (a dead 512-lane block otherwise
        # pays the full per-block prologue before its early exit)
        out_ref[:, :] = default_rows(d, zeros)

        @pl.when(jnp.max(act0) > 0.5)
        def _march_block():
            biases = _select_bank_biases(bias_ref, offsets, lane)
            mlp = lambda p8: mlp_apply(kinds, w_refs, biases,
                                       shared.final_tanh, p8)
            out_ref[:, :] = march_rows(
                mlp, o, v, d, near, far, act0, march, max_steps, salvage
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
    kinds = _kinds(shared)
    offsets = shared.offsets
    B = block

    def kernel(live_idx_ref, n_live_ref, rays_hbm, bias_hbm, *refs):
        # trailing refs: defaults (aliased to the output, unread), out,
        # then the scratch buffers and semaphores in declaration order
        (_defaults, out_hbm, rays_v, out_v, bias_v, tile_state,
         sem_in, sem_out, sem_bias) = refs[-9:]
        w_refs = refs[:-9]

        tile_state[0] = -1  # current bias tile in bias_v (none yet)

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

            biases = _select_bank_biases(bias_v, offsets, ci % FRAME_TILE)
            mlp = lambda p8: mlp_apply(kinds, w_refs, biases,
                                       shared.final_tanh, p8)
            out_v[:, :] = march_rows(
                mlp, o, v, d, near, far, act0, march, max_steps, salvage
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
    return_last: bool = False,
    return_unres: bool = False,
    difficulty_repack: Optional[bool] = None,
) -> Tuple[jax.Array, ...]:
    """Multi-round straggler-rebinned fine march; outputs in PIXEL order.
    return_anchor=True additionally returns depth_at_min (the recorded
    min-|SDF| distance — the renderer's miss-ray margin anchor);
    return_steps=True appends per-ray step counts (live-ray telemetry on
    the production path, SURVEY.md §5 'Tracing / profiling');
    return_last=True appends (last_sdf, unresolved) — the kernel's true
    final SDF sample per marched ray (+inf where never marched) and the
    open-at-exit flag, so single-frame TraceResults carry real telemetry
    instead of fabricated zeros. return_unres=True appends ONLY the
    unresolved flag (free: 'live' is re-derived from the sort key, never
    carried — the proxy verify stage needs it without paying for lsdf).
    Flag-gated because each extra field rides every repack sort as a
    payload: dam/stp/lsdf are created, updated, and unsorted ONLY when
    their flag asks for them (a [F, N] f32 payload costs real sort
    bandwidth x 4 sorts — measured on the round-4 verify-stage diet).

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

    Why difficulty_repack (and why it is GATED on frame count): repacks
    can refine the open/bracketed/dead grouping with the quantized
    |last SDF sample| (a bracketed ray's |f| ~ its remaining secant work;
    an open ray's |f| separates creeping grazers from fast far-field
    marchers). Pure scheduling — ray results are order-invariant. The
    v5e measurements are scale-dependent in a way the kernels don't
    explain: +5% at F=64 (bench headline) but -10% at F=8-32, with the
    fine stage IN ISOLATION timing identical either way — the cost is an
    XLA cross-stage scheduling interaction with the classification
    pipeline, not the binning (round-3 probes, docs/PERFORMANCE.md).
    Default None = on when f >= 32: re-measured in round 5 with the
    proxy pipeline at every production F (scripts/diag_repack_scale.py,
    512^2 v5e): F=8 0.78x (regression confirmed — gate stays), F=32
    1.045x, F=64 1.041x — the r3 F=32 regression no longer reproduces
    on the current pipeline, so the gate moved down from 48. A
    width-quantized INITIAL subkey was also measured and dropped: same
    isolation-neutrality, but -35% at F<=32 in the full graph.
    """
    import dataclasses as _dc

    f, n = key.shape
    f32 = jnp.float32
    shared_origin = origins.shape[1] == 1

    def sort_fields(k, fields):
        """Stable sort on k; the named fields ride as payloads and come
        back as a dict in the same (insertion) order — adding a carried
        field is one dict entry, not a positional-index audit."""
        names = list(fields)
        out = jax.lax.sort((k,) + tuple(fields[nm] for nm in names),
                           dimension=1, num_keys=1, is_stable=True)
        return out[0], dict(zip(names, out[1:]))

    # carried per-ray state, class-sorted once up front; re-packed (sorted
    # again) between rounds. "live" is always re-derived from the sort key
    # rather than carried as a payload.
    pix = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (f, n))
    init0 = dict(
        vx=dirs[..., 0], vy=dirs[..., 1], vz=dirs[..., 2],
        d=init_depth, pix=pix,
    )
    if not shared_origin:
        init0.update(ox=origins[..., 0], oy=origins[..., 1],
                     oz=origins[..., 2])
    if difficulty_repack is None:
        difficulty_repack = f >= 32
    carry_lsdf = difficulty_repack or return_last
    key_s, st0 = sort_fields(key, init0)
    st0["live"] = key_s != 2
    st0["hit"] = jnp.zeros((f, n), f32)
    st0["msdf"] = jnp.full((f, n), jnp.inf, f32)
    st0["brk"] = jnp.zeros((f, n), bool)
    if return_anchor:
        st0["dam"] = jnp.where(jnp.isfinite(st0["d"]), st0["d"], 0.0)
    if return_steps:
        st0["stp"] = jnp.zeros((f, n), jnp.int32)
    if carry_lsdf:
        # |last f| doubles as the difficulty-repack signal
        st0["lsdf"] = jnp.full((f, n), jnp.inf, f32)

    caps = tuple(round_caps)
    out_fields = (
        ["d", "hit", "msdf", "pix"]
        + (["dam"] if return_anchor else [])
        + (["stp"] if return_steps else [])
        + (["lsdf"] if return_last else [])
        + (["live"] if return_last or return_unres else [])
    )

    def rounds(width, st):
        """All rounds + repacks confined to the first `width` columns.
        Assumes every live ray is within that prefix. Returns the
        full-width out_fields dict."""
        # slice the working prefix once; the dead suffix rejoins at the end
        suffix = {nm: st[nm][:, width:] for nm in out_fields}
        st = {nm: a[:, :width] for nm, a in st.items()}

        def o_slice(s, r):
            if shared_origin:
                return jnp.broadcast_to(origins, (f, r, 3))
            return jnp.stack(
                [s["ox"][:, :r], s["oy"][:, :r], s["oz"][:, :r]], axis=-1
            )

        def run_round(ri, s, r, m, salvage):
            """March the first r columns (current order); merge back."""
            v_r = jnp.stack(
                [s["vx"][:, :r], s["vy"][:, :r], s["vz"][:, :r]], axis=-1
            )
            res = batched_trace_padded(
                shared, bank, o_slice(s, r), v_r, m,
                s["d"][:, :r], s["live"][:, :r], block, interpret, salvage,
            )
            if diag is not None:
                diag[f"fine_r{ri}_block_residency"] = res.steps_per_ray.reshape(
                    -1, block).max(axis=1)
            s = dict(s)
            was = s["live"][:, :r]
            upd = lambda full, part: full.at[:, :r].set(
                jnp.where(was, part, full[:, :r]))
            if return_anchor:
                # dam keys off the PRE-update msdf: keep the anchor of
                # the round that actually achieved the min
                s["dam"] = s["dam"].at[:, :r].set(
                    jnp.where(was & (res.min_sdf <= s["msdf"][:, :r]),
                              res.depth_at_min, s["dam"][:, :r]))
            s["d"] = upd(s["d"], res.depth)
            s["hit"] = upd(s["hit"],
                           jnp.maximum(s["hit"][:, :r], res.hit.astype(f32)))
            s["msdf"] = upd(s["msdf"],
                            jnp.minimum(s["msdf"][:, :r], res.min_sdf))
            s["brk"] = upd(s["brk"], res.bracketed)
            if return_steps:
                r_pad = res.steps_per_ray.shape[0] // f
                st_r = res.steps_per_ray.reshape(f, r_pad)[:, :r]
                s["stp"] = s["stp"].at[:, :r].set(
                    s["stp"][:, :r] + jnp.where(was, st_r, 0))
            if carry_lsdf:
                s["lsdf"] = upd(s["lsdf"], res.last_sdf)
            s["live"] = upd(s["live"], res.unresolved)
            return s

        def repack(s):
            """Difficulty-grouped live-first re-pack (one payload sort):
            open (still aggressive-marching) survivors first, bracketed
            (a few cheap secant steps) next, dead last — blocks pay the
            max over their rays, so grouping by remaining work keeps
            them homogeneous. Within each class, the quantized |last f|
            refines the grouping: bracketed rays with tiny |f| converge
            in 1-2 secant steps while wide-bracket ones take ~8; open
            rays with tiny |f| are creeping grazers (30-50 steps) while
            large-|f| ones either escape or close fast."""
            if difficulty_repack:
                eps = march.convergence_eps
                qf = jnp.digitize(
                    jnp.abs(jnp.nan_to_num(s["lsdf"], posinf=1e9)),
                    jnp.asarray([4 * eps, 16 * eps, 64 * eps], f32),
                ).astype(jnp.int32)
                k2 = jnp.where(~s["live"], 99,
                               jnp.where(s["brk"], 4, 0) + qf)
            else:
                k2 = jnp.where(~s["live"], 99, jnp.where(s["brk"], 1, 0))
            k2 = k2.astype(jnp.int32)
            fields = {nm: a for nm, a in s.items() if nm != "live"}
            k2_s, out = sort_fields(k2, fields)
            out["live"] = k2_s < 99  # live-first prefix in the new order
            return out

        for ri, cap in enumerate(caps):
            m = _dc.replace(march, max_steps=min(cap, march.max_steps))
            if ri > 0:
                st = repack(st)
                bucket = min(_round_up(max(n // 4, block), block), width)
            else:
                bucket = width
            if bucket >= width or diag is not None:
                st = run_round(ri, st, width, m, False)
            else:
                # overflow guard: EVERY live ray must receive EVERY round's
                # step cap, or the total march budget becomes layout-
                # dependent (a sharded band and the full frame would give
                # different results — caught by the multichip flagship
                # gate with a rough decoder at tight budgets)
                max_live = jnp.max(jnp.sum(st["live"], axis=1))
                st = jax.lax.cond(
                    max_live > bucket,
                    lambda s, ri=ri, m=m: run_round(ri, s, width, m, False),
                    lambda s, ri=ri, m=m: run_round(ri, s, bucket, m, False),
                    st,
                )

        # FINAL round: full remaining budget; bucketed w/ overflow fallback
        st = repack(st)
        bucket = min(_round_up(max(n // 8, block), block), width)

        if bucket >= width or diag is not None:
            # diag mode: cond branches may not write telemetry (the tracer
            # would leak out of the cond) — run unconditionally
            st = run_round(len(caps), st, width, march, True)
        else:
            max_live = jnp.max(jnp.sum(st["live"], axis=1))
            st = jax.lax.cond(
                max_live > bucket,
                lambda s: run_round(len(caps), s, width, march, True),
                lambda s: run_round(len(caps), s, bucket, march, True),
                st,
            )
        return {
            nm: jnp.concatenate([st[nm], suffix[nm]], axis=1)
            for nm in out_fields
        }

    prefix = min(_round_up(max(n // max(live_frac, 1), block), block), n)
    if prefix >= n or diag is not None:
        outd = rounds(n, st0)
    else:
        max_live0 = jnp.max(jnp.sum(st0["live"], axis=1))
        outd = jax.lax.cond(
            max_live0 > prefix,
            lambda s: rounds(n, s),
            lambda s: rounds(prefix, s),
            st0,
        )

    # one unsort back to pixel order, results as payloads
    _, od = sort_fields(
        outd["pix"], {nm: outd[nm] for nm in out_fields if nm != "pix"}
    )
    out = (od["d"], od["hit"] > 0.5, od["msdf"])
    if return_anchor:
        out = out + (od["dam"],)
    if return_steps:
        out = out + (od["stp"],)
    if return_last:
        out = out + (od["lsdf"], od["live"])
    elif return_unres:
        out = out + (od["live"],)
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
    return_last: bool = False,
    scheduler: str = "rounds",
    queue_caps: Tuple[int, ...] = (6, 16),
    queue_dense_frac: float = 0.5,
    warm: Optional[Tuple[jax.Array, ...]] = None,
    proxy: Optional[Tuple[Params, DecoderConfig]] = None,
    proxy_backoff: float = 0.015,
    proxy_band: float = 0.02,
    proxy_block: Optional[int] = None,
    proxy_verify: bool = True,     # False = UNVERIFIED proxy trace (depth/
                                   # hit/margins carry proxy error — a
                                   # diagnostics/cost-attribution knob, not
                                   # a production mode)
    verify_mode: str = "march",    # "march": every proxy hit confirmed by a
                                   # seeded full-decoder march, band rays
                                   # re-marched from sphere entry. MEASURED
                                   # BEST on v5e (18.3 vs cert's 20.6-23.1
                                   # ms/frame, 512^2 F=8 —
                                   # scripts/diag_proxy_ab.py).
                                   # "cert": dense full-decoder probes do the
                                   # whole verify (ops/cert.py) — 2-probe
                                   # bracket certification of proxy hits +
                                   # 3-probe dip-minimum estimation of band
                                   # rays; only demoted/promoted/overflow
                                   # rays fall back to a SEEDED march and
                                   # only unres rays re-march for real.
                                   # Fewer full evals on paper, but the probe
                                   # kernel's per-block cost + glue lose to
                                   # the seeded march in the full graph.
    proxy_band_w: float = 0.02,    # band-probe half-window around the proxy
                                   # argmin (ops/cert.py parabola fit)
    verify_hits: str = "march",    # proxy-HIT treatment in the verify
                                   # stage: "march" — every proxy hit
                                   # confirmed by a seeded full-decoder
                                   # march (depth + hit genuine straight
                                   # out of the trace). "polish" — proxy
                                   # hits SKIP the verify march entirely
                                   # (only band + unresolved rays re-march
                                   # with the full decoder); hit depth
                                   # keeps the proxy's error (~error p99)
                                   # and the hit mask may carry the
                                   # proxy's rare false hits (measured
                                   # 0.07% of hits on the bench proxy).
                                   # This is a CONTRACT SHIFT, not an
                                   # accuracy loss: the caller finalizes
                                   # hits against the full decoder —
                                   # renderer.py's compose() does it for
                                   # free (its fp32 Newton polish
                                   # re-anchors depth and demotes hits
                                   # whose full-decoder |f| stays above
                                   # convergence_eps — the march's own
                                   # hit criterion), finalize_hits_batched
                                   # does it for trace-only callers.
                                   # Requires verify_mode="march" +
                                   # verify_band="march". Motivation:
                                   # seeded hit confirmation is ~2/3 of
                                   # verify block-steps at 21% hit rays
                                   # (scripts/diag_proxy.py r5: verify
                                   # stage 11.3 of 17.5 ms/frame, F=64).
    verify_round_caps: Optional[Tuple[int, ...]] = None,
    verify_gen_caps: Optional[Tuple[int, ...]] = None,
                                   # queue-scheduler gen-cap schedule for the
                                   # VERIFY stage (None = the main queue
                                   # caps). Separate from verify_round_caps:
                                   # the rounds-tuned (2,4,12) default was
                                   # measured to REGRESS the F=1 queue path
                                   # when reused as gen caps (r5 batch #1
                                   # bench: fwd 25.3 -> 26.5 ms)
                                   # rounds-scheduler cap schedule for the
                                   # VERIFY stage (None = round_caps). The
                                   # verify stage's step distribution is
                                   # nothing like the main march's — seeded
                                   # hits converge in ~2-3 full-decoder
                                   # steps, band/unres rays run long — so
                                   # its residency-vs-repack-glue optimum
                                   # sits at different caps (pure
                                   # scheduling, results bit-identical;
                                   # sweep scripts/diag_verify_caps.py)
    difficulty_repack: Optional[bool] = None,  # rounds-scheduler repack
                                   # refinement (fine_march_rounds); None =
                                   # the measured F>=48 gate — exposed for
                                   # scale-dependence re-measurement
    verify_band: str = "march",    # band-ray treatment (applies under BOTH
                                   # verify modes; with verify_mode="march"
                                   # + "probe" this is the HYBRID: hits keep
                                   # the seeded confirmation march, only
                                   # band rays ride ops/cert.py):
                                   # "march" — full-decoder march from sphere
                                   # entry (margin error ~1-2e-3: sampling
                                   # density rises as f falls, so the dip is
                                   # densely sampled). "probe" — 3-probe
                                   # parabola at the proxy argmin (ops/
                                   # cert.py): ~15x cheaper but margin error
                                   # is bounded by ~2x the PROXY's field
                                   # error on grazing dips (the argmin is
                                   # ill-conditioned where the dip is flat;
                                   # measured on the toy test proxy e_p95
                                   # 7e-3: probe-vs-true max 9.4e-3 vs the
                                   # march's 2.9e-3 — scripts/
                                   # debug_band_probe.py). Only flip to
                                   # "probe" with a proxy whose p95 error
                                   # keeps 2e below the margin fidelity you
                                   # need; hit/miss verdicts stay genuine
                                   # either way (probed band rays with dip
                                   # <= 0 re-march seeded).
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
    renderer needs to route its whole trace through this path).

    proxy: optional (params, DecoderConfig) of a DISTILLED proxy decoder
    (models/proxy.py, ~8-10x fewer FLOPs/eval). When given, the whole
    pyramid + classification + fine march above runs on the PROXY, and a
    second VERIFY stage re-marches the full decoder from proxy-derived
    seeds, so depth and the hit mask are genuine full-decoder march
    results:

      - proxy-HIT rays: seeded at (proxy depth - proxy_backoff), a ~2
        eval confirmation in the march kernel; the bracket-secant march
        is the automatic fallback when the full field disagrees.
        proxy_backoff must be ~the proxy error p99, NOT larger: every
        extra retreat adds forward steps (0.015 measured ~4.7 steps of
        block residency per seeded block vs ~2 at 0.005). It must also
        not be ZERO: a false proxy hit seeded exactly at its claimed
        depth marches forward only and never samples the true field dip
        just behind the seed, so its demoted-miss margin is garbage
        (measured: a 4.0e-3 margin read back as 9.7e-3, past the 5e-3
        band-margin fidelity contract in tests/test_proxy.py).
      - proxy near-miss rays (margin < proxy_band) and unresolved rays:
        full rim-class march (these are the only rays whose hit/miss
        verdict the proxy cannot be trusted on). Band rays seed at
        sphere entry: window-seeding at (proxy argmin - w) was tried and
        REJECTED — the march enters the dip with a large field value, so
        its first aggressive step leapfrogs the minimum and the recorded
        margin lands wherever sampling luck puts it (measured: a 4.0e-3
        margin read back as 9.7e-3, past the 5e-3 band-margin fidelity
        contract in tests/test_proxy.py). The entry seed reproduces the
        full pipeline's own sampling pattern; band cost is controlled by
        proxy_band (tied to the proxy's measured error max) instead.
      - clear misses (margin >= proxy_band): skipped; their silhouette
        margin keeps the proxy value (error <= proxy model error; the
        margins that silhouette losses actually push on — the near-zero
        ones — come from the full-decoder verify march).
    """
    import dataclasses as _dc

    from dist_renderer_tpu.ops.c2f import classify_pyramid, plan_from_maps

    # a typo'd mode would silently fall through to the march path and
    # invalidate A/B measurements (ADVICE r4)
    if verify_mode not in ("march", "cert"):
        raise ValueError(f"verify_mode must be 'march' or 'cert', "
                         f"got {verify_mode!r}")
    if verify_band not in ("march", "probe"):
        raise ValueError(f"verify_band must be 'march' or 'probe', "
                         f"got {verify_band!r}")
    if verify_hits not in ("march", "polish", "polish-all"):
        raise ValueError(f"verify_hits must be 'march', 'polish' or "
                         f"'polish-all', got {verify_hits!r}")
    if verify_hits != "march" and (verify_mode != "march"
                                   or verify_band != "march"):
        raise ValueError(
            "verify_hits='polish' composes only with verify_mode='march' "
            "and verify_band='march' (the cert/probe paths decide hits "
            "in-trace, which 'polish' explicitly defers to the caller)"
        )

    f = origins.shape[0]
    h, w = img_hw
    n = h * w
    shared = pack_shared(params, dcfg)
    bank = fold_bias_bank(params, latents, dcfg, shared)
    if proxy is not None:
        pp, pc = proxy
        shared_m = pack_shared(pp, pc)
        bank_m = fold_bias_bank(pp, latents, pc, shared_m)
        # proxy weights are ~20x smaller: wider blocks amortize the
        # march's per-block VPU machinery (measured 2.36 us/512 lanes at
        # block=512 vs 2.00 at 2048 on uniform work; residency growth
        # with width is the counter-force — sweep before changing)
        block_m = proxy_block if proxy_block else block
    else:
        shared_m, bank_m = shared, bank
        block_m = block
    coarse_march = _dc.replace(
        march, max_steps=min(march.max_steps, coarse_steps)
    )
    diag = {}

    def trace_level(o_l, v_l, seed, active, stride):
        """Coarse level through the multi-frame fused kernel (the proxy
        when one is given — classification is verified downstream)."""
        res = batched_trace_padded(
            shared_m, bank_m, o_l, v_l, coarse_march, seed, active, block_m,
            interpret, True,
        )
        if with_diag:
            r_pad = res.steps_per_ray.shape[0] // f
            diag[f"coarse{stride}_block_residency"] = res.steps_per_ray.reshape(
                -1, block_m
            ).max(axis=1)
            diag[f"coarse{stride}_ray_steps"] = res.steps_per_ray.reshape(
                f, r_pad
            )[:, :o_l.shape[1]]
        return res

    if warm is not None:
        # warm start: classification from the previous iteration's trace
        # (depth, hitish, anchor, margin each [F, N]) — the coarse
        # pyramid is skipped entirely (SURVEY.md §3.3-3.5 inner loops)
        from dist_renderer_tpu.ops.c2f import warm_maps

        w_depth, w_hitish, w_anchor, w_margin = warm
        maps = warm_maps(w_depth, w_hitish, w_anchor, w_margin,
                         img_hw, backoff)
    else:
        maps = classify_pyramid(
            trace_level,
            origins.reshape(f, h, w, 3),
            dirs.reshape(f, h, w, 3),
            tuple(s for s in strides if h % s == 0 and w % s == 0),
            backoff,
        )

    if maps is None:  # no valid strides: plain batched march
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
        if return_last:
            out = out + (res.last_sdf, res.unresolved)
        return out + ((diag,) if with_diag else ())

    key, init_depth, skip = plan_from_maps(maps)
    anchor = maps.anchor.reshape(f, n)
    margin = maps.margin.reshape(f, n)
    if with_diag:
        diag["plan_key"] = key
        diag["plan_width"] = maps.width.reshape(f, n)
        diag["plan_seed"] = maps.seed.reshape(f, n)

    o_in = origins[:, :1, :] if shared_origin else origins
    if scheduler == "auto":
        # measured on v5e at 512^2: the one-launch queue wins single-frame
        # latency (no per-frame sort glue: 32.5 -> 21.7 ms) while the
        # rounds scheduler wins batched throughput (sorts vectorize over
        # frames; the queue's chunk walk is sequential in F)
        scheduler = "queue" if f == 1 else "rounds"

    verify = proxy is not None and proxy_verify

    def fine_stage(sh, bk, key_s, seed_s, stage_diag, blk,
                   want_anchor=False, want_steps=False, want_last=False,
                   want_unres=False, caps=None, qcaps=None):
        """One scheduler pass; canonical 7-tuple in pixel order:
        (d, hit, msdf, dam, lastf, steps, unres). Un-wanted fields come
        back as None on the rounds scheduler — every extra field rides
        its repack sorts as a [F, N] payload (the round-4 verify diet:
        the proxy stage only needs `unres` beyond the core triple, and
        `live` is key-derived, so want_unres is payload-free)."""
        if scheduler == "queue":
            from dist_renderer_tpu.ops.pallas.queue_march import queue_march

            # the queue kernel's compaction one-hots are [2B, B] — VMEM
            # scales as B^2, so wide proxy blocks stay a grid/rounds-only
            # lever; it compacts in-kernel, so every field is free
            d, hit, msdf, dam, lastf, steps, unres = queue_march(
                sh, bk, o_in, dirs, key_s, seed_s, march,
                block=min(blk, block), gen_caps=qcaps or queue_caps,
                dense_frac=queue_dense_frac, interpret=interpret,
            )
            return d, hit, msdf, dam, lastf, steps.astype(jnp.int32), unres
        fine = fine_march_rounds(
            sh, bk, o_in, dirs, key_s, seed_s, march,
            block=blk, round_caps=caps or round_caps, interpret=interpret,
            diag=stage_diag, live_frac=live_frac,
            return_anchor=want_anchor, return_steps=want_steps,
            return_last=want_last, return_unres=want_unres,
            difficulty_repack=difficulty_repack,
        )
        d, hit, msdf = fine[:3]
        k = 3
        dam = lastf = steps = unres = None
        if want_anchor:
            dam = fine[k]; k += 1
        if want_steps:
            steps = fine[k]; k += 1
        if want_last:
            lastf, unres = fine[k], fine[k + 1]
        elif want_unres:
            unres = fine[k]
        return d, hit, msdf, dam, lastf, steps, unres

    # band probing needs the proxy argmin anchor — a dam payload in the
    # proxy stage's repack sorts the march-band mode doesn't pay for
    need_anchor = verify and (verify_band == "probe"
                              or verify_hits == "polish-all")
    d, hit, msdf, dam, lastf, steps, unres = fine_stage(
        shared_m, bank_m, key, init_depth, diag if with_diag else None,
        block_m, want_anchor=return_anchor or need_anchor,
        want_steps=return_steps, want_last=return_last, want_unres=verify,
    )
    # skip rays never marched: margin/anchor/last from the coarse level
    msdf = jnp.where(skip, margin, msdf)
    if dam is not None:
        dam = jnp.where(skip, anchor, dam)
    if lastf is not None:
        lastf = jnp.where(skip, margin, lastf)
    if unres is not None:
        unres = unres & ~skip

    if verify:
        # VERIFY stage: everything the caller consumes for non-skip rays
        # is a genuine full-decoder result after this (see the docstring
        # + ops/cert.py). Two modes:
        #   cert  — proxy hits certified by a 2-probe full-decoder
        #           bracket (secant depth); only band/unres/demoted/
        #           overflow rays reach the re-march scheduler.
        #   march — every proxy hit confirmed by a seeded march (the
        #           original formulation; the cert A/B + fallback).
        hitish = hit | unres
        seeded = hit & ~unres
        band = (~hitish) & (msdf < proxy_band)
        certified = None
        probe_band = verify_band == "probe"
        if verify_mode == "cert" or probe_band:
            from dist_renderer_tpu.ops.cert import certify_hits_batched

            # verify_mode="march" + verify_band="probe" is the HYBRID:
            # hits keep the seeded confirmation march (measured best),
            # band rays take the 3-probe parabola instead of the entry-
            # seeded re-march (~2 probe evals vs a full cap-budget march
            # residency). Passing an all-False seeded set makes every
            # proxy hit fall out of cert as "demoted" -> class-1 seeded
            # march at d - backoff, which IS the march-mode treatment.
            cert_hits = (seeded if verify_mode == "cert"
                         else jnp.zeros_like(seeded))
            # probe only FINE band rays: a skip-class ray's dam/msdf come
            # from the COARSE pyramid (stride-4/16 samples carried down in
            # ops/c2f.py), so its argmin anchor localizes the dip only to
            # a coarse cell — a ±band_w probe window there reads the wrong
            # part of the field (the measured p95 9.7e-2 probe-vs-march
            # margin error). Skip∩band rays keep the entry-seeded march.
            probeable = band & ~skip
            cert = certify_hits_batched(
                shared, bank, o_in, dirs, d, cert_hits, march,
                delta=proxy_backoff, block=block, interpret=interpret,
                # band-only probing (hybrid) fits a much tighter bucket:
                # band rays are ~3-6% of N (vs hits ~21%); overflow rays
                # fall back to the entry-seeded march either way
                bucket_frac=4 if verify_mode == "cert" else 8,
                band=probeable if probe_band else None,
                anchor=dam if probe_band else None, band_w=proxy_band_w,
                # the dip estimate carries up to ~2x the proxy's field
                # error (window mislocalization); promote anything within
                # backoff (~error p99) of zero so hit/miss verdicts come
                # from a genuine seeded march, not the estimate's tail
                promote_eps=proxy_backoff,
            )
            certified = cert.certified
            hit_over = cert.overflow & seeded
            band_over = cert.overflow & probeable
            demoted = seeded & ~certified & ~hit_over
            promoted = cert.promoted
            probed_miss = probeable & ~band_over & ~promoted if probe_band \
                else jnp.zeros_like(band)
            band_march = band if not probe_band else (
                band_over | (band & skip))
            # march fallbacks are all SEEDED (class 1, the cheap march
            # class — exactly verify_mode="march"'s treatment of hits):
            # demoted/overflow hits at d - backoff, promoted band rays at
            # the probe-estimated dip minus backoff. Unres rays (class 0,
            # continue from d) and band rays not probe-handled (class 0,
            # sphere entry) run an open-ended march.
            key2 = jnp.where(
                hit_over | demoted | promoted, 1,
                jnp.where(unres | band_march, 0, 2),
            ).astype(jnp.int32)
            seed2 = jnp.where(
                promoted, cert.band_tmin - proxy_backoff,
                jnp.where(
                    hit_over | demoted, d - proxy_backoff,
                    jnp.where(unres, d, jnp.nan),
                ),
            )
            if with_diag:
                diag["cert_frac"] = (
                    jnp.sum(certified) / jnp.maximum(jnp.sum(seeded), 1)
                )
                diag["cert_demoted"] = jnp.sum(demoted)
                diag["cert_promoted"] = jnp.sum(promoted)
                diag["cert_band_probed"] = jnp.sum(probed_miss)
        elif verify_hits == "polish":
            # band + unresolved rays only — the rays whose hit/miss verdict
            # the proxy cannot be trusted on. Confident proxy hits keep
            # their proxy depth/msdf; the caller's full-decoder finalize
            # (compose() Newton polish + demote, or finalize_hits_batched)
            # owns their genuineness.
            key2 = jnp.where(unres | band, 0, 2).astype(jnp.int32)
            seed2 = jnp.where(unres, d, jnp.nan)  # band rays: sphere entry
        elif verify_hits == "polish-all":
            # ZERO full-decoder marching for band rays too: fine-level
            # band rays become WEAK candidates seeded at the proxy dip
            # anchor (dam) — the finalize polishes them with the full
            # decoder and demotes non-crossers (stalled weak rays default
            # to MISS, unlike confident hits: a band ray is presumptively
            # a near-miss). Skip-class band rays still re-march: their
            # dam localizes the dip only to a COARSE cell (the same
            # mislocalization that rules out probe-band on skip rays
            # above). Motivation: the entry-seeded band re-march is the
            # EXPENSIVE verify term — 6.8 of 11.6 ms/frame at F=64 for
            # 3.4% of rays (residency is a block max; scattered rim rays
            # pin blocks), vs 4.8 for the seeded-hit confirmation
            # (scripts/diag_proxy.py r5 batch #2).
            band_fine = band & ~skip
            key2 = jnp.where(unres | (band & skip), 0, 2).astype(jnp.int32)
            seed2 = jnp.where(unres, d, jnp.nan)
        else:
            key2 = jnp.where(
                seeded, 1, jnp.where(hitish | band, 0, 2)
            ).astype(jnp.int32)
            seed2 = jnp.where(
                seeded, d - proxy_backoff,        # ~2-eval hit confirmation
                jnp.where(unres, d, jnp.nan),     # band rays: sphere entry
            )
        vdiag = {} if with_diag else None
        d2, hit2, msdf2, dam2, lastf2, steps2, unres2 = fine_stage(
            shared, bank, key2, seed2, vdiag, block,
            want_anchor=return_anchor, want_steps=return_steps,
            want_last=return_last, caps=verify_round_caps,
            qcaps=verify_gen_caps,
        )
        if with_diag:
            diag.update({f"verify_{k_}": v_ for k_, v_ in vdiag.items()})
            diag["verify_key"] = key2
        act2 = key2 != 2
        if certified is not None:
            # certified rays: full-decoder secant depth + bracket values
            # from the cert probes; probed-miss band rays: full-decoder
            # dip-minimum margins; neither touched the re-march
            d = jnp.where(act2, d2, jnp.where(certified, cert.depth, d))
            hit = jnp.where(act2, hit2, certified)
            # certified-hit msdf is the inside-probe value ALONE: mixing in
            # the proxy march's running min would retain proxy field error
            # on a ray whose every other output is full-decoder (ADVICE r4)
            msdf = jnp.where(
                act2, msdf2,
                jnp.where(
                    certified, cert.f_inside,
                    jnp.where(probed_miss, cert.band_margin, msdf),
                ),
            )
            if dam is not None and dam2 is not None:
                dam = jnp.where(
                    act2, dam2,
                    jnp.where(
                        certified, cert.depth,
                        jnp.where(probed_miss, cert.band_tmin, dam),
                    ),
                )
            if steps is not None and steps2 is not None:
                steps = steps + jnp.where(
                    act2, steps2,
                    jnp.where(certified | probed_miss, 3, 0),
                )
            if lastf is not None and lastf2 is not None:
                lastf = jnp.where(
                    act2, lastf2,
                    jnp.where(
                        certified, cert.f_inside,
                        jnp.where(probed_miss, cert.band_margin, lastf),
                    ),
                )
                unres = jnp.where(act2, unres2, False)
        else:
            d = jnp.where(act2, d2, d)
            # non-verified rays keep their incoming flag: in march mode
            # those are clear misses/skips (hit already False); in polish
            # mode they include the confident proxy hits, which must
            # survive to the caller's finalize
            hit = jnp.where(act2, hit2, hit)
            msdf = jnp.where(act2, msdf2, msdf)
            if dam is not None and dam2 is not None:
                dam = jnp.where(act2, dam2, dam)
            if steps is not None and steps2 is not None:
                steps = steps + jnp.where(act2, steps2, 0)
            if lastf is not None and lastf2 is not None:
                lastf = jnp.where(act2, lastf2, lastf)
                unres = jnp.where(act2, unres2, False)
            if verify_hits == "polish-all":
                # weak candidates ride the hit channel seeded at dam;
                # the trailing `weak` output tells the finalize which
                # flagged rays default to miss when Newton stalls
                weak = band_fine & ~hit
                d = jnp.where(weak, dam, d)
                hit = hit | weak

    out = (d, hit, msdf)
    if return_anchor:
        out = out + (dam,)
    if return_steps:
        out = out + (steps,)
    if return_last:
        out = out + (lastf, unres)
    if verify and verify_hits == "polish-all":
        # trailing weak-candidate mask (band rays riding the hit channel
        # seeded at dam) for finalize_hits_batched(weak=...)
        out = out + (weak,)
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
