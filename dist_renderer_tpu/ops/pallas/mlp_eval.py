"""Fused single-pass MLP point evaluation (dense grids, color lookups).

The march kernels evaluate the decoder INSIDE a marching loop; this is
the loop-free sibling for bulk point evaluation — mesh-extraction SDF
grids (eval/mesh.py::sdf_grid at 128^3-256^3 points), surface sampling,
color-decoder lookups. The XLA path materializes [N, 512] activations
in HBM per layer (bandwidth-bound); here weights live in VMEM and each
512-lane block runs the whole MLP to one [1, block] output.

Numerics match the march kernels exactly (march_body.mlp_apply: bf16
inputs/weights, fp32 accumulation, one rounding per activation) — the
iso-surface this produces is the same one the tracer marched, and the
~2e-3 bf16 noise is far below the 2/res grid spacing of any practical
extraction grid.

Reference analog: decode_sdf's chunked evaluation loop
(core/utils/decoder_utils.py [R], SURVEY.md §2 'Decoder I/O + chunked
eval'); the reference has no native equivalent.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import Params
from dist_renderer_tpu.models.folded import fold_latent
from dist_renderer_tpu.ops.pallas.fused_march import (
    _POS_BIG, _layer_layout, _round_up, pack_folded,
)
from dist_renderer_tpu.ops.pallas.march_body import mlp_apply


def _make_eval_kernel(layout, final_tanh: bool, out_rows: int = 1):
    def kernel(pts_ref, *refs):
        refs_all = refs[:-1]
        out_ref = refs[-1]
        w_refs, biases = [], []
        idx = 0
        for kind in layout:
            for _ in kind:
                w_refs.append(refs_all[idx])
                idx += 1
            biases.append(refs_all[idx][:, :])
            idx += 1
        p8 = pts_ref[:, :].astype(jnp.bfloat16)
        out = mlp_apply(layout, w_refs, biases, final_tanh, p8, out_rows)
        B = out.shape[1]
        out_ref[:, :] = jnp.concatenate(
            [out, jnp.zeros((8 - out_rows, B), jnp.float32)], axis=0
        )

    return kernel


def pallas_point_eval(
    packed,
    points: jax.Array,       # [N, 3]
    block: int = 512,
    interpret: Optional[bool] = None,
    out_rows: int = 1,
) -> jax.Array:
    """Evaluate a packed folded decoder at points -> [N] fp32 (out_rows
    == 1) or [N, out_rows] (multi-channel heads, e.g. RGB)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = points.shape[0]
    n_pad = _round_up(max(n, block), block)
    pts = jnp.zeros((8, n_pad), jnp.float32)
    pts = pts.at[0:3, :n].set(points.T)

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
    out = pl.pallas_call(
        _make_eval_kernel(layout, packed.final_tanh, out_rows),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *specs,
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(pts, *weights)
    if out_rows == 1:
        return out[0, :n]
    return out[0:out_rows, :n].T


def _make_banked_kernel(shared, precise_x: bool):
    """Bank-aware eval kernel: per-block frame id (scalar prefetch) selects
    the bias column out of the [total, FRAME_TILE] bias-bank tile, exactly
    like the multi-frame march kernel (batched_march._make_multi_kernel) —
    but loop-free: one mlp_apply per block."""
    from dist_renderer_tpu.ops.pallas.batched_march import (
        FRAME_TILE, _kinds, _select_bank_biases,
    )

    kinds = _kinds(shared)
    offsets = shared.offsets

    def kernel(frame_ids_ref, pts_ref, bias_ref, *refs):
        w_refs = list(refs[:-1])
        out_ref = refs[-1]
        i = pl.program_id(0)
        lane = frame_ids_ref[i] % FRAME_TILE
        pts = pts_ref[:, :]                    # [8, B] fp32
        act = pts[3:4, :]                      # row 3 = active flag
        B = pts.shape[1]

        # dead-block fast path (hit-sorted buckets leave a dead suffix):
        # emit +inf and skip the bias select + dots entirely
        out_ref[:, :] = jnp.full((8, B), _POS_BIG, jnp.float32)

        @pl.when(jnp.max(act) > 0.5)
        def _eval_block():
            biases = _select_bank_biases(bias_ref, offsets, lane)
            p = jnp.concatenate(
                [pts[0:3, :], jnp.zeros((5, B), jnp.float32)], axis=0
            )
            p8 = p.astype(jnp.bfloat16)
            p8_lo = None
            if precise_x:
                # bf16x2 position split: kills the ~4e-3 position
                # quantization (march_body.mlp_apply docstring) — the
                # cert probes are spaced ~the bf16 quantum apart
                p8_lo = (p - p8.astype(jnp.float32)).astype(jnp.bfloat16)
            out = mlp_apply(kinds, w_refs, biases, shared.final_tanh, p8,
                            1, p8_lo=p8_lo)
            out_ref[:, :] = jnp.concatenate(
                [out, jnp.zeros((7, B), jnp.float32)], axis=0
            )

    return kernel


def pallas_point_eval_banked(
    shared,                      # batched_march.SharedDecoder (FULL decoder)
    bias_bank: jax.Array,        # [total, F_pad] from fold_bias_bank
    frame_of_block: jax.Array,   # [n_blocks] int32 — each block frame-pure
    points: jax.Array,           # [n, 3] fp32, frame-major, n = blocks*block
    active: jax.Array,           # [n] bool — dead blocks are skipped
    block: int = 512,
    interpret: Optional[bool] = None,
    precise_x: bool = True,
) -> jax.Array:
    """Multi-frame point evaluation against the shared-weights + bias-bank
    decoder packing: [n] fp32 SDF values (+POS_BIG on lanes of dead
    blocks). The proxy-verify certification probes use this — ~1 march
    block-step of cost per 512 points instead of a seeded march round
    (see ops/cert.py)."""
    from jax.experimental.pallas import tpu as _pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = points.shape[0]
    if n % block:
        raise ValueError(f"point count {n} not a multiple of block {block}")
    n_blocks = n // block

    pts = jnp.zeros((8, n), jnp.float32)
    pts = pts.at[0:3, :].set(points.T)
    pts = pts.at[3, :].set(active.astype(jnp.float32))

    weights = []
    for wh, wx in zip(shared.whT, shared.wxT):
        if wh is not None:
            weights.append(wh)
        if wx is not None:
            weights.append(wx)

    from dist_renderer_tpu.ops.pallas.batched_march import FRAME_TILE

    grid_spec = _pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i, fb: (0, i),
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
        _make_banked_kernel(shared, precise_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )(frame_of_block.astype(jnp.int32), pts, bias_bank, *weights)
    return out[0]


def make_pallas_point_fn(
    params: Params,
    latent: jax.Array,
    cfg: DecoderConfig = DecoderConfig(),
    block: int = 512,
    interpret: Optional[bool] = None,
):
    """(points [..., 3]) -> sdf [...] through the fused eval kernel.
    Drop-in for models.folded.make_point_fn's output; packing happens at
    trace time (stages into the caller's jit as constants)."""

    def point_fn(points):
        packed = pack_folded(fold_latent(params, latent, cfg), cfg)
        shape = points.shape[:-1]
        return pallas_point_eval(
            packed, points.reshape(-1, 3), block, interpret
        ).reshape(shape)

    return point_fn


def make_pallas_color_fn(
    params: Params,
    latent: jax.Array,
    cfg: DecoderConfig,
    block: int = 512,
    interpret: Optional[bool] = None,
):
    """(points [..., 3]) -> RGB [..., 3] in [0, 1] through the fused eval
    kernel (sigmoid applied outside) — forward-only drop-in for
    models.color_decoder.color_apply with a bound latent. For
    DIFFERENTIABLE color (photometric training) use
    recompute.make_color_vjp instead."""

    def color_fn(points):
        packed = pack_folded(fold_latent(params, latent, cfg), cfg)
        shape = points.shape[:-1]
        logits = pallas_point_eval(
            packed, points.reshape(-1, 3), block, interpret, out_rows=3
        )
        return jax.nn.sigmoid(logits).reshape(shape + (3,))

    return color_fn
