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
    _layer_layout, _round_up, pack_folded,
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
