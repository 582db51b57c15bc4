"""Color/texture decoder: c_phi(z_tex, x) -> RGB at surface points.

Reference analog: the color decoder consumed by
``core/sdfrenderer/renderer_color.py`` (``SDFRenderer_color``) — after the
tracer localizes surface points, a second latent-conditioned MLP predicts
per-point RGB for textured renders (SURVEY.md §2 'Color/texture renderer').

Same functional-core design as the SDF decoder: params pytree + pure
apply; shares the DeepSDF layer-dim rules so published texture decoders
convert through the same checkpoint path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import Params, _matmul


def make_color_config(
    latent_size: int = 256,
    hidden_dims=(512,) * 8,
    latent_in=(4,),
) -> DecoderConfig:
    """Color decoder config: identical trunk, 3-channel sigmoid output."""
    return DecoderConfig(
        latent_size=latent_size,
        hidden_dims=tuple(hidden_dims),
        latent_in=tuple(latent_in),
        final_tanh=False,
    )


def color_layer_dims(cfg: DecoderConfig):
    dims = list(cfg.layer_dims)
    d_in, _ = dims[-1]
    dims[-1] = (d_in, 3)
    return tuple(dims)


def init_color_params(key: jax.Array, cfg: DecoderConfig, dtype=jnp.float32) -> Params:
    layers = []
    for (d_in, d_out) in color_layer_dims(cfg):
        key, wk = jax.random.split(key)
        w = jax.random.normal(wk, (d_in, d_out), dtype) * jnp.sqrt(2.0 / d_in)
        layers.append({"w": w, "b": jnp.zeros((d_out,), dtype)})
    return {"layers": layers}


def color_apply(
    params: Params,
    latent: jax.Array,
    points: jax.Array,
    cfg: DecoderConfig,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """[..., 3] points -> [..., 3] RGB in [0, 1] (sigmoid output)."""
    shape = points.shape[:-1]
    x = points.reshape(-1, 3)
    n = x.shape[0]
    z = jnp.broadcast_to(latent.reshape(-1)[None, :], (n, latent.shape[-1]))
    inp = jnp.concatenate([z, x], axis=-1).astype(jnp.float32)
    h = inp
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if i in cfg.latent_in:
            h = jnp.concatenate([h, inp], axis=-1)
        h = _matmul(h, layer["w"], layer["b"], compute_dtype)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    rgb = jax.nn.sigmoid(h)
    return rgb.reshape(shape + (3,))
