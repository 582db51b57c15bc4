"""Fit a DeepSDF decoder to an analytic SDF — a self-contained stand-in for
the reference's pretrained DeepSDF experiment dirs (SURVEY.md §2 'Datasets':
pretrained decoders are external downloads; this environment has no network,
so demos/benchmarks train a decoder to a known shape instead).

DeepSDF-style training (Park et al. CVPR 2019): L1 on clamped SDF values,
points sampled uniformly in the bounding cube + densely near the surface.
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import (
    Params,
    decoder_apply,
    init_decoder_params,
)


def sample_training_points(
    key: jax.Array,
    sdf_fn: Callable[[jax.Array], jax.Array],
    n: int,
    surface_frac: float = 0.5,
    noise: float = 0.02,
) -> jax.Array:
    """Uniform cube samples + near-surface samples (projected via the SDF
    gradient, then jittered) — mirrors DeepSDF's sampling emphasis."""
    k1, k2, k3 = jax.random.split(key, 3)
    n_surf = int(n * surface_frac)
    n_unif = n - n_surf
    unif = jax.random.uniform(k1, (n_unif, 3), minval=-1.0, maxval=1.0)

    # project random points onto the surface with a few SDF-gradient steps
    p = jax.random.uniform(k2, (n_surf, 3), minval=-0.8, maxval=0.8)
    g_fn = jax.grad(lambda q: jnp.sum(sdf_fn(q)))
    for _ in range(4):
        s = sdf_fn(p)
        g = g_fn(p)
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
        p = p - s[:, None] * g
    p = p + noise * jax.random.normal(k3, p.shape)
    return jnp.concatenate([unif, p], axis=0)


def fit_decoder_to_sdf(
    target_sdf: Callable[[jax.Array], jax.Array],
    dcfg: DecoderConfig = DecoderConfig(),
    latent: Optional[jax.Array] = None,
    steps: int = 2000,
    batch: int = 8192,
    lr: float = 5e-4,
    key: Optional[jax.Array] = None,
    clamp: float = 0.1,
) -> Tuple[Params, jax.Array]:
    """Train decoder weights so f(z0, x) ~= clamp(target_sdf(x)).

    Returns (params, latent). The fitted decoder is a *real* neural SDF:
    sphere tracing against it exhibits the reference workload's live-set
    shrinkage, unlike a random-init decoder whose tanh output is not a
    distance field."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_init, k_lat, key = jax.random.split(key, 3)
    params = init_decoder_params(k_init, dcfg)
    z0 = (
        latent
        if latent is not None
        else 0.1 * jax.random.normal(k_lat, (dcfg.latent_size,))
    )

    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(params, pts, tgt):
        # bf16 compute: on TPU the default "fp32" matmul is a single bf16
        # pass anyway, and explicit bf16 inputs avoid a remote-compiler
        # crash on fp32-input dots (docs/PERFORMANCE.md infra notes)
        pred = decoder_apply(params, z0, pts, dcfg, jnp.bfloat16)
        # clamp the TARGET only (DeepSDF's +-0.1 truncation); clamping the
        # prediction would zero the gradient wherever |pred| > clamp, which
        # is everywhere at a saturated-tanh init.
        return jnp.mean(jnp.abs(pred - jnp.clip(tgt, -clamp, clamp)))

    def step(carry, _):
        params, opt, k = carry
        k, kb = jax.random.split(k)
        pts = sample_training_points(kb, target_sdf, batch)
        tgt = target_sdf(pts)
        l, g = jax.value_and_grad(loss_fn)(params, pts, tgt)
        upd, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, upd), opt, k), l

    # whole training loop in ONE compiled scan: a host-side Python loop
    # would pay per-step dispatch latency (catastrophic over the TPU tunnel)
    @jax.jit
    def train(params, opt, key):
        (params, opt, _), losses = jax.lax.scan(
            step, (params, opt, key), None, length=steps
        )
        return params, losses

    params, losses = train(params, opt, key)
    return params, z0


def save_params_npz(path: str, params: Params, latent: jax.Array) -> None:
    flat = {}
    for i, lyr in enumerate(params["layers"]):
        flat[f"w{i}"] = np.asarray(lyr["w"])
        flat[f"b{i}"] = np.asarray(lyr["b"])
    flat["latent"] = np.asarray(latent)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Tuple[Params, jax.Array]:
    data = np.load(path)
    layers = []
    i = 0
    while f"w{i}" in data:
        layers.append({"w": jnp.asarray(data[f"w{i}"]), "b": jnp.asarray(data[f"b{i}"])})
        i += 1
    return {"layers": layers}, jnp.asarray(data["latent"])


def get_or_fit_cached(
    cache_path: str,
    target_sdf: Callable[[jax.Array], jax.Array],
    dcfg: DecoderConfig = DecoderConfig(),
    steps: int = 2000,
    **kw,
) -> Tuple[Params, jax.Array]:
    """Load a fitted decoder from cache or fit and cache it."""
    if os.path.exists(cache_path):
        try:
            return load_params_npz(cache_path)
        except Exception as e:
            warnings.warn(
                f"decoder cache {cache_path} unreadable ({e!r}); refitting"
            )
    params, z0 = fit_decoder_to_sdf(target_sdf, dcfg, steps=steps, **kw)
    try:
        save_params_npz(cache_path, params, z0)
    except OSError as e:
        warnings.warn(f"could not write decoder cache {cache_path}: {e!r}")
    return params, z0
