"""Multi-shape DeepSDF training: joint optimization of decoder weights and
a per-shape latent table (Park et al. CVPR 2019 auto-decoder).

The reference CONSUMES decoders trained by the DeepSDF codebase
(SURVEY.md §2 'Decoder I/O'); a complete replacement framework must also
PRODUCE them. This trainer implements the auto-decoder objective

    L = sum_s |clamp(f(z_s, x)) - clamp(sdf_s(x))| + sigma^-2 ||z_s||^2

with the whole loop in lax.scan (one device dispatch), shapes batched per
step, and orbax checkpointing via models.checkpoint.

Works from either analytic SDF oracles or point/sdf sample arrays (the
DeepSDF .npz sample format: pos/neg arrays of [x, y, z, sdf])."""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import (
    Params, decoder_apply, init_decoder_params,
)
from dist_renderer_tpu.models.pretrain import sample_training_points


def train_deepsdf_analytic(
    shape_fns: Sequence[Callable[[jax.Array], jax.Array]],
    dcfg: DecoderConfig = DecoderConfig(),
    steps: int = 3000,
    batch_shapes: int = 4,
    points_per_shape: int = 4096,
    lr: float = 5e-4,
    latent_lr: float = 1e-3,
    latent_reg: float = 1e-4,
    clamp: float = 0.1,
    key: Optional[jax.Array] = None,
) -> Tuple[Params, jax.Array, jax.Array]:
    """Train decoder + latent table against analytic SDF oracles.

    Returns (params, latents [S, L], loss_history [steps])."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n_shapes = len(shape_fns)
    batch_shapes = min(batch_shapes, n_shapes)
    k_p, k_z, key = jax.random.split(key, 3)
    params = init_decoder_params(k_p, dcfg)
    latents = 0.01 * jax.random.normal(k_z, (n_shapes, dcfg.latent_size))

    tx = optax.multi_transform(
        {"params": optax.adam(lr), "latents": optax.adam(latent_lr)},
        {"params": "params", "latents": "latents"},
    )
    state = {"params": params, "latents": latents}
    opt = tx.init(state)

    def shape_sdf(idx, pts):
        """Evaluate shape #idx via lax.switch (static set of oracles)."""
        return jax.lax.switch(idx, [lambda p, f=f: f(p) for f in shape_fns], pts)

    def loss_fn(state, shape_idx, pts):
        # pts: [B, P, 3]; shape_idx: [B]
        def one(idx, p):
            z = state["latents"][idx]
            pred = decoder_apply(state["params"], z, p, dcfg, jnp.bfloat16)
            tgt = shape_sdf(idx, p)
            l = jnp.mean(jnp.abs(pred - jnp.clip(tgt, -clamp, clamp)))
            return l + latent_reg * jnp.sum(z**2)

        return jnp.mean(jax.vmap(one)(shape_idx, pts))

    def step(carry, _):
        state, opt, k = carry
        k, k_idx, k_pts = jax.random.split(k, 3)
        shape_idx = jax.random.randint(k_idx, (batch_shapes,), 0, n_shapes)
        pts_keys = jax.random.split(k_pts, batch_shapes)
        pts = jax.vmap(
            lambda kk, idx: sample_training_points(
                kk, lambda p: shape_sdf(idx, p), points_per_shape
            )
        )(pts_keys, shape_idx)
        l, g = jax.value_and_grad(loss_fn)(state, shape_idx, pts)
        upd, opt = tx.update(g, opt, state)
        state = optax.apply_updates(state, upd)
        return (state, opt, k), l

    @jax.jit
    def train(state, opt, key):
        (state, opt, _), losses = jax.lax.scan(
            step, (state, opt, key), None, length=steps
        )
        return state, losses

    state, losses = train(state, opt, key)
    return state["params"], state["latents"], losses


def train_deepsdf_samples(
    samples: Sequence[np.ndarray],      # per shape: [N, 4] = x, y, z, sdf
    dcfg: DecoderConfig = DecoderConfig(),
    steps: int = 3000,
    batch_shapes: int = 4,
    points_per_shape: int = 4096,
    lr: float = 5e-4,
    latent_lr: float = 1e-3,
    latent_reg: float = 1e-4,
    clamp: float = 0.1,
    key: Optional[jax.Array] = None,
) -> Tuple[Params, jax.Array, jax.Array]:
    """Train from precomputed SDF samples (the DeepSDF data format: the
    SdfSamples npz pos/neg arrays, concatenated to [N, 4] per shape).
    Shapes are padded to a common sample count for static batching."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n_shapes = len(samples)
    batch_shapes = min(batch_shapes, n_shapes)
    n_max = max(s.shape[0] for s in samples)
    bank = np.zeros((n_shapes, n_max, 4), np.float32)
    counts = np.zeros((n_shapes,), np.int32)
    for i, s in enumerate(samples):
        bank[i, : s.shape[0]] = s
        counts[i] = s.shape[0]
    bank = jnp.asarray(bank)
    counts = jnp.asarray(counts)

    k_p, k_z, key = jax.random.split(key, 3)
    params = init_decoder_params(k_p, dcfg)
    latents = 0.01 * jax.random.normal(k_z, (n_shapes, dcfg.latent_size))

    tx = optax.multi_transform(
        {"params": optax.adam(lr), "latents": optax.adam(latent_lr)},
        {"params": "params", "latents": "latents"},
    )
    state = {"params": params, "latents": latents}
    opt = tx.init(state)

    def loss_fn(state, shape_idx, point_idx):
        def one(sidx, pidx):
            rows = bank[sidx][pidx]          # [P, 4]
            z = state["latents"][sidx]
            pred = decoder_apply(state["params"], z, rows[:, :3], dcfg, jnp.bfloat16)
            tgt = rows[:, 3]
            l = jnp.mean(
                jnp.abs(
                    jnp.clip(pred, -clamp, clamp) - jnp.clip(tgt, -clamp, clamp)
                )
            )
            return l + latent_reg * jnp.sum(z**2)

        return jnp.mean(jax.vmap(one)(shape_idx, point_idx))

    def step(carry, _):
        state, opt, k = carry
        k, k_s, k_i = jax.random.split(k, 3)
        shape_idx = jax.random.randint(k_s, (batch_shapes,), 0, n_shapes)
        point_idx = jax.random.randint(
            k_i, (batch_shapes, points_per_shape), 0, 1 << 30
        ) % counts[shape_idx][:, None]
        l, g = jax.value_and_grad(loss_fn)(state, shape_idx, point_idx)
        upd, opt = tx.update(g, opt, state)
        state = optax.apply_updates(state, upd)
        return (state, opt, k), l

    @jax.jit
    def train(state, opt, key):
        (state, opt, _), losses = jax.lax.scan(
            step, (state, opt, key), None, length=steps
        )
        return state, losses

    state, losses = train(state, opt, key)
    return state["params"], state["latents"], losses
