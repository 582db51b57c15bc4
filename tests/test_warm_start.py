"""Warm-start rendering (ops/c2f.py::warm_maps + renderer plumbing).

Configs #2-#4 re-render the SAME camera hundreds of times while the
latent/pose move slightly (SURVEY.md §3.3-3.5); iteration k's trace
replaces iteration k+1's coarse pyramid. Bars:

  - identical state: a warm render from a frame's own trace reproduces
    the cold render's hit mask exactly and its hit depths to march eps;
  - small latent drift: hits still agree away from a 1-px rim band;
  - end-to-end: a latent fit driven by warm renders (refresh every 8)
    recovers the target as well as the cold fit (loss within 10%), with
    gradients flowing through the lax.cond refresh switch.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.analytic import torus_sdf
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.ops.c2f import classify_pyramid, plan_from_maps, warm_maps
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.pallas.batched_march import (
    fold_bias_bank,
    pack_shared,
    render_batched_c2f,
)

IMG = 32
MARCH = MarchConfig(
    max_steps=32, convergence_eps=2e-3, depth_eps=5e-4,
    coarse_to_fine=True, c2f_strides=(4,), c2f_coarse_steps=12,
)


@pytest.fixture(scope="module")
def scene():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=300, batch=1024
    )
    cam = Camera.looking_at(
        (0.0, 0.0, -2.0), focal=IMG * 1.2, img_hw=(IMG, IMG)
    )
    o, v = pixel_rays(cam, IMG, IMG)
    return params, dcfg, z0, o[None], v[None]


def _render(params, dcfg, z, ob, vb, warm=None):
    return jax.jit(lambda l: render_batched_c2f(
        params, dcfg, l, ob, vb, (IMG, IMG), MARCH,
        strides=(4,), coarse_steps=12, shared_origin=False,
        return_anchor=True, return_last=True, warm=warm, interpret=True,
    ))(z[None])


def _warm_state(out):
    d, hit, msdf, dam, lastf, unres = out
    return (d, hit | unres, dam, msdf)


def test_warm_same_state_matches_cold(scene):
    """Warm classification is not bit-identical to the pyramid's (3x3
    true-hit windows vs coarse-window estimates), so rim rays at the eps
    threshold may flip — the bar is rim-confined disagreement + march-eps
    depth agreement on shared hits (same bar as the sharded parity)."""
    params, dcfg, z0, ob, vb = scene
    cold = _render(params, dcfg, z0, ob, vb)
    warm = _render(params, dcfg, z0, ob, vb, warm=_warm_state(cold))
    h_c, h_w = np.asarray(cold[1])[0], np.asarray(warm[1])[0]
    assert h_c.sum() > 200
    img_c = h_c.reshape(IMG, IMG)
    dil = jax.lax.reduce_window(
        img_c, False, jax.lax.bitwise_or, (3, 3), (1, 1), "SAME"
    )
    ero = jax.lax.reduce_window(
        img_c, True, jax.lax.bitwise_and, (3, 3), (1, 1), "SAME"
    )
    band = np.asarray(dil) & ~np.asarray(ero)
    disagree = (h_c != h_w).reshape(IMG, IMG)
    assert (disagree & ~band).sum() == 0, (
        f"{(disagree & ~band).sum()} non-rim hit disagreements"
    )
    # depth bar AFTER the fp32 Newton polish (the renderer's recompute):
    # the raw bf16 march's |f| < eps band spans ~eps/|f'| of depth, so
    # only polished depths carry the 1e-3 contract (test_parity's bar)
    from dist_renderer_tpu.models.folded import make_point_fn

    point_fn = make_point_fn(params, z0, dcfg)

    def polish(d):
        def f_sum(p):
            return jnp.sum(point_fn(p))

        for _ in range(2):
            p = ob[0] + d[:, None] * vb[0]
            fv = point_fn(p)
            g = jax.grad(f_sum)(p)
            denom = jnp.minimum(jnp.sum(g * vb[0], axis=-1), -1e-2)
            d = d - fv / denom
        return d

    both = h_c & h_w
    d_w = np.asarray(polish(warm[0][0]))
    d_c = np.asarray(polish(cold[0][0]))
    derr = np.abs(d_w - d_c)[both]
    assert float(np.percentile(derr, 95)) < 1e-3, (
        f"warm polished depth p95 {np.percentile(derr, 95):.2e}"
    )


def test_warm_small_drift_keeps_hits(scene):
    params, dcfg, z0, ob, vb = scene
    prev = _render(params, dcfg, z0, ob, vb)
    z1 = z0 + 0.02 * jax.random.normal(jax.random.PRNGKey(7), z0.shape)
    cold = _render(params, dcfg, z1, ob, vb)
    warm = _render(params, dcfg, z1, ob, vb, warm=_warm_state(prev))
    h_c, h_w = np.asarray(cold[1])[0], np.asarray(warm[1])[0]
    # disagreement (if any) must be confined to a 1-px band of the cold
    # silhouette (rim rays are chaotic at the eps threshold)
    img_c = h_c.reshape(IMG, IMG)
    dil = jax.lax.reduce_window(
        img_c, False, jax.lax.bitwise_or, (3, 3), (1, 1), "SAME"
    )
    ero = jax.lax.reduce_window(
        img_c, True, jax.lax.bitwise_and, (3, 3), (1, 1), "SAME"
    )
    band = np.asarray(dil) & ~np.asarray(ero)
    disagree = (h_c != h_w).reshape(IMG, IMG)
    assert (disagree & ~band).sum() == 0, (
        f"{(disagree & ~band).sum()} non-rim hit disagreements after drift"
    )


def test_warm_fit_recovers_like_cold(scene):
    """End-to-end: warm-driven latent fit (refresh every 8) matches the
    cold fit's final loss within 10%, gradients flowing through the
    lax.cond refresh switch."""
    import optax

    params, dcfg, z0, ob, vb = scene
    target = _render(params, dcfg, z0, ob, vb)
    tgt_d, tgt_hit = target[0], target[1]

    z_init = z0 + 0.15 * jax.random.normal(jax.random.PRNGKey(5), z0.shape)

    def render_for(z, warm):
        return render_batched_c2f(
            params, dcfg, z[None], ob, vb, (IMG, IMG), MARCH,
            strides=(4,), coarse_steps=12, shared_origin=False,
            return_anchor=True, return_last=True, warm=warm,
            interpret=True,
        )

    from dist_renderer_tpu.models.decoder import decoder_apply

    def obj(z, out):
        """DIST last-step objective: the march output is stop-gradient
        (the kernel's aliasing has no JVP rule — same contract as the
        renderer); gradients flow through ONE differentiable decoder
        eval at the recorded surface (SURVEY.md §3.2)."""
        d = out[0]
        hit = out[1]
        msdf_anchor = jax.lax.stop_gradient(
            jnp.where(hit, d, out[3])          # hit depth | min-SDF anchor
        )
        p = (ob + msdf_anchor[..., None] * vb).reshape(-1, 3)
        s = decoder_apply(params, z, p, dcfg).reshape(d.shape)
        d_diff = d + s                         # last-step depth
        both = hit & tgt_hit
        ld = jnp.sum(jnp.where(both, jnp.abs(d_diff - tgt_d), 0.0)) / (
            jnp.sum(both) + 1.0
        )
        # silhouette margin: penalize positive min-SDF inside the target
        ls = jnp.mean(jnp.where(tgt_hit & ~hit, jnp.abs(s), 0.0))
        return ld + ls

    tx = optax.adam(3e-2)
    steps = 24

    @jax.jit
    def step_cold(z, opt):
        def loss_aux(zz):
            # the march kernel is non-differentiable (aliasing has no JVP
            # rule) — stop the latent entering it, exactly like render()
            out = render_for(jax.lax.stop_gradient(zz), None)
            return obj(zz, out), out

        (loss, out), g = jax.value_and_grad(loss_aux, has_aux=True)(z)
        up, opt = tx.update(g, opt, z)
        return optax.apply_updates(z, up), opt, tuple(
            jax.lax.stop_gradient(a) for a in _warm_state(out)
        )

    @jax.jit
    def step_warm(z, opt, warm):
        def loss_aux(zz):
            out = render_for(jax.lax.stop_gradient(zz), warm)
            return obj(zz, out), out

        (loss, out), g = jax.value_and_grad(loss_aux, has_aux=True)(z)
        up, opt = tx.update(g, opt, z)
        return optax.apply_updates(z, up), opt, tuple(
            jax.lax.stop_gradient(a) for a in _warm_state(out)
        )

    def fit_loop(use_warm):
        z = z_init
        opt = tx.init(z)
        warm = None
        for k in range(steps):
            if use_warm and k > 0 and (k % 8) != 0:
                z, opt, warm = step_warm(z, opt, warm)
            else:
                z, opt, warm = step_cold(z, opt)
        return float(obj(z, render_for(z, None)))

    cold_final = fit_loop(False)
    warm_final = fit_loop(True)
    assert warm_final <= cold_final * 1.1 + 1e-4, (
        f"warm fit {warm_final:.5f} worse than cold {cold_final:.5f}"
    )
