"""Multi-shape DeepSDF training + color renderer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, MarchConfig, RenderConfig
from dist_renderer_tpu.models.analytic import sphere_sdf, torus_sdf
from dist_renderer_tpu.models.color_decoder import (
    color_apply, init_color_params, make_color_config,
)
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.train_deepsdf import (
    train_deepsdf_analytic, train_deepsdf_samples,
)
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import SDFRenderer, SDFRendererColor, render_color_rays


def test_train_deepsdf_two_shapes_distinguishes_latents():
    dcfg = DecoderConfig(latent_size=4, hidden_dims=(24,) * 3, latent_in=())
    shapes = [
        lambda p: sphere_sdf(0.4)(None, p),
        lambda p: sphere_sdf(0.6)(None, p),
    ]
    params, latents, losses = train_deepsdf_analytic(
        shapes, dcfg, steps=300, batch_shapes=2, points_per_shape=512,
        lr=2e-3, latent_lr=5e-3,
    )
    assert float(losses[-50:].mean()) < float(losses[:50].mean())
    # each latent reconstructs its own radius at the origin-ray probe
    p = jnp.array([[0.5, 0.0, 0.0]])
    s0 = float(decoder_apply(params, latents[0], p, dcfg)[0])
    s1 = float(decoder_apply(params, latents[1], p, dcfg)[0])
    # shape0 (r=0.4): point outside => sdf > 0; shape1 (r=0.6): inside => < 0
    assert s0 > s1


def test_train_deepsdf_from_samples():
    dcfg = DecoderConfig(latent_size=4, hidden_dims=(24,) * 3, latent_in=())
    rng = np.random.RandomState(0)

    def sample_shape(r):
        pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
        sdf = np.linalg.norm(pts, axis=1) - r
        return np.concatenate([pts, sdf[:, None]], axis=1)

    samples = [sample_shape(0.4), sample_shape(0.6)]
    params, latents, losses = train_deepsdf_samples(
        samples, dcfg, steps=200, batch_shapes=2, points_per_shape=256,
        lr=2e-3, latent_lr=5e-3,
    )
    assert float(losses[-20:].mean()) < float(losses[:20].mean())


def test_color_render_path():
    ccfg = make_color_config(latent_size=4, hidden_dims=(16,) * 3, latent_in=())
    cparams = init_color_params(jax.random.PRNGKey(0), ccfg)
    color_fn = lambda zc, p: color_apply(cparams, zc, p, ccfg)

    from dist_renderer_tpu.models.analytic import latent_sphere_sdf

    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(16, 16))
    o, v = pixel_rays(cam, 16, 16)
    cfg = RenderConfig(img_h=16, img_w=16, march=MarchConfig(max_steps=40))
    out, rgb = render_color_rays(
        latent_sphere_sdf(), color_fn,
        jnp.array([0.5]), jnp.zeros(4), o, v, cfg,
    )
    m = np.asarray(out.mask)
    rgb = np.asarray(rgb)
    assert rgb.shape == (256, 3)
    assert (rgb[~m] == 0).all()
    assert rgb[m].min() >= 0.0 and rgb[m].max() <= 1.0
    assert rgb[m].std() > 0  # spatially varying texture

    # OO wrapper mirrors the reference SDFRenderer_color API
    r = SDFRenderer(None, cam.K, img_hw=(16, 16), sdf_fn=latent_sphere_sdf(), cfg=cfg)
    rc = SDFRendererColor(r, color_fn)
    out2, img = rc.render_color(jnp.array([0.5]), jnp.zeros(4), cam.R, cam.T)
    assert img.shape == (16, 16, 3)


def test_color_gradients_flow_to_geometry():
    """Photometric-style loss on rendered colors must reach the shape
    latent through the surface points (SURVEY.md §3.4)."""
    ccfg = make_color_config(latent_size=4, hidden_dims=(16,) * 2, latent_in=())
    cparams = init_color_params(jax.random.PRNGKey(0), ccfg)
    color_fn = lambda zc, p: color_apply(cparams, zc, p, ccfg)
    from dist_renderer_tpu.models.analytic import latent_sphere_sdf

    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(8, 8))
    o, v = pixel_rays(cam, 8, 8)
    cfg = RenderConfig(img_h=8, img_w=8, march=MarchConfig(max_steps=40))

    def loss(r):
        out, rgb = render_color_rays(
            latent_sphere_sdf(), color_fn, jnp.array([r]), jnp.zeros(4),
            o, v, cfg,
        )
        return jnp.sum(rgb)

    g = jax.grad(loss)(0.5)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
