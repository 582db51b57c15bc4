"""Perf-layer correctness: latent-folded decoder == plain decoder;
compaction tracer == masked tracer; coarse-to-fine == direct trace
(SURVEY.md §7 steps 8 and hard parts 1/5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, MarchConfig, RenderConfig
from dist_renderer_tpu.models.analytic import sphere_sdf, torus_sdf
from dist_renderer_tpu.models.decoder import decoder_apply, init_decoder_params
from dist_renderer_tpu.models.folded import fold_latent, folded_apply, make_point_fn
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import render
from dist_renderer_tpu.ops.tracer import sphere_trace, sphere_trace_compact

MARCH = MarchConfig(max_steps=64, convergence_eps=1e-5)


def test_folded_matches_plain_decoder():
    cfg = DecoderConfig()  # full arch incl. skip at 4
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (cfg.latent_size,)) * 0.2
    pts = jax.random.normal(jax.random.PRNGKey(2), (64, 3)) * 0.4
    ref = decoder_apply(params, z, pts, cfg)
    got = folded_apply(fold_latent(params, z, cfg), pts, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_folded_grad_wrt_latent_matches():
    cfg = DecoderConfig(hidden_dims=(32,) * 6, latent_size=8, latent_in=(3,))
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (10, 3)) * 0.4

    def f_plain(z):
        return jnp.sum(decoder_apply(params, z, pts, cfg))

    def f_folded(z):
        return jnp.sum(folded_apply(fold_latent(params, z, cfg), pts, cfg))

    z = jax.random.normal(jax.random.PRNGKey(1), (8,)) * 0.2
    g1 = jax.grad(f_plain)(z)
    g2 = jax.grad(f_folded)(z)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


@pytest.mark.parametrize("shape_fn", [sphere_sdf(0.5), torus_sdf(0.4, 0.15)])
def test_compact_matches_masked_tracer(shape_fn):
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(32, 32))
    o, v = pixel_rays(cam, 32, 32)
    f = lambda p: shape_fn(None, p)
    ref = sphere_trace(f, o, v, MARCH)
    got = sphere_trace_compact(f, o, v, MARCH, bucket_frac=4, inner_steps=8)
    assert (np.asarray(got.hit) == np.asarray(ref.hit)).all()
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.depth)[hit], np.asarray(ref.depth)[hit], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.min_sdf), np.asarray(ref.min_sdf), atol=1e-4
    )


def test_compact_handles_seed():
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(16, 16))
    o, v = pixel_rays(cam, 16, 16)
    f = lambda p: sphere_sdf(0.5)(None, p)
    ref = sphere_trace(f, o, v, MARCH)
    # seed at the true depth minus 0.02: converges in very few steps
    seed = jnp.where(ref.hit, ref.depth - 0.02, jnp.nan)
    got = sphere_trace_compact(f, o, v, MARCH, init_depth=seed)
    hit = np.asarray(ref.hit)
    assert (np.asarray(got.hit) == hit).all()
    np.testing.assert_allclose(
        np.asarray(got.depth)[hit], np.asarray(ref.depth)[hit], atol=1e-4
    )
    assert int(got.steps_used) <= int(ref.steps_used)


@pytest.mark.parametrize("use_compaction", [False, True])
def test_c2f_render_matches_direct(use_compaction):
    img = 32
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(img, img))
    f = lambda z, p: torus_sdf(0.4, 0.15)(None, p)
    z = jnp.zeros((1,))

    base = RenderConfig(img_h=img, img_w=img, march=MARCH)
    ref = render(f, z, cam, base)

    import dataclasses
    m = dataclasses.replace(
        MARCH, coarse_to_fine=True, use_compaction=use_compaction
    )
    cfg = dataclasses.replace(base, march=m)
    got = render(f, z, cam, cfg)

    r_hit = np.asarray(ref.mask)
    g_hit = np.asarray(got.mask)
    # c2f must never LOSE a hit; it may legitimately GAIN rim hits that the
    # aggressive direct march overstepped (seeded rays start at the surface)
    assert (r_hit & ~g_hit).sum() == 0
    assert (g_hit & ~r_hit).mean() < 0.05
    both = r_hit & g_hit
    err = np.abs(np.asarray(got.depth) - np.asarray(ref.depth))[both]
    assert err.max() < 2e-3
    assert err.mean() < 1e-4


def test_point_fn_bf16_close_to_fp32():
    cfg = DecoderConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (cfg.latent_size,)) * 0.2
    pts = jax.random.normal(jax.random.PRNGKey(2), (64, 3)) * 0.4
    ref = decoder_apply(params, z, pts, cfg)
    got = make_point_fn(params, z, cfg, jnp.bfloat16)(pts)
    # bf16 hidden matmuls: tolerance is loose; the fp32 last-step eval
    # re-anchors depth so this only gates march robustness
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 5e-2
