"""Hit-compacted differentiable recompute (GradConfig.compact_frac).

The compacted path must agree with the full-width recompute on depth and
normals (exactly the same formulas on gathered values), agree on miss-ray
margins to bf16 tolerance (the cheap margin eval), and produce matching
gradients for latent and pose. Also: the lax.cond fallback must engage when
hits overflow the bucket.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dist_renderer_tpu.config import (
    DecoderConfig, GradConfig, MarchConfig, RenderConfig,
)
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import render_rays
from dist_renderer_tpu.utils.losses import masked_l1


IMG = 24


def _setup(mode="ift"):
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=IMG * 1.2,
                            img_hw=(IMG, IMG))
    origins, dirs = pixel_rays(cam, IMG, IMG)
    sdf_fn = sphere_sdf(0.6)
    latent = jnp.zeros((4,))
    base = RenderConfig(
        img_h=IMG, img_w=IMG,
        march=MarchConfig(max_steps=48),
        grad=GradConfig(mode=mode),
    )
    return sdf_fn, latent, origins, dirs, base


@pytest.mark.parametrize("mode", ["ift", "last_step"])
def test_compact_matches_full(mode):
    sdf_fn, latent, origins, dirs, base = _setup(mode)
    compact = dataclasses.replace(
        base, grad=dataclasses.replace(base.grad, compact_frac=2,
                                       compact_min=16),
    )
    out_f = render_rays(sdf_fn, latent, origins, dirs, base)
    out_c = render_rays(sdf_fn, latent, origins, dirs, compact)
    assert bool(jnp.any(out_f.mask)) and not bool(jnp.all(out_f.mask))
    np.testing.assert_array_equal(np.asarray(out_f.mask), np.asarray(out_c.mask))
    np.testing.assert_allclose(
        np.asarray(out_f.depth), np.asarray(out_c.depth), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.normal), np.asarray(out_c.normal), atol=1e-5
    )
    # margins: analytic oracle has no .cheap sibling, so they are exact here
    np.testing.assert_allclose(
        np.asarray(out_f.min_sdf), np.asarray(out_c.min_sdf), atol=1e-5
    )


def test_compact_gradients_match():
    sdf_fn, latent, origins, dirs, base = _setup("ift")
    compact = dataclasses.replace(
        base, grad=dataclasses.replace(base.grad, compact_frac=2,
                                       compact_min=16),
    )
    target = jnp.full((IMG * IMG,), 1.8)
    mask = jnp.ones((IMG * IMG,), bool)

    def loss(z, o, cfg):
        out = render_rays(sdf_fn, z, o, dirs, cfg)
        # smooth margin term: |.| would flip gradient sign on hit rays
        # whose margin is ~0 up to float reassociation (-6e-8 vs 0.0)
        return masked_l1(out.depth, target, mask) + 0.1 * jnp.mean(
            out.min_sdf ** 2
        )

    z0 = jnp.ones((4,)) * 0.3
    gz_f, go_f = jax.grad(loss, argnums=(0, 1))(z0, origins, base)
    gz_c, go_c = jax.grad(loss, argnums=(0, 1))(z0, origins, compact)
    np.testing.assert_allclose(np.asarray(gz_f), np.asarray(gz_c),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(go_f), np.asarray(go_c),
                               rtol=1e-4, atol=1e-6)


def test_compact_overflow_falls_back():
    """A scene where nearly every ray hits must take the full-width branch
    and still be exact."""
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=IMG * 3.0,
                            img_hw=(IMG, IMG))
    origins, dirs = pixel_rays(cam, IMG, IMG)
    sdf_fn = sphere_sdf(0.9)
    latent = jnp.zeros((4,))
    base = RenderConfig(img_h=IMG, img_w=IMG, march=MarchConfig(max_steps=48),
                        grad=GradConfig(mode="ift"))
    compact = dataclasses.replace(
        base, grad=dataclasses.replace(base.grad, compact_frac=8,
                                       compact_min=16),
    )
    out_f = render_rays(sdf_fn, latent, origins, dirs, base)
    out_c = render_rays(sdf_fn, latent, origins, dirs, compact)
    n_hit = int(jnp.sum(out_f.mask))
    bucket = min(((origins.shape[0] // 8 + 511) // 512) * 512,
                 origins.shape[0])
    assert n_hit > bucket, "fixture must overflow the bucket"
    np.testing.assert_allclose(
        np.asarray(out_f.depth), np.asarray(out_c.depth), atol=1e-6
    )


def test_compact_with_neural_decoder_cheap_margins():
    """With a neural decoder the remainder margins ride the bf16 cheap
    sibling — assert they stay within bf16 tolerance of the precise path."""
    from dist_renderer_tpu.models.decoder import (
        init_decoder_params, make_precise_sdf,
    )

    dcfg = DecoderConfig(hidden_dims=(32,) * 4, latent_size=8, latent_in=(2,))
    params = init_decoder_params(jax.random.PRNGKey(0), dcfg)
    sdf_fn = make_precise_sdf(params, dcfg)
    latent = jax.random.normal(jax.random.PRNGKey(1), (8,)) * 0.1
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=IMG * 1.2,
                            img_hw=(IMG, IMG))
    origins, dirs = pixel_rays(cam, IMG, IMG)
    base = RenderConfig(img_h=IMG, img_w=IMG, march=MarchConfig(max_steps=32),
                        grad=GradConfig(mode="ift"))
    compact = dataclasses.replace(
        base, grad=dataclasses.replace(base.grad, compact_frac=2,
                                       compact_min=16),
    )
    out_f = render_rays(sdf_fn, latent, origins, dirs, base)
    out_c = render_rays(sdf_fn, latent, origins, dirs, compact)
    np.testing.assert_allclose(
        np.asarray(out_f.depth), np.asarray(out_c.depth), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.min_sdf), np.asarray(out_c.min_sdf), atol=2e-2
    )
