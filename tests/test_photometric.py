"""Photometric-consistency loss correctness (SURVEY.md §3.4): cross-view
warping of surface points must score the TRUE geometry better than
perturbed geometry, and its gradient must point toward the truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import MarchConfig, RenderConfig
from dist_renderer_tpu.models.analytic import latent_sphere_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import render_rays
from dist_renderer_tpu.utils.losses import photometric_loss

IMG = 24
MARCH = MarchConfig(max_steps=48)
CFG = RenderConfig(img_h=IMG, img_w=IMG, march=MARCH)


def _texture(points):
    """Synthetic world-space texture (smooth, high-frequency enough)."""
    return 0.5 + 0.5 * jnp.stack(
        [
            jnp.sin(7.0 * points[..., 0]),
            jnp.cos(5.0 * points[..., 1] + 1.0),
            jnp.sin(6.0 * points[..., 2] + 2.0),
        ],
        axis=-1,
    )


@pytest.fixture(scope="module")
def views():
    f = latent_sphere_sdf()
    true_r = 0.5
    cams, imgs = [], []
    for az in (0.0, 35.0):
        a = np.radians(az)
        eye = (2.0 * np.sin(a), 0.3, -2.0 * np.cos(a))
        cam = Camera.looking_at(eye, focal=30.0, img_hw=(IMG, IMG))
        o, v = pixel_rays(cam, IMG, IMG)
        out = render_rays(f, jnp.array([true_r]), o, v, CFG)
        rgb = jnp.where(out.mask[:, None], _texture(out.points), 0.0)
        cams.append(cam)
        imgs.append(rgb.reshape(IMG, IMG, 3))
    return f, cams, imgs, true_r


def _loss_at(f, cams, imgs, r):
    o, v = pixel_rays(cams[0], IMG, IMG)
    out = render_rays(f, jnp.array([r]), o, v, CFG)
    return photometric_loss(
        out.points, out.mask, imgs[0], cams[0], imgs[1], cams[1]
    )


def test_true_geometry_scores_best(views):
    f, cams, imgs, true_r = views
    l_true = float(_loss_at(f, cams, imgs, true_r))
    l_small = float(_loss_at(f, cams, imgs, true_r - 0.06))
    l_big = float(_loss_at(f, cams, imgs, true_r + 0.06))
    assert l_true < l_small
    assert l_true < l_big


def test_photometric_gradient_points_home(views):
    f, cams, imgs, true_r = views
    g_lo = float(jax.grad(lambda r: _loss_at(f, cams, imgs, r))(true_r - 0.05))
    g_hi = float(jax.grad(lambda r: _loss_at(f, cams, imgs, r))(true_r + 0.05))
    assert g_lo < 0  # too small => grow
    assert g_hi > 0  # too big => shrink
