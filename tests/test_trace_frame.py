"""Single-frame render through the batched c2f machinery (trace_frame):
the fast path render() takes on TPU must agree with the split
c2f_plan + rounds path on hits, depths (after the differentiable
recompute), and silhouette margins."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from dist_renderer_tpu.config import (
    DecoderConfig, GradConfig, MarchConfig, RenderConfig,
)
from dist_renderer_tpu.models.analytic import torus_sdf
from dist_renderer_tpu.models.decoder import make_precise_sdf
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import (
    make_march_factory, render, render_rays,
)


@pytest.fixture(scope="module")
def setup():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=300, batch=1024
    )
    img = 32
    cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=40, coarse_to_fine=True,
                          convergence_eps=2e-3, depth_eps=5e-4,
                          c2f_strides=(4,), c2f_coarse_steps=16),
        grad=GradConfig(mode="ift"),
        compute_dtype="bfloat16",
        use_pallas=True,
    )
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=img * 1.2,
                            img_hw=(img, img))
    return params, z0, dcfg, cfg, cam


def test_trace_frame_matches_split_path(setup):
    params, z0, dcfg, cfg, cam = setup
    sdf_fn = make_precise_sdf(params, dcfg)
    factory = make_march_factory(params, dcfg, cfg)
    mf = factory(z0)
    origins, dirs = pixel_rays(cam, cfg.img_h, cfg.img_w)

    # fast path: batched-machinery trace + differentiable composition
    trace = mf.trace_frame(origins, dirs, cfg.march,
                           (cfg.img_h, cfg.img_w), interpret=True)
    out_fast = render_rays(sdf_fn, z0, origins, dirs, cfg,
                           march_fn=mf, trace=trace)

    # reference path: c2f_plan + rounds tracer (interpret kernels)
    from dist_renderer_tpu.ops.renderer import c2f_plan

    class InterpretMF:
        def __call__(self, p):
            return mf.point_fn(p)

        def trace(self, o, v, march, init_depth=None, init_active=None):
            return mf.trace(o, v, march, init_depth, init_active,
                            interpret=True)

    imf = InterpretMF()
    plan = c2f_plan(imf, origins, dirs, cfg)
    perm = plan.order
    out_ref = render_rays(
        sdf_fn, z0, origins[perm], dirs[perm], cfg, march_fn=imf,
        init_depth=plan.init_depth[perm], init_active=plan.init_active[perm],
    )
    inv = jnp.argsort(perm)
    d_ref = np.asarray(jnp.take(out_ref.depth, inv))
    m_ref = np.asarray(jnp.take(out_ref.mask.astype(jnp.int32), inv)) > 0
    s_ref = np.asarray(jnp.take(out_ref.min_sdf, inv))

    m_fast = np.asarray(out_fast.mask)
    assert m_fast.sum() > 100
    # hit masks: different round scheduling may flip only rim rays
    assert (m_fast != m_ref).mean() < 0.02
    both = m_fast & m_ref
    dd = np.abs(np.asarray(out_fast.depth)[both] - d_ref[both])
    assert np.percentile(dd, 95) <= 1e-3, np.percentile(dd, 95)
    # silhouette margins agree where both miss (same anchors)
    neither = ~m_fast & ~m_ref
    ds = np.abs(np.asarray(out_fast.min_sdf)[neither] - s_ref[neither])
    assert np.percentile(ds, 95) <= 5e-3, np.percentile(ds, 95)


def test_trace_frame_gradients_flow(setup):
    """Latent and pose gradients through the fast path are finite and the
    depth gradient matches the split path's on hit rays."""
    params, z0, dcfg, cfg, cam = setup
    sdf_fn = make_precise_sdf(params, dcfg)
    factory = make_march_factory(params, dcfg, cfg)
    origins, dirs = pixel_rays(cam, cfg.img_h, cfg.img_w)

    def loss(z, o):
        mf = factory(jax.lax.stop_gradient(z))
        trace = mf.trace_frame(o, dirs, cfg.march,
                               (cfg.img_h, cfg.img_w), interpret=True)
        out = render_rays(sdf_fn, z, o, dirs, cfg, march_fn=mf, trace=trace)
        return jnp.sum(jnp.where(out.mask, out.depth, 0.0))

    gz, go = jax.grad(loss, argnums=(0, 1))(z0, origins)
    assert bool(jnp.isfinite(gz).all()) and float(jnp.abs(gz).sum()) > 0
    assert bool(jnp.isfinite(go).all())
