"""Fused single-pass MLP eval kernel (ops/pallas/mlp_eval.py) and the
one-dispatch sdf_grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import decoder_apply, init_decoder_params
from dist_renderer_tpu.models.folded import fold_latent, make_point_fn
from dist_renderer_tpu.ops.pallas.mlp_eval import (
    make_pallas_point_fn, pallas_point_eval,
)
from dist_renderer_tpu.ops.pallas.fused_march import pack_folded


ARCHS = [
    DecoderConfig(latent_size=32, hidden_dims=(64,) * 8, latent_in=(4,)),
    DecoderConfig(latent_size=16, hidden_dims=(48,) * 4, latent_in=(2,),
                  xyz_in_all=True),
]


@pytest.mark.parametrize("dcfg", ARCHS)
def test_eval_kernel_matches_decoder(dcfg):
    kp, kz, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    params = init_decoder_params(kp, dcfg)
    latent = 0.3 * jax.random.normal(kz, (dcfg.latent_size,))
    pts = 0.8 * jax.random.normal(kx, (300, 3))

    fn = make_pallas_point_fn(params, latent, dcfg, block=128)
    s = jax.jit(fn)(pts)
    ref32 = decoder_apply(params, latent, pts, dcfg)
    err = np.abs(np.asarray(s) - np.asarray(ref32))
    # march-kernel numerics: bf16 inputs/weights, fp32 accumulation
    assert np.quantile(err, 0.99) < 8e-3
    assert err.max() < 5e-2

    # vs the folded bf16 point fn (the march's XLA sibling): same class
    pf = make_point_fn(params, latent, dcfg, jnp.bfloat16)
    ref_b = jax.jit(pf)(pts)
    err_b = np.abs(np.asarray(s) - np.asarray(ref_b))
    assert np.quantile(err_b, 0.99) < 8e-3


def test_eval_kernel_padding():
    dcfg = ARCHS[0]
    params = init_decoder_params(jax.random.PRNGKey(0), dcfg)
    latent = jnp.zeros((dcfg.latent_size,))
    packed = pack_folded(fold_latent(params, latent, dcfg), dcfg)
    pts = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (130, 3))
    s = jax.jit(lambda p: pallas_point_eval(packed, p, block=128))(pts)
    assert s.shape == (130,)
    s_full = jax.jit(lambda p: pallas_point_eval(packed, p, block=128))(
        jnp.concatenate([pts, jnp.zeros((126, 3))])
    )[:130]
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_full))


def test_sdf_grid_single_dispatch_matches_direct():
    from dist_renderer_tpu.eval.mesh import sdf_grid
    from dist_renderer_tpu.models.analytic import torus_sdf

    shape = torus_sdf(0.55, 0.2)
    fn = lambda p: shape(None, p)
    g = sdf_grid(fn, resolution=24, bound=1.0)
    xs = np.linspace(-1.0, 1.0, 24, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 3))
    ref = np.asarray(fn(pts)).reshape(24, 24, 24)
    np.testing.assert_allclose(g, ref, atol=1e-6)


def test_extract_mesh_through_eval_kernel():
    from dist_renderer_tpu.eval.mesh import extract_mesh
    from dist_renderer_tpu.models.analytic import sphere_sdf
    from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf

    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: sphere_sdf(0.6)(None, p), dcfg, steps=300, batch=1024
    )
    fn = make_pallas_point_fn(params, z0, dcfg, block=128)
    verts, faces = extract_mesh(fn, resolution=32)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.6) < 0.05
