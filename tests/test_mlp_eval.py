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


def test_color_eval_and_vjp():
    """Fused color path: forward RGB matches color_apply to bf16
    tolerance; the custom VJP's (gz, gp) match fp32 autodiff of
    color_apply within bf16-chain tolerance."""
    from dist_renderer_tpu.models.color_decoder import (
        color_apply, init_color_params, make_color_config,
    )
    from dist_renderer_tpu.ops.pallas.mlp_eval import make_pallas_color_fn
    from dist_renderer_tpu.ops.pallas.recompute import make_color_vjp

    ccfg = make_color_config(latent_size=16, hidden_dims=(48,) * 4,
                             latent_in=(2,))
    params = init_color_params(jax.random.PRNGKey(0), ccfg)
    latent = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (16,))
    pts = 0.6 * jax.random.normal(jax.random.PRNGKey(2), (300, 3))

    # forward-only fn
    cfn = make_pallas_color_fn(params, latent, ccfg, block=128)
    rgb = jax.jit(cfn)(pts)
    ref = color_apply(params, latent, pts, ccfg)
    err = np.abs(np.asarray(rgb) - np.asarray(ref))
    assert np.quantile(err, 0.99) < 5e-3   # sigmoid-compressed bf16 noise
    assert ((rgb >= 0) & (rgb <= 1)).all()

    # differentiable path
    rgb_fn = make_color_vjp(params, ccfg, block=128)
    rgb2 = jax.jit(rgb_fn)(latent, pts)
    np.testing.assert_array_equal(np.asarray(rgb2), np.asarray(rgb))

    w = jax.random.normal(jax.random.PRNGKey(3), (300, 3))
    gz, gp = jax.jit(jax.grad(
        lambda z, p: jnp.sum(w * rgb_fn(z, p)), argnums=(0, 1)
    ))(latent, pts)
    gz_r, gp_r = jax.grad(
        lambda z, p: jnp.sum(w * color_apply(params, z, p, ccfg)),
        argnums=(0, 1),
    )(latent, pts)

    def rel(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

    assert rel(gz, gz_r) < 0.1
    assert rel(gp, gp_r) < 0.1
    cz = np.dot(np.asarray(gz).ravel(), np.asarray(gz_r).ravel()) / (
        np.linalg.norm(gz) * np.linalg.norm(gz_r) + 1e-12)
    assert cz > 0.995
