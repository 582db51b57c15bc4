"""Fused Pallas march kernel: interpret-mode parity vs the reference
jnp tracer on a small fitted decoder (SURVEY.md §7 step 8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.models.folded import fold_latent, make_point_fn
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.pallas.fused_march import (
    PackedDecoder, pack_folded, pallas_sphere_trace,
)
from dist_renderer_tpu.ops.tracer import sphere_trace

MARCH = MarchConfig(max_steps=40)


@pytest.fixture(scope="module")
def tiny_decoder():
    dcfg = DecoderConfig(
        latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,)
    )
    shape = sphere_sdf(0.5)
    params, z0 = fit_decoder_to_sdf(
        lambda p: shape(None, p), dcfg, steps=300, batch=1024,
    )
    return params, z0, dcfg


def test_pack_folded_shapes(tiny_decoder):
    params, z0, dcfg = tiny_decoder
    packed = pack_folded(fold_latent(params, z0, dcfg), dcfg)
    assert packed.whT[0] is None and packed.wxT[0] is not None
    assert packed.wxT[0].shape == (32, 8)
    # skip layer sees both h and x
    skip = dcfg.latent_in[0]
    assert packed.whT[skip] is not None and packed.wxT[skip] is not None
    # final layer output padded to 8
    assert packed.b[-1].shape == (8, 1)


def test_fused_march_matches_tracer_interpret(tiny_decoder):
    params, z0, dcfg = tiny_decoder
    folded = fold_latent(params, z0, dcfg)
    packed = pack_folded(folded, dcfg)
    point_fn = make_point_fn(params, z0, dcfg)

    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(16, 16))
    o, v = pixel_rays(cam, 16, 16)

    ref = sphere_trace(point_fn, o, v, MARCH)
    got = pallas_sphere_trace(
        packed, o, v, MARCH, block=256, interpret=True
    )

    r_hit = np.asarray(ref.hit)
    g_hit = np.asarray(got.hit)
    # bf16 march in the kernel vs fp32 outside: rim pixels may flip
    assert (r_hit == g_hit).mean() > 0.97
    both = r_hit & g_hit
    if both.any():
        err = np.abs(np.asarray(got.depth) - np.asarray(ref.depth))[both]
        # bf16 position quantization ~4e-3; fp32 polish happens downstream
        assert np.median(err) < 5e-3
    np.testing.assert_allclose(
        np.asarray(got.min_sdf)[~r_hit & ~g_hit],
        np.asarray(ref.min_sdf)[~r_hit & ~g_hit],
        atol=2e-2,
    )


def test_fused_march_with_seed_interpret(tiny_decoder):
    params, z0, dcfg = tiny_decoder
    folded = fold_latent(params, z0, dcfg)
    packed = pack_folded(folded, dcfg)
    point_fn = make_point_fn(params, z0, dcfg)

    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(8, 8))
    o, v = pixel_rays(cam, 8, 8)
    ref = sphere_trace(point_fn, o, v, MARCH)
    seed = jnp.where(ref.hit, ref.depth - 0.02, jnp.nan)
    got = pallas_sphere_trace(packed, o, v, MARCH, seed, block=256, interpret=True)
    both = np.asarray(ref.hit) & np.asarray(got.hit)
    assert both.sum() >= np.asarray(ref.hit).sum() * 0.9
