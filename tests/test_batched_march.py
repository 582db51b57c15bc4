"""Multi-frame batched kernel: interpret-mode parity vs per-frame traces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.pallas.batched_march import (
    fold_bias_bank, pack_shared, render_depth_batched,
)
from dist_renderer_tpu.ops.tracer import sphere_trace

MARCH = MarchConfig(max_steps=40)


@pytest.fixture(scope="module")
def decoder():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: sphere_sdf(0.5)(None, p), dcfg, steps=300, batch=1024,
    )
    return params, z0, dcfg


def test_bias_bank_layout(decoder):
    params, z0, dcfg = decoder
    shared = pack_shared(params, dcfg)
    lat = jnp.stack([z0, z0 * 0.5, -z0])
    bank = fold_bias_bank(params, lat, dcfg, shared)
    assert bank.shape[0] == shared.total
    assert bank.shape[1] % 128 == 0
    # columns differ across latents
    assert not np.allclose(np.asarray(bank[:, 0]), np.asarray(bank[:, 1]))


def test_batched_c2f_matches_plain(decoder):
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    params, z0, dcfg = decoder
    img = 16
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    latents = jnp.stack([z0, z0 + 0.05])
    f = latents.shape[0]
    origins = jnp.broadcast_to(o[None], (f,) + o.shape)
    dirs = jnp.broadcast_to(v[None], (f,) + v.shape)

    d_ref, h_ref = render_depth_batched(
        params, dcfg, latents, origins, dirs, MARCH, block=256, interpret=True
    )
    d, h, msdf = render_batched_c2f(
        params, dcfg, latents, origins, dirs, (img, img), MARCH,
        block=256, strides=(2,), interpret=True,
    )
    # c2f never loses hits
    assert (np.asarray(h_ref) & ~np.asarray(h)).sum() == 0
    both = np.asarray(h_ref) & np.asarray(h)
    err = np.abs(np.asarray(d) - np.asarray(d_ref))[both]
    assert np.median(err) < 5e-3
    # miss rays carry positive margins
    assert (np.asarray(msdf)[~np.asarray(h)] > -1e-3).all()


def test_bias_bank_multi_tile_indexing(decoder):
    """Frames beyond the first 128-frame bias tile must index correctly
    (fb[i] // FRAME_TILE block selection + one-hot lane)."""
    params, z0, dcfg = decoder
    img = 8
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=10.0, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    f = 130  # spans two bias tiles
    # frame 0 and frame 129 share a latent; frame 64 differs
    lat = jnp.tile(z0[None], (f, 1))
    lat = lat.at[64].set(z0 * 0.5)
    origins = jnp.broadcast_to(o[None], (f,) + o.shape)
    dirs = jnp.broadcast_to(v[None], (f,) + v.shape)
    depth, hit = render_depth_batched(
        params, dcfg, lat, origins, dirs, MARCH, block=64, interpret=True
    )
    d = np.asarray(depth)
    h = np.asarray(hit)
    # identical latents across the tile boundary -> identical renders
    np.testing.assert_allclose(d[0], d[129], atol=1e-6)
    assert (h[0] == h[129]).all()
    # the odd frame out must differ
    assert not np.allclose(d[0], d[64], atol=1e-4)


def test_batched_matches_per_frame(decoder):
    params, z0, dcfg = decoder
    img = 16
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    latents = jnp.stack([z0, z0 + 0.05, z0 - 0.05])
    f = latents.shape[0]

    origins = jnp.broadcast_to(o[None], (f,) + o.shape)
    dirs = jnp.broadcast_to(v[None], (f,) + v.shape)
    depth_b, hit_b = render_depth_batched(
        params, dcfg, latents, origins, dirs, MARCH, block=256, interpret=True
    )

    for i in range(f):
        pf = make_point_fn(params, latents[i], dcfg, jnp.bfloat16)
        ref = sphere_trace(pf, o, v, MARCH)
        agree = (np.asarray(hit_b[i]) == np.asarray(ref.hit)).mean()
        # rim pixels may differ between the kernel and the jnp tracer
        # (bf16 rounding differences at grazing incidence)
        assert agree > 0.955, f"frame {i}: hit agreement {agree}"
        both = np.asarray(hit_b[i]) & np.asarray(ref.hit)
        if both.any():
            err = np.abs(np.asarray(depth_b[i]) - np.asarray(ref.depth))[both]
            assert np.median(err) < 5e-3


def test_persistent_matches_grid_kernel(decoder):
    """The persistent (one-grid-step, in-kernel chunk loop + manual DMA)
    kernel must match the grid kernel field-for-field, including dead
    chunks (whose outputs come pre-seeded via input_output_aliases)."""
    from dist_renderer_tpu.ops.pallas.batched_march import (
        pallas_sphere_trace_batched, pallas_sphere_trace_persistent,
    )

    params, z0, dcfg = decoder
    shared = pack_shared(params, dcfg)
    F, img = 3, 16
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    n = o.shape[0]
    lats = jnp.stack([z0, z0 * 0.7, z0 + 0.05])
    bank = fold_bias_bank(params, lats, dcfg, shared)
    ob, vb = jnp.tile(o, (F, 1)), jnp.tile(v, (F, 1))
    fr = jnp.repeat(jnp.arange(F, dtype=jnp.int32), n)
    # kill the first chunk so the dead-chunk path is exercised
    act = jnp.ones((F * n,), bool).at[:128].set(False)

    kw = dict(init_active=act, block=128, interpret=True)
    r1 = pallas_sphere_trace_batched(shared, bank, fr, ob, vb, MARCH, **kw)
    r2 = pallas_sphere_trace_persistent(shared, bank, fr, ob, vb, MARCH, **kw)
    assert int(r1.hit.sum()) > 100
    for name in ("depth", "hit", "min_sdf", "depth_at_min", "last_sdf",
                 "unresolved", "steps_per_ray", "bracketed"):
        a = np.asarray(getattr(r1, name)).astype(np.float64)
        b = np.asarray(getattr(r2, name)).astype(np.float64)
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)


def test_single_frame_rounds_skip_semantics(decoder):
    """pallas_sphere_trace_rounds: rays that never march (c2f skip class)
    must still report their seed anchor as depth/depth_at_min and a
    geometric margin, matching the plain kernel's init-state outputs."""
    from dist_renderer_tpu.models.folded import fold_latent
    from dist_renderer_tpu.ops.pallas.fused_march import (
        pack_folded, pallas_sphere_trace, pallas_sphere_trace_rounds,
    )

    params, z0, dcfg = decoder
    packed = pack_folded(fold_latent(params, z0, dcfg), dcfg)
    img = 16
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=20.0, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    n = o.shape[0]
    # mark a band of rays as skip, with anchor seeds
    active = jnp.ones((n,), bool).at[:64].set(False)
    seed = jnp.full((n,), jnp.nan).at[:64].set(1.7)
    m = MarchConfig(max_steps=40, convergence_eps=2e-3, depth_eps=5e-4)
    ref = pallas_sphere_trace(
        packed, o, v, m, init_depth=seed, init_active=active,
        block=64, interpret=True,
    )
    got = pallas_sphere_trace_rounds(
        packed, o, v, m, init_depth=seed, init_active=active,
        block=64, interpret=True, round_caps=(4, 12),
    )
    skip = ~np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(got.depth)[skip], np.asarray(ref.depth)[skip], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.depth_at_min)[skip],
        np.asarray(ref.depth_at_min)[skip], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.min_sdf)[skip], np.asarray(ref.min_sdf)[skip],
        atol=1e-6,
    )
    # marched rays: same hits, depths to march tolerance
    both = np.asarray(ref.hit) & np.asarray(got.hit)
    assert both.sum() > 50
    np.testing.assert_allclose(
        np.asarray(got.depth)[both], np.asarray(ref.depth)[both], atol=5e-3
    )
