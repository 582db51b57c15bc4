"""Distilled proxy-decoder march (models/proxy.py; VERDICT-r3 #1).

Contract under test (see render_batched_c2f's proxy stage):
  - depth parity vs the fp32 exact FULL-decoder render stays within the
    BASELINE.json 1e-3 bar on the production (pallas trace_frame) path;
  - hit-mask disagreements are confined to genuinely borderline rays
    (full-decoder |min_sdf| within the proxy error band);
  - gradients are untouched (they only ever flow through the full
    decoder; the proxy is stop-gradient march machinery).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import (
    DecoderConfig, GradConfig, MarchConfig, RenderConfig,
)
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.models.proxy import (
    default_proxy_cfg,
    distill_proxy,
    load_proxy_npz,
    proxy_error_report,
    save_proxy_npz,
)
from dist_renderer_tpu.ops.camera import Camera
from dist_renderer_tpu.ops.renderer import make_march_factory, render

IMG = 32


@pytest.fixture(scope="module")
def decoders():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(48,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: sphere_sdf(0.5)(None, p), dcfg, steps=400, batch=2048,
    )
    pcfg = default_proxy_cfg(dcfg, width=32, depth=3)
    proxy, pcfg = distill_proxy(
        params, dcfg, z0[None], proxy_cfg=pcfg, steps=1500, batch=2048,
        lr=2e-3,
    )
    return params, z0, dcfg, proxy, pcfg


@pytest.fixture(scope="module")
def exact(decoders):
    params, z0, dcfg, _, _ = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    cfg = RenderConfig(
        img_h=IMG, img_w=IMG,
        march=MarchConfig(max_steps=80, convergence_eps=1e-6, depth_eps=1e-7),
    )
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)
    return render(sdf_fn, z0, cam, cfg)


def test_distill_quality(decoders):
    params, z0, dcfg, proxy, pcfg = decoders
    rep = proxy_error_report(params, dcfg, proxy, pcfg, z0[None], n=8192)
    # tiny 32x3 proxy on a 48x4 learned field: measured p95 ~7e-3
    assert rep["p95"] < 1.2e-2, rep
    assert rep["max"] < 5e-2, rep
    # the verify-stage safety knobs must dominate the measured error
    m = MarchConfig()
    assert m.proxy_band > rep["p95"], rep
    assert m.proxy_backoff > rep["p50"], rep


def test_proxy_npz_round_trip(tmp_path, decoders):
    _, z0, _, proxy, pcfg = decoders
    path = str(tmp_path / "proxy.npz")
    save_proxy_npz(path, proxy, pcfg)
    proxy2, pcfg2 = load_proxy_npz(path)
    assert pcfg2 == pcfg
    pts = jax.random.uniform(jax.random.PRNGKey(0), (256, 3), minval=-1,
                             maxval=1)
    a = decoder_apply(proxy, z0, pts, pcfg)
    b = decoder_apply(proxy2, z0, pts, pcfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_proxy_verified_march_parity(decoders, exact):
    """Production path: pallas trace_frame with the proxy stage — depth
    and hit mask come from the full-decoder verify march."""
    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)
    cfg = RenderConfig(
        img_h=IMG, img_w=IMG,
        march=MarchConfig(
            max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
            coarse_to_fine=True, scheduler="queue",
        ),
        grad=GradConfig(mode="ift", polish_iters=2),
        compute_dtype="bfloat16", use_pallas=True,
    )
    fac = make_march_factory(params, dcfg, cfg, march_params=proxy,
                             march_dcfg=pcfg)
    fast = render(sdf_fn, z0, cam, cfg, fac)

    eh, fh = np.asarray(exact.mask), np.asarray(fast.mask)
    both = eh & fh
    assert both.sum() > 0.9 * eh.sum()
    # hit-mask agreement: disagreements only on borderline rays
    agree = (eh == fh).mean()
    assert agree > 0.985, f"hit agreement {agree:.4f}"
    dis = eh != fh
    if dis.any():
        ms = np.abs(np.asarray(exact.min_sdf))
        band = MarchConfig().proxy_band
        assert ms[dis].max() < 2 * band, (
            f"non-borderline hit flip: |min_sdf| up to {ms[dis].max():.4f}"
        )
    derr = np.abs(np.asarray(fast.depth) - np.asarray(exact.depth))
    assert np.median(derr[both]) < 2e-4
    frontal = np.abs(np.asarray(exact.normal)[..., 2]) > 0.2
    sel = both & frontal
    p95 = np.percentile(derr[sel], 95)
    assert p95 < 1e-3, f"p95 depth err {p95:.2e}"
    # normals come from the full decoder, not the proxy
    cn = np.sum(
        np.asarray(fast.normal)[both] * np.asarray(exact.normal)[both],
        axis=-1,
    )
    assert np.median(1.0 - cn) < 1e-4


def test_proxy_march_gradients_match_full_march(decoders):
    """The gradient path never touches the proxy: fitting gradients from
    a proxy-march render must match the full-march render's."""
    from dist_renderer_tpu.utils.losses import masked_l1

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)
    cfg = RenderConfig(
        img_h=IMG, img_w=IMG,
        march=MarchConfig(
            max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
            coarse_to_fine=True, use_compaction=True,
        ),
        grad=GradConfig(mode="ift", polish_iters=2),
        compute_dtype="bfloat16",
    )
    target = jnp.full((IMG, IMG), 1.5)
    mask = jnp.ones((IMG, IMG), bool)

    def gradz(factory):
        def loss(z):
            out = render(sdf_fn, z, cam, cfg, factory)
            return masked_l1(out.depth, target, mask)

        return jax.grad(loss)(z0)

    g_full = gradz(make_march_factory(params, dcfg, cfg))
    g_prox = gradz(make_march_factory(params, dcfg, cfg, march_params=proxy,
                                      march_dcfg=pcfg))
    cos = float(
        jnp.sum(g_full * g_prox)
        / (jnp.linalg.norm(g_full) * jnp.linalg.norm(g_prox))
    )
    assert cos > 0.97, f"grad cos {cos:.4f}"


def test_batched_proxy_verify_matches_full(decoders, exact):
    """bench.py's batched headline path: render_batched_c2f with the
    proxy stage vs the plain full-decoder batched render. Raw march
    depths (no composition polish here) only converge to |f| <
    convergence_eps, so the contract is COMPARATIVE against the fp32
    exact render: the proxy-verified march must be as accurate as the
    full-decoder march it replaces, quantile for quantile."""
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    F = 2
    lat = jnp.stack([z0, z0])    # frame 1 == frame 0: exact ref applies
    ob = jnp.broadcast_to(o[None], (F,) + o.shape)
    vb = jnp.broadcast_to(v[None], (F,) + v.shape)
    march = MarchConfig(
        max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
        coarse_to_fine=True,
    )
    kw = dict(
        img_hw=(IMG, IMG), march=march, strides=(4,), shared_origin=True,
        interpret=True,
    )
    d_full, hit_full, ms_full = render_batched_c2f(
        params, dcfg, lat, ob, vb, **kw
    )[:3]
    d_prox, hit_prox, ms_prox = render_batched_c2f(
        params, dcfg, lat, ob, vb, proxy=(proxy, pcfg), **kw
    )[:3]

    hf = np.asarray(hit_full)
    hp = np.asarray(hit_prox)
    agree = (hf == hp).mean()
    assert agree > 0.985, f"batched hit agreement {agree:.4f}"

    de = np.asarray(exact.depth).reshape(-1)[None].repeat(F, 0)
    he = np.asarray(exact.mask).reshape(-1)[None].repeat(F, 0)
    err_f = np.abs(np.asarray(d_full) - de)[hf & he]
    err_p = np.abs(np.asarray(d_prox) - de)[hp & he]
    assert np.median(err_p) <= np.median(err_f) * 1.3 + 1e-4, (
        np.median(err_p), np.median(err_f)
    )
    assert np.percentile(err_p, 95) <= np.percentile(err_f, 95) * 1.3 + 2e-4, (
        np.percentile(err_p, 95), np.percentile(err_f, 95)
    )
    # margins: the near-zero ones (what silhouette losses push on) come
    # from the full-decoder verify march
    mboth = ~hf & ~hp
    msf = np.asarray(ms_full)[mboth]
    msp = np.asarray(ms_prox)[mboth]
    near = msf < MarchConfig().proxy_band
    if near.any():
        assert np.abs(msp[near] - msf[near]).max() < 5e-3
