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


def test_polish_all_verify_parity(decoders, exact):
    """verify_hits='polish-all': fine band rays do ZERO full-decoder
    marching — they ride the hit channel as WEAK candidates seeded at
    the proxy dip anchor (dam) and the finalize polishes them with the
    full decoder (stalled weak ray -> miss). vs the march-verify
    reference: flips stay band-confined, depth quantiles meet the same
    bars as the 'polish' contract, and the weak mask only marks rays
    the proxy called near-misses."""
    from dist_renderer_tpu.models.proxy import proxy_error_report
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f
    from dist_renderer_tpu.ops.renderer import finalize_hits_batched

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    F = 2
    lat = jnp.stack([z0, z0])
    ob = jnp.broadcast_to(o[None], (F,) + o.shape)
    vb = jnp.broadcast_to(v[None], (F,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True)
    kw = dict(img_hw=(IMG, IMG), march=march, strides=(4,),
              shared_origin=True, interpret=True, proxy=(proxy, pcfg))

    d_ref, h_ref, m_ref = render_batched_c2f(
        params, dcfg, lat, ob, vb, verify_hits="march", **kw)[:3]
    out = render_batched_c2f(
        params, dcfg, lat, ob, vb, verify_hits="polish-all", **kw)
    d_tr, h_tr, m_tr, weak = out[0], out[1], out[2], out[3]

    # weak candidates are flagged hits whose proxy margin sat in the band
    wk, ht = np.asarray(weak), np.asarray(h_tr)
    assert wk.any(), "fixture produced no weak band candidates"
    assert (~wk | ht).all(), "weak ray not riding the hit channel"
    assert (np.abs(np.asarray(m_tr))[wk] <
            2 * MarchConfig().proxy_band).all()

    d_p, h_p, m_p = finalize_hits_batched(
        params, dcfg, lat, ob, vb, d_tr, h_tr, m_tr,
        convergence_eps=march.convergence_eps, polish_iters=4, weak=weak)

    tube = proxy_error_report(params, dcfg, proxy, pcfg, z0[None],
                              n=8192)["p95"]
    rh, ph = np.asarray(h_ref), np.asarray(h_p)
    flips = rh != ph
    assert flips.mean() < 0.03, f"polish-all flips {flips.mean():.4f}"
    if flips.any():
        ms = np.abs(np.asarray(m_ref))
        assert ms[flips].max() < 2 * MarchConfig().proxy_band, (
            f"non-borderline polish-all flip: {ms[flips].max():.4f}"
        )
    de = np.asarray(exact.depth).reshape(-1)
    eh = np.asarray(exact.mask).reshape(-1)
    for fi in range(F):
        b_ref = eh & rh[fi]
        b_p = eh & ph[fi]
        err_ref = np.abs(np.asarray(d_ref)[fi] - de)[b_ref]
        err_p = np.abs(np.asarray(d_p)[fi] - de)[b_p]
        assert np.median(err_p) <= np.median(err_ref) + 1e-4
        assert np.percentile(err_p, 95) < 1.5 * tube
        assert err_p.max() < 8e-2, f"frame {fi}: max {err_p.max():.2e}"
    # weak rays that survived must have genuinely converged: their
    # polished |s| is within the march's own hit criterion
    kept_weak = wk & ph
    if kept_weak.any():
        assert (np.abs(np.asarray(m_p))[kept_weak]
                <= march.convergence_eps + 1e-4).all()


def _batched(decoders, exact_like, **over):
    """render_batched_c2f at the module fixture's scene, F=2."""
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    params, z0, dcfg, proxy, pcfg = decoders
    cam = over.pop(
        "cam",
        Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG)),
    )
    o, v = pixel_rays(cam, IMG, IMG)
    F = 2
    lat = jnp.stack([z0, z0])
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
    kw.update(over)
    return render_batched_c2f(params, dcfg, lat, ob, vb, **kw)[:3]


def test_cert_matches_march_verify(decoders, exact):
    """verify_mode='cert' (2-probe bracket certification, ops/cert.py)
    must agree with verify_mode='march' (seeded full-decoder march) on the
    hit mask away from eps-borderline rays, and be no less accurate
    against the fp32 exact render."""
    params, z0, dcfg, proxy, pcfg = decoders
    d_m, h_m, _ = _batched(decoders, exact, proxy=(proxy, pcfg),
                           verify_mode="march")
    d_c, h_c, _ = _batched(decoders, exact, proxy=(proxy, pcfg),
                           verify_mode="cert")
    hm, hc = np.asarray(h_m), np.asarray(h_c)
    agree = (hm == hc).mean()
    assert agree > 0.99, f"cert-vs-march hit agreement {agree:.4f}"

    de = np.asarray(exact.depth).reshape(-1)[None].repeat(2, 0)
    he = np.asarray(exact.mask).reshape(-1)[None].repeat(2, 0)
    err_m = np.abs(np.asarray(d_m) - de)[hm & he]
    err_c = np.abs(np.asarray(d_c) - de)[hc & he]
    assert np.median(err_c) <= np.median(err_m) * 1.3 + 1e-4
    assert np.percentile(err_c, 95) <= np.percentile(err_m, 95) * 1.3 + 2e-4


def test_cert_demotion_fallback(decoders, exact):
    """A probe window far below the proxy's real depth error makes the
    bracket test fail: rays must DEMOTE to the full re-march and still
    come back with genuine full-decoder results (accuracy unchanged),
    never silently keep proxy values."""
    params, z0, dcfg, proxy, pcfg = decoders
    d_c, h_c, _ = _batched(
        decoders, exact, proxy=(proxy, pcfg), verify_mode="cert",
        proxy_backoff=2e-4,   # << proxy error p50 — most certs fail
        with_diag=True,
    )
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    # diag run to confirm the demotion path actually fired
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    lat = jnp.stack([z0, z0])
    ob = jnp.broadcast_to(o[None], (2,) + o.shape)
    vb = jnp.broadcast_to(v[None], (2,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True)
    out = render_batched_c2f(
        params, dcfg, lat, ob, vb, (IMG, IMG), march, strides=(4,),
        shared_origin=True, interpret=True, proxy=(proxy, pcfg),
        verify_mode="cert", proxy_backoff=2e-4, with_diag=True,
    )
    diag = out[-1]
    assert int(diag["cert_demoted"]) > 0, "demotion path never exercised"

    hc = np.asarray(h_c)
    he = np.asarray(exact.mask).reshape(-1)[None].repeat(2, 0)
    de = np.asarray(exact.depth).reshape(-1)[None].repeat(2, 0)
    agree = (hc == he).mean()
    assert agree > 0.985, f"hit agreement after demotion {agree:.4f}"
    err = np.abs(np.asarray(d_c) - de)[hc & he]
    assert np.median(err) < 3e-3


def test_cert_band_probe_mode(decoders, exact):
    """verify_band='probe' (3-probe parabola at the proxy argmin,
    ops/cert.py) — the cheap band mode. Hit/miss verdicts must stay
    genuine (dip <= 0 promotes to a seeded full-decoder march); margin
    error is bounded by ~2x the PROXY's field error on grazing dips
    (scripts/debug_band_probe.py), so the fidelity bar scales with the
    fixture proxy's measured p95, unlike the march mode's fixed 5e-3."""
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    params, z0, dcfg, proxy, pcfg = decoders
    rep = proxy_error_report(params, dcfg, proxy, pcfg, z0[None], n=8192)

    d_m, h_m, ms_m = _batched(decoders, exact, proxy=(proxy, pcfg),
                              verify_mode="cert", verify_band="march")
    d_p, h_p, ms_p = _batched(decoders, exact, proxy=(proxy, pcfg),
                              verify_mode="cert", verify_band="probe")
    hm, hp = np.asarray(h_m), np.asarray(h_p)
    agree = (hm == hp).mean()
    assert agree > 0.985, f"probe-vs-march hit agreement {agree:.4f}"

    # depth parity on hits unchanged (hits never ride the band path)
    de = np.asarray(exact.depth).reshape(-1)[None].repeat(2, 0)
    he = np.asarray(exact.mask).reshape(-1)[None].repeat(2, 0)
    err_m = np.abs(np.asarray(d_m) - de)[hm & he]
    err_p = np.abs(np.asarray(d_p) - de)[hp & he]
    assert np.median(err_p) <= np.median(err_m) * 1.3 + 1e-4

    # band margins: error scales with the proxy's own field error
    mboth = ~hm & ~hp
    msf = np.asarray(ms_m)[mboth]
    msp = np.asarray(ms_p)[mboth]
    near = msf < MarchConfig().proxy_band
    if near.any():
        dd = np.abs(msp[near] - msf[near])
        assert np.median(dd) < 3e-3, f"median band-margin err {np.median(dd)}"
        assert dd.max() < 3 * rep["p95"] + 5e-3, (
            f"band-margin err {dd.max():.4f} vs proxy p95 {rep['p95']:.4f}"
        )

    # the probe path actually fired (band rays exist at this scene)
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    lat = jnp.stack([z0, z0])
    ob = jnp.broadcast_to(o[None], (2,) + o.shape)
    vb = jnp.broadcast_to(v[None], (2,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True)
    out = render_batched_c2f(
        params, dcfg, lat, ob, vb, (IMG, IMG), march, strides=(4,),
        shared_origin=True, interpret=True, proxy=(proxy, pcfg),
        verify_mode="cert", verify_band="probe", proxy_band=0.05,
        with_diag=True,
    )
    diag = out[-1]
    assert int(diag["cert_band_probed"]) > 0, "band probe never exercised"
    # widening the band to 0.05 on a max-5e-2-error proxy sweeps real
    # hits into the band: the promotion path must catch them
    d_w, h_w = out[0], out[1]
    hw = np.asarray(h_w)
    agree_w = (hw == he).mean()
    assert agree_w > 0.985, f"wide-band hit agreement {agree_w:.4f}"


def test_hybrid_march_probe_band(decoders, exact):
    """The HYBRID verify: verify_mode='march' + verify_band='probe' —
    proxy hits keep the seeded full-decoder confirmation march (the
    measured-best hit treatment) while band rays take ops/cert.py's
    3-probe parabola instead of an entry-seeded re-march. Hits must
    match pure march-mode verify near-exactly (same seeded march; only
    block packing differs once band rays leave the march), and band
    margins must meet the probe fidelity bounds."""
    params, z0, dcfg, proxy, pcfg = decoders
    rep = proxy_error_report(params, dcfg, proxy, pcfg, z0[None], n=8192)

    d_m, h_m, ms_m = _batched(decoders, exact, proxy=(proxy, pcfg),
                              verify_mode="march", verify_band="march")
    d_h, h_h, ms_h = _batched(decoders, exact, proxy=(proxy, pcfg),
                              verify_mode="march", verify_band="probe")
    hm, hh = np.asarray(h_m), np.asarray(h_h)
    agree = (hm == hh).mean()
    assert agree > 0.985, f"hybrid-vs-march hit agreement {agree:.4f}"

    # hit depths: the same seeded march on both sides — only packing
    # (and thus cap-edge salvage) can differ
    both = hm & hh
    dd = np.abs(np.asarray(d_m) - np.asarray(d_h))[both]
    assert np.median(dd) < 1e-5, f"hybrid hit-depth median {np.median(dd)}"
    assert np.quantile(dd, 0.99) < 5e-3, (
        f"hybrid hit-depth p99 {np.quantile(dd, 0.99)}"
    )

    # band margins: probe fidelity bounds (scale with the proxy's error)
    mboth = ~hm & ~hh
    msf = np.asarray(ms_m)[mboth]
    msp = np.asarray(ms_h)[mboth]
    near = msf < MarchConfig().proxy_band
    if near.any():
        err = np.abs(msp[near] - msf[near])
        assert np.median(err) < 3e-3, f"median band-margin err {np.median(err)}"
        assert err.max() < 3 * rep["p95"] + 5e-3, (
            f"band-margin err {err.max():.4f} vs proxy p95 {rep['p95']:.4f}"
        )


def test_cert_overflow_fallback(decoders):
    """Hits beyond the cert bucket must route through the seeded-march
    class (CertResult.overflow), not be dropped: certify directly with a
    bucket smaller than the hit count and check the accounting."""
    from dist_renderer_tpu.ops.cert import certify_hits_batched
    from dist_renderer_tpu.ops.pallas.batched_march import (
        fold_bias_bank, pack_shared,
    )
    from dist_renderer_tpu.ops.camera import pixel_rays

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -1.2), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    F = 2
    ob = jnp.broadcast_to(o[None], (F,) + o.shape)
    vb = jnp.broadcast_to(v[None], (F,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4)
    shared = pack_shared(params, dcfg)
    bank = fold_bias_bank(params, jnp.stack([z0, z0]), dcfg, shared)

    # ground-truth-ish seeds: exact sphere geometry (decoder fits r=0.5)
    oc = np.asarray(ob[0])
    vc = np.asarray(vb[0])
    b_ = np.sum(oc * vc, axis=-1)
    c_ = np.sum(oc * oc, axis=-1) - 0.25
    disc = b_ * b_ - c_
    hit_geo = disc > 1e-4
    d_geo = -b_ - np.sqrt(np.maximum(disc, 0.0))
    seeded = jnp.asarray(np.repeat(hit_geo[None], F, 0))
    depth = jnp.asarray(np.repeat(d_geo[None], F, 0), jnp.float32)

    n_hits = int(hit_geo.sum())
    assert n_hits > 128, "close-up camera should flood the bucket"
    res = certify_hits_batched(
        shared, bank, ob, vb, depth, seeded, march, delta=0.02,
        block=128, bucket_frac=IMG * IMG // 128,   # bucket of one block
        interpret=True,
    )
    n_over = int(jnp.sum(res.overflow))
    n_cert = int(jnp.sum(res.certified))
    assert n_over == (n_hits - 128) * F, (n_over, n_hits)
    # geometric seeds deviate from the LEARNED zero set on grazing rays;
    # most in-bucket rays still bracket within the window
    assert n_cert > 0.6 * 128 * F, n_cert
    # certified + overflow + uncertified-in-bucket == seeded, disjointly
    assert not bool(jnp.any(res.certified & res.overflow))
    covered = res.certified | res.overflow
    assert bool(jnp.all(covered <= seeded))
    # certified depths sit on the full decoder's zero set (within noise)
    from dist_renderer_tpu.models.decoder import decoder_apply

    d_np = np.asarray(res.depth)
    cert_np = np.asarray(res.certified)
    pts = oc[cert_np[0]] + d_np[0][cert_np[0], None] * vc[cert_np[0]]
    f = np.asarray(decoder_apply(params, z0, jnp.asarray(pts), dcfg))
    assert np.percentile(np.abs(f), 95) < 2e-3, np.percentile(np.abs(f), 95)


def test_verify_caps_are_schedule_tolerant(decoders, exact):
    """verify_round_caps (MarchConfig.proxy_verify_caps at the renderer
    surface) retime the verify stage's rounds. Unlike the queue kernel
    (which threads the FULL march carry across generations and is
    bit-exact), the rounds scheduler re-seeds each round from (depth,
    live) only — a bracketed-but-unconverged ray crossing a round
    boundary restarts its secant, so different schedules may wiggle
    late-converging rays WITHIN march tolerance. Contract: hit masks
    agree (no flips at this fixture), common-hit depths within a few
    depth_eps."""
    base = _batched(decoders, exact, proxy=(decoders[3], decoders[4]))
    for caps in ((1, 4, 12), (1, 2, 6, 16)):
        d, h, _ = _batched(decoders, exact, proxy=(decoders[3], decoders[4]),
                           verify_round_caps=caps)
        hb, hc = np.asarray(base[1]), np.asarray(h)
        flips = (hb != hc).mean()
        assert flips <= 0.005, f"caps {caps}: hit flips {flips:.4f}"
        both = hb & hc
        dd = np.abs(np.asarray(base[0]) - np.asarray(d))[both]
        assert np.percentile(dd, 99) < 2e-3, (
            f"caps {caps}: p99 hit-depth delta {np.percentile(dd, 99):.2e}"
        )


def test_zero_backoff_verify_parity(decoders, exact):
    """proxy_backoff=0 seeds the hit-verify AT the proxy depth: the march
    body accepts ~half the seeds at eval 1 (|f_full| < eps), inside-seeds
    recover via the backward walk (d+f) -> bracket -> secant. The RAW
    accepted depth then carries up to the proxy's own displacement (the
    |f|<eps ball is wider where the learned gradient is shallow), so the
    honest bar is the production one: post-polish parity on the full
    render() path — same 1e-3 p95 as test_proxy_verified_march_parity —
    driven through MarchConfig.proxy_backoff/proxy_verify_caps (the new
    config plumbing) rather than raw kernel kwargs."""
    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)
    cfg = RenderConfig(
        img_h=IMG, img_w=IMG,
        march=MarchConfig(
            max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
            coarse_to_fine=True, scheduler="queue",
            proxy_backoff=0.0, proxy_verify_caps=(1, 2, 6, 16),
        ),
        grad=GradConfig(mode="ift", polish_iters=2),
        compute_dtype="bfloat16", use_pallas=True,
    )
    fac = make_march_factory(params, dcfg, cfg, march_params=proxy,
                             march_dcfg=pcfg)
    fast = render(sdf_fn, z0, cam, cfg, fac)

    eh, fh = np.asarray(exact.mask), np.asarray(fast.mask)
    both = eh & fh
    agree = (eh == fh).mean()
    assert agree > 0.985, f"zero-backoff hit agreement {agree:.4f}"
    derr = np.abs(np.asarray(fast.depth) - np.asarray(exact.depth))
    assert np.median(derr[both]) < 2e-4
    frontal = np.abs(np.asarray(exact.normal)[..., 2]) > 0.2
    p95 = np.percentile(derr[both & frontal], 95)
    assert p95 < 1e-3, f"zero-backoff post-polish p95 depth err {p95:.2e}"


def test_verify_mode_validation(decoders):
    """A typo'd verify_mode/verify_band must raise, not silently fall
    through to the march path (ADVICE r4)."""
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    ob, vb = o[None], v[None]
    march = MarchConfig(max_steps=50, coarse_to_fine=True)
    kw = dict(img_hw=(IMG, IMG), march=march, strides=(4,),
              shared_origin=True, interpret=True, proxy=(proxy, pcfg))
    with pytest.raises(ValueError, match="verify_mode"):
        render_batched_c2f(params, dcfg, z0[None], ob, vb,
                           verify_mode="certs", **kw)
    with pytest.raises(ValueError, match="verify_band"):
        render_batched_c2f(params, dcfg, z0[None], ob, vb,
                           verify_band="probes", **kw)


def test_polish_verify_render_parity(decoders, exact):
    """proxy_verify_hits='polish': confident proxy hits skip the verify
    march entirely (only band/unres rays re-march); compose()'s fp32
    full-decoder Newton polish re-anchors their depth and demotes any
    hit whose polished |f| exceeds convergence_eps (the march's own hit
    criterion). End-to-end render() must hold the SAME production parity
    bars as the march-verify path (test_proxy_verified_march_parity)."""
    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)

    def run(hits_mode):
        cfg = RenderConfig(
            img_h=IMG, img_w=IMG,
            march=MarchConfig(
                max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                coarse_to_fine=True, scheduler="queue",
                proxy_verify_hits=hits_mode,
            ),
            # polish_iters=4 (3 Newton iterations): the toy proxy's seeds
            # carry ~10x the production proxy's error, so one extra
            # safeguarded Newton step is needed to land the frontal p95
            # under the production 1e-3 bar (production runs 2)
            grad=GradConfig(mode="ift", polish_iters=4),
            compute_dtype="bfloat16", use_pallas=True,
        )
        fac = make_march_factory(params, dcfg, cfg, march_params=proxy,
                                 march_dcfg=pcfg)
        return render(sdf_fn, z0, cam, cfg, fac)

    fast = run("polish")
    ref = run("march")

    eh, fh = np.asarray(exact.mask), np.asarray(fast.mask)
    both = eh & fh
    assert both.sum() > 0.9 * eh.sum()
    # the toy fixture proxy's field error (p95 ~7e-3) is ~10x the
    # production bench proxy's, and polish-mode verdict ambiguity scales
    # with it (|f| in (eps, e_field] at a claimed crossing cannot
    # distinguish a displaced true hit from a shallow false dip) — so the
    # agreement bar here is looser than march-verify's 0.985; the
    # CONFINEMENT bar (all flips genuinely borderline) is the contract
    agree = (eh == fh).mean()
    assert agree > 0.975, f"hit agreement vs exact {agree:.4f}"
    dis = eh != fh
    if dis.any():
        ms = np.abs(np.asarray(exact.min_sdf))
        band = MarchConfig().proxy_band
        assert ms[dis].max() < 2 * band, (
            f"non-borderline hit flip: |min_sdf| up to {ms[dis].max():.4f}"
        )
    # depth: polish-mode hits were never touched by a full-decoder march,
    # so this is the safeguarded Newton polish alone pulling ~proxy-p99
    # seeds onto the fp32 surface. On the TOY fixture the learned field
    # is wiggly (locally-flat pockets, pre-crossing dips) and the proxy
    # tube is ~10x the production one, so a tail of rim-adjacent rays
    # stalls at its seed BY DESIGN (the safeguards reject flat-slope and
    # non-descending steps rather than runaway — the bars below encode
    # exactly that bound). The production 1e-3 frontal-p95 bar is
    # enforced on hardware against the bench proxy
    # (scripts/diag_polish_parity.py; docs/PERFORMANCE.md round 5).
    from dist_renderer_tpu.models.proxy import proxy_error_report
    tube = proxy_error_report(params, dcfg, proxy, pcfg, z0[None],
                              n=8192)["p95"]
    derr = np.abs(np.asarray(fast.depth) - np.asarray(exact.depth))
    assert np.median(derr[both]) < 3e-4  # bulk of hits: converged
    frontal = np.abs(np.asarray(exact.normal)[..., 2]) > 0.2
    p95 = np.percentile(derr[both & frontal], 95)
    assert p95 < 1.5 * tube, (
        f"polish-verify p95 depth err {p95:.2e} above the toy proxy tube"
    )
    # the structural contract: NO ray ever leaves the proxy error tube
    # (a Newton runaway/wander under a clamped denominator did exactly
    # that before the renderer.py flat-slope + geometric-progress guards)
    assert derr[both].max() < 8e-2, (
        f"polish-verify max depth err {derr[both].max():.2e} (runaway?)"
    )
    # and against the march-verify render directly: flips confined to
    # borderline rays, common-hit depths agree post-polish
    rh = np.asarray(ref.mask)
    flips = rh != fh
    assert flips.mean() < 0.03, f"polish-vs-march mask flips {flips.mean():.4f}"
    if flips.any():
        ms = np.abs(np.asarray(exact.min_sdf))
        assert ms[flips].max() < 2 * MarchConfig().proxy_band, (
            f"non-borderline polish-vs-march flip: |min_sdf| up to "
            f"{ms[flips].max():.4f}"
        )
    common = rh & fh
    dvm = np.abs(np.asarray(fast.depth) - np.asarray(ref.depth))[common]
    assert np.percentile(dvm, 95) < 1.5 * tube, (
        f"polish-vs-march p95 depth delta {np.percentile(dvm, 95):.2e}"
    )
    # demoted rays must carry a genuine non-negative margin (their
    # polished full-decoder dip value), not a stale hit margin
    demoted = rh & ~fh
    if demoted.any():
        msd = np.asarray(fast.min_sdf)[demoted]
        assert (msd > -2e-3).all(), f"demoted-ray margin {msd.min():.2e}"


def test_polish_verify_gradients_match(decoders):
    """Fitting gradients through the polish-verify render match the
    march-verify render's: the demote mask is stop-gradient, margins and
    depth still flow through the same full-decoder recompute."""
    from dist_renderer_tpu.utils.losses import masked_l1

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)
    target = jnp.full((IMG, IMG), 1.5)
    mask = jnp.ones((IMG, IMG), bool)

    def gradz(hits_mode):
        cfg = RenderConfig(
            img_h=IMG, img_w=IMG,
            march=MarchConfig(
                max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                coarse_to_fine=True, scheduler="queue",
                proxy_verify_hits=hits_mode,
            ),
            grad=GradConfig(mode="ift", polish_iters=3),
            compute_dtype="bfloat16", use_pallas=True,
        )
        fac = make_march_factory(params, dcfg, cfg, march_params=proxy,
                                 march_dcfg=pcfg)

        def loss(z):
            out = render(sdf_fn, z, cam, cfg, fac)
            return masked_l1(out.depth, target, mask)

        return jax.grad(loss)(z0)

    g_m = gradz("march")
    g_p = gradz("polish")
    cos = float(
        jnp.sum(g_m * g_p) / (jnp.linalg.norm(g_m) * jnp.linalg.norm(g_p))
    )
    assert cos > 0.97, f"grad cos {cos:.4f}"


def test_verify_hits_validation(decoders):
    """verify_hits typos raise; polish composes only with march/march."""
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    ob, vb = o[None], v[None]
    march = MarchConfig(max_steps=50, coarse_to_fine=True)
    kw = dict(img_hw=(IMG, IMG), march=march, strides=(4,),
              shared_origin=True, interpret=True, proxy=(proxy, pcfg))
    with pytest.raises(ValueError, match="verify_hits"):
        render_batched_c2f(params, dcfg, z0[None], ob, vb,
                           verify_hits="polished", **kw)
    with pytest.raises(ValueError, match="verify_hits"):
        render_batched_c2f(params, dcfg, z0[None], ob, vb,
                           verify_hits="polish", verify_mode="cert", **kw)


def test_finalize_hits_batched_parity(decoders, exact):
    """Trace-only polish contract: render_batched_c2f(verify_hits=
    'polish') + finalize_hits_batched must be at least as accurate vs
    the fp32 exact render as the march-verify batched trace it replaces
    (whose raw depths only converge to |f| < convergence_eps), with
    flips confined to borderline rays and demoted rays carrying genuine
    positive dip margins. Two identical-latent frames exercise the
    vmap against the single-frame exact reference."""
    from dist_renderer_tpu.models.proxy import proxy_error_report
    from dist_renderer_tpu.ops.camera import pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f
    from dist_renderer_tpu.ops.renderer import finalize_hits_batched

    params, z0, dcfg, proxy, pcfg = decoders
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
    o, v = pixel_rays(cam, IMG, IMG)
    F = 2
    lat = jnp.stack([z0, z0])    # identical frames: exact ref applies
    ob = jnp.broadcast_to(o[None], (F,) + o.shape)
    vb = jnp.broadcast_to(v[None], (F,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True)
    kw = dict(img_hw=(IMG, IMG), march=march, strides=(4,),
              shared_origin=True, interpret=True, proxy=(proxy, pcfg))

    d_ref, h_ref, m_ref = render_batched_c2f(
        params, dcfg, lat, ob, vb, verify_hits="march", **kw)[:3]
    d_tr, h_tr, m_tr = render_batched_c2f(
        params, dcfg, lat, ob, vb, verify_hits="polish", **kw)[:3]
    d_p, h_p, m_p = finalize_hits_batched(
        params, dcfg, lat, ob, vb, d_tr, h_tr, m_tr,
        convergence_eps=march.convergence_eps, polish_iters=4)

    tube = proxy_error_report(params, dcfg, proxy, pcfg, z0[None],
                              n=8192)["p95"]
    rh, ph = np.asarray(h_ref), np.asarray(h_p)
    flips = rh != ph
    assert flips.mean() < 0.03, f"finalize flips {flips.mean():.4f}"
    if flips.any():
        ms = np.abs(np.asarray(m_ref))
        assert ms[flips].max() < 2 * MarchConfig().proxy_band, (
            f"non-borderline finalize flip: |min_sdf| {ms[flips].max():.4f}"
        )
    # accuracy vs the fp32 exact render, quantile for quantile: the
    # finalized depths must be no worse than the march-verify raw trace
    # (in practice better — finalize Newton-anchors to the fp32 surface
    # while the raw march stops anywhere inside the |f| < eps tube)
    de = np.asarray(exact.depth).reshape(-1)
    eh = np.asarray(exact.mask).reshape(-1)
    for fi in range(F):
        b_ref = eh & rh[fi]
        b_p = eh & ph[fi]
        err_ref = np.abs(np.asarray(d_ref)[fi] - de)[b_ref]
        err_p = np.abs(np.asarray(d_p)[fi] - de)[b_p]
        assert np.median(err_p) <= np.median(err_ref) + 1e-4, (
            f"frame {fi}: finalize median {np.median(err_p):.2e} vs "
            f"march-verify {np.median(err_ref):.2e}"
        )
        assert np.percentile(err_p, 95) < 1.5 * tube, (
            f"frame {fi}: finalize p95 {np.percentile(err_p, 95):.2e}"
        )
        assert err_p.max() < 8e-2, (
            f"frame {fi}: finalize max {err_p.max():.2e} (runaway?)"
        )
    demoted = h_tr & ~h_p
    if np.asarray(demoted).any():
        msd = np.asarray(m_p)[np.asarray(demoted)]
        assert (msd > -2e-3).all(), f"demoted margin {msd.min():.2e}"
    # overflow fallback: a tiny bucket must take the full-width branch
    # and still produce the same verdict structure
    d_f, h_f, m_f = finalize_hits_batched(
        params, dcfg, lat, ob, vb, d_tr, h_tr, m_tr,
        convergence_eps=march.convergence_eps, polish_iters=4,
        compact_frac=IMG * IMG)  # bucket=1 -> full-width branch
    fl2 = np.asarray(h_f) != ph
    assert fl2.mean() < 0.02, f"full-width branch diverges {fl2.mean():.4f}"
    dd2 = np.abs(np.asarray(d_f) - np.asarray(d_p))[np.asarray(h_f) & ph]
    assert np.percentile(dd2, 95) < 1e-4, "bucket vs full-width depth"
