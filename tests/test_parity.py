"""Depth/normal parity of the fast path vs the exact fp32 path — the
BASELINE.json acceptance bar (<= 1e-3 depth parity). The bf16 march alone
is ~4e-3 accurate; the fp32 IFT polish in the renderer must re-anchor
depths to fp32 accuracy."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import (
    DecoderConfig, GradConfig, MarchConfig, RenderConfig,
)
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.ops.camera import Camera
from dist_renderer_tpu.ops.renderer import make_march_factory, render


@pytest.fixture(scope="module")
def decoder():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(48,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: sphere_sdf(0.5)(None, p), dcfg, steps=400, batch=2048,
    )
    return params, z0, dcfg


def test_fast_path_depth_parity_1e3(decoder):
    params, z0, dcfg = decoder
    img = 32
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(img, img))
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg)

    # exact: fp32 march, tight eps, last-step composition
    exact_cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=80, convergence_eps=1e-6, depth_eps=1e-7),
    )
    exact = render(sdf_fn, z0, cam, exact_cfg)

    # fast: bf16 folded march, LOOSE march eps matched to bf16 noise,
    # c2f + classification + compaction, fp32 IFT polish
    fast_cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(
            max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
            coarse_to_fine=True, use_compaction=True,
        ),
        grad=GradConfig(mode="ift", polish_iters=2),
        compute_dtype="bfloat16",
    )
    factory = make_march_factory(params, dcfg, fast_cfg)
    fast = render(sdf_fn, z0, cam, fast_cfg, factory)

    eh = np.asarray(exact.mask)
    fh = np.asarray(fast.mask)
    both = eh & fh
    assert both.sum() > 0.8 * eh.sum()
    derr = np.abs(np.asarray(fast.depth) - np.asarray(exact.depth))
    assert np.median(derr[both]) < 2e-4
    # the 1e-3 bar is evaluated on well-posed (non-grazing) surface points:
    # at |n.v| -> 0 depth is ill-conditioned for ANY sphere tracer (the
    # IFT denominator clamps; the reference's last-step trick has the same
    # failure mode at rims). For this frontal camera, the normal's
    # z-component is the grazing proxy.
    frontal = np.abs(np.asarray(exact.normal)[..., 2]) > 0.2
    sel = both & frontal
    assert np.percentile(derr[sel], 95) < 1e-3, (
        f"p95 depth err {np.percentile(derr[sel], 95):.2e}"
    )
    # normals agree (cosine)
    cn = np.sum(
        np.asarray(fast.normal)[both] * np.asarray(exact.normal)[both], axis=-1
    )
    assert np.median(1.0 - cn) < 1e-4


def test_fast_path_depth_parity_pallas_recompute(decoder):
    """The fused recompute kernel must not degrade the fast path: with
    the SAME production precise fn (make_precise_sdf), recompute='pallas'
    matches recompute='xla' quantile-for-quantile against the fp32 exact
    render. (The absolute 2e-4/1e-3 bars in the test above hold for a
    CPU-fp32 recompute value; BOTH production recomputes carry the
    documented ~1e-3 split_x near-surface value noise on this tiny test
    decoder, so the contract here is comparative.)"""
    from dist_renderer_tpu.models.decoder import make_precise_sdf

    params, z0, dcfg = decoder
    img = 32
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(img, img))

    exact_cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=80, convergence_eps=1e-6, depth_eps=1e-7),
    )
    exact = render(lambda z, p: decoder_apply(params, z, p, dcfg),
                   z0, cam, exact_cfg)

    sdf_fn = make_precise_sdf(params, dcfg)

    def run(rec):
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(
                max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                coarse_to_fine=True, use_compaction=True,
            ),
            grad=GradConfig(mode="ift", polish_iters=2, recompute=rec),
            compute_dtype="bfloat16",
        )
        factory = make_march_factory(params, dcfg, cfg)
        return render(sdf_fn, z0, cam, cfg, factory)

    fx, fp = run("xla"), run("pallas")
    eh = np.asarray(exact.mask)
    np.testing.assert_array_equal(np.asarray(fx.mask), np.asarray(fp.mask))
    both = eh & np.asarray(fx.mask)
    assert both.sum() > 0.8 * eh.sum()

    ex = np.abs(np.asarray(fx.depth) - np.asarray(exact.depth))[both]
    ep = np.abs(np.asarray(fp.depth) - np.asarray(exact.depth))[both]
    assert np.median(ep) <= np.median(ex) * 1.2 + 5e-5
    assert np.percentile(ep, 95) <= np.percentile(ex, 95) * 1.2 + 1e-4

    cn = np.sum(
        np.asarray(fp.normal)[both] * np.asarray(exact.normal)[both], axis=-1
    )
    assert np.median(1.0 - cn) < 1e-4


def test_parity_production_arch_bench_decoder():
    """Absolute ≤1e-3 bar at the PRODUCTION architecture (8x512, latent
    256) on the committed bench fixture (.bench_decoder.npz — the same
    decoder BENCH_r*.json numbers are measured on), for both recompute
    implementations. Small frame: the fp32 exact march at this arch is
    ~100 GFLOP on the 1-core CPU test runner."""
    import os

    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_decoder.npz")
    if not os.path.exists(cache):
        pytest.skip("bench decoder fixture not present")
    shape = round_union(
        torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
    )
    dcfg = DecoderConfig()
    params, z0 = get_or_fit_cached(cache, lambda p: shape(None, p), dcfg,
                                   steps=1500)
    img = 16
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))

    exact_cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=80, convergence_eps=1e-6, depth_eps=1e-7),
    )
    exact = render(lambda z, p: decoder_apply(params, z, p, dcfg),
                   z0, cam, exact_cfg)

    sdf_fn = make_precise_sdf(params, dcfg)
    for rec in ("xla", "pallas"):
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(
                max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                coarse_to_fine=True, use_compaction=True,
            ),
            grad=GradConfig(mode="ift", polish_iters=2, recompute=rec),
            compute_dtype="bfloat16",
        )
        factory = make_march_factory(params, dcfg, cfg)
        fast = render(sdf_fn, z0, cam, cfg, factory)
        eh, fh = np.asarray(exact.mask), np.asarray(fast.mask)
        both = eh & fh
        assert both.sum() > 0.8 * eh.sum(), rec
        derr = np.abs(np.asarray(fast.depth) - np.asarray(exact.depth))
        frontal = np.abs(np.asarray(exact.normal)[..., 2]) > 0.2
        sel = both & frontal
        assert sel.sum() > 20, rec
        p95 = np.percentile(derr[sel], 95)
        assert p95 < 1e-3, f"{rec}: production-arch p95 depth err {p95:.2e}"
