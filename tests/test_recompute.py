"""Fused recompute kernel (ops/pallas/recompute.py): value/derivative
parity vs the XLA precise path and gradient parity vs fp32 autodiff.

Runs in interpret mode on the forced-CPU test backend (conftest.py) —
the kernel auto-selects interpret off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import (
    decoder_apply, init_decoder_params,
)
from dist_renderer_tpu.ops.pallas.recompute import make_precise_sdg


def _setup(dcfg, n=300, seed=0):
    kp, kz, kx = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = init_decoder_params(kp, dcfg)
    latent = 0.3 * jax.random.normal(kz, (dcfg.latent_size,))
    pts = 0.8 * jax.random.normal(kx, (n, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, latent, pts, dirs


ARCHS = [
    DecoderConfig(latent_size=32, hidden_dims=(64,) * 8, latent_in=(4,)),
    DecoderConfig(latent_size=16, hidden_dims=(48,) * 4, latent_in=(2,),
                  xyz_in_all=True),
    DecoderConfig(latent_size=16, hidden_dims=(48,) * 4, latent_in=(2,),
                  use_tanh=True),
]


@pytest.mark.parametrize("dcfg", ARCHS)
def test_value_matches_precise_xla(dcfg):
    params, latent, pts, dirs = _setup(dcfg)
    sdg = make_precise_sdg(params, dcfg, block=128)
    s, dd, g = jax.jit(sdg)(latent, pts, dirs)
    if not dcfg.xyz_in_all:
        # every input-consuming matmul is bf16x3-split in both paths:
        # agreement to split residual + fold-order differences
        ref = decoder_apply(params, latent, pts, dcfg, precision="split_x")
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref),
                                   rtol=0, atol=2e-5)
    # vs fp32 exact: bounded by the single-bf16-pass hidden layers (the
    # kernel splits x everywhere, so it is never LESS precise than the
    # XLA split_x path)
    ref32 = decoder_apply(params, latent, pts, dcfg)
    err = np.abs(np.asarray(s) - np.asarray(ref32))
    # p99 at single-bf16-pass level; the tail is ReLU-flip sensitivity
    # of the random-init net (same tail split_x shows — decoder.py docs)
    assert np.quantile(err, 0.99) < 8e-3
    assert err.max() < 5e-2


@pytest.mark.parametrize("dcfg", ARCHS)
def test_gradient_and_dd_match_fp32_autodiff(dcfg):
    """Per-point derivative tolerance note: bf16-gated chains (this
    kernel AND the production jvp/vjp path) differ from fp32 autodiff
    discretely wherever a preactivation sits within bf16 noise of zero
    (a ReLU flip) — with a random-init net that's a fat per-point tail.
    The contract is therefore quantile-based, plus a head-to-head
    showing the kernel's dd error is no worse than the production jvp's
    (whose gates come from the noisier single-bf16-pass march fn)."""
    params, latent, pts, dirs = _setup(dcfg)
    sdg = make_precise_sdg(params, dcfg, block=128)
    s, dd, g = jax.jit(sdg)(latent, pts, dirs)

    g_ref = jax.grad(
        lambda p: jnp.sum(decoder_apply(params, latent, p, dcfg))
    )(pts)
    dd_ref = jnp.sum(g_ref * dirs, axis=-1)
    gn = np.asarray(g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12))
    rn = np.asarray(g_ref / jnp.maximum(jnp.linalg.norm(g_ref, axis=-1, keepdims=True), 1e-12))
    cos = np.sum(gn * rn, axis=-1)
    assert np.median(cos) > 0.9999
    assert np.quantile(cos, 0.05) > 0.98

    scale = np.maximum(np.abs(np.asarray(dd_ref)), 1e-2)
    relerr = np.abs(np.asarray(dd) - np.asarray(dd_ref)) / scale
    assert np.median(relerr) < 2e-2
    assert np.quantile(relerr, 0.9) < 0.4  # flip tail; head-to-head below
                                           # is the binding constraint

    # head-to-head vs the production denominator (jvp through the bf16
    # folded march fn): the kernel must not be worse
    from dist_renderer_tpu.models.folded import make_point_fn

    pf = make_point_fn(params, latent, dcfg, jnp.bfloat16)
    _, dd_prod = jax.jvp(pf, (pts,), (dirs,))
    relerr_prod = np.abs(np.asarray(dd_prod) - np.asarray(dd_ref)) / scale
    assert np.median(relerr) <= np.median(relerr_prod) * 1.5 + 1e-3


@pytest.mark.parametrize("dcfg", ARCHS)
def test_custom_vjp_matches_fp32_autodiff(dcfg):
    """Aggregated (gz, gp) from the backward kernel vs fp32 autodiff,
    with the production custom_vjp (bf16 XLA backward) as the yardstick:
    the kernel's error must be no worse."""
    params, latent, pts, dirs = _setup(dcfg, n=200)
    from dist_renderer_tpu.models.decoder import make_precise_sdf

    sdg = make_precise_sdg(params, dcfg, block=128)
    prod = make_precise_sdf(params, dcfg)
    w = jax.random.normal(jax.random.PRNGKey(7), (pts.shape[0],))

    gz, gp = jax.jit(jax.grad(
        lambda z, p: jnp.sum(w * sdg(z, p, dirs)[0]), argnums=(0, 1)
    ))(latent, pts)
    gz_p, gp_p = jax.grad(
        lambda z, p: jnp.sum(w * prod(z, p)), argnums=(0, 1)
    )(latent, pts)
    gz_r, gp_r = jax.grad(
        lambda z, p: jnp.sum(w * decoder_apply(params, z, p, dcfg)),
        argnums=(0, 1),
    )(latent, pts)

    def rel(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

    assert rel(gz, gz_r) <= rel(gz_p, gz_r) * 1.5 + 1e-3
    assert rel(gp, gp_r) <= rel(gp_p, gp_r) * 1.5 + 1e-3
    cz = np.dot(np.asarray(gz).ravel(), np.asarray(gz_r).ravel()) / (
        np.linalg.norm(gz) * np.linalg.norm(gz_r) + 1e-12)
    assert cz > 0.97


def test_padding_and_block_edges():
    dcfg = ARCHS[0]
    params, latent, pts, dirs = _setup(dcfg, n=130)  # not a block multiple
    sdg = make_precise_sdg(params, dcfg, block=128)
    s, dd, g = jax.jit(sdg)(latent, pts, dirs)
    assert s.shape == (130,) and g.shape == (130, 3)
    ref = decoder_apply(params, latent, pts, dcfg, precision="split_x")
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_renderer_pallas_recompute_matches_xla():
    """End-to-end render_rays with GradConfig.recompute='pallas' vs 'xla'
    on a fitted tiny decoder: same hits, depth/margins to precise-path
    tolerance, normals aligned, and latent/pose-relevant gradients agree
    to bf16-chain tolerance."""
    import dataclasses

    from dist_renderer_tpu.config import GradConfig, MarchConfig, RenderConfig
    from dist_renderer_tpu.models.analytic import torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import render_rays
    from dist_renderer_tpu.utils.losses import masked_l1

    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=300, batch=1024
    )
    img = 24
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=img * 1.2,
                            img_hw=(img, img))
    origins, dirs = pixel_rays(cam, img, img)
    sdf_fn = make_precise_sdf(params, dcfg)
    base = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=40, convergence_eps=2e-3,
                          depth_eps=5e-4),
        grad=GradConfig(mode="ift", compact_frac=2, compact_min=16),
        compute_dtype="bfloat16",
    )
    pal = dataclasses.replace(
        base, grad=dataclasses.replace(base.grad, recompute="pallas")
    )

    # jit like production render(): eager bf16 dots are unsupported on
    # the CPU backend (DotThunk), and render() is always jitted anyway
    rr = jax.jit(lambda z, cfg: render_rays(sdf_fn, z, origins, dirs, cfg),
                 static_argnums=1)
    out_x = rr(z0, base)
    out_p = rr(z0, pal)
    np.testing.assert_array_equal(np.asarray(out_x.mask),
                                  np.asarray(out_p.mask))
    hit = np.asarray(out_x.mask)
    assert hit.any() and not hit.all()
    np.testing.assert_allclose(np.asarray(out_x.min_sdf),
                               np.asarray(out_p.min_sdf), atol=2e-5)

    # ground truth: the same IFT composition with fp32 value + fp32
    # denominator. Both paths' denominators are bf16-gated estimates that
    # blow up on occasional grazing rays (value/eps-scaled excursions);
    # the pallas path's gates come from the PRECISE forward and must be
    # no worse than the xla path's (gates from the noisier bf16 march fn)
    d0 = out_x.trace.depth
    anchor = jnp.where(out_x.trace.hit, d0, out_x.trace.depth_at_min)
    p_surf = origins + anchor[:, None] * dirs
    s32 = decoder_apply(params, z0, p_surf, dcfg)
    _, dd32 = jax.jvp(
        lambda p: decoder_apply(params, z0, p, dcfg), (p_surf,), (dirs,)
    )
    denom = jnp.minimum(dd32, -base.grad.ift_min_denom)
    depth_ref = np.where(hit, np.asarray(d0 - s32 / denom), 0.0)
    err_x = np.abs(np.asarray(out_x.depth) - depth_ref)[hit]
    err_p = np.abs(np.asarray(out_p.depth) - depth_ref)[hit]
    # NOTE no absolute bound here: on this tiny 4x32 decoder the
    # split_x value itself carries ~1.6e-3 near-surface noise (both
    # paths identically); the production-arch absolute parity bar lives
    # in tests/test_parity.py. The contract here is head-to-head.
    assert np.quantile(err_p, 0.95) <= np.quantile(err_x, 0.95) * 1.2 + 1e-5
    assert err_p.max() <= err_x.max() * 1.2 + 1e-4

    nx, np_ = np.asarray(out_x.normal), np.asarray(out_p.normal)
    cos = (nx * np_).sum(-1)[hit]
    assert np.median(cos) > 0.999

    target = jnp.full((img * img,), 1.5)
    mask = jnp.ones((img * img,), bool)

    def loss(z, cfg):
        out = render_rays(sdf_fn, z, origins, dirs, cfg)
        return masked_l1(out.depth, target, mask) + 0.1 * jnp.mean(
            out.min_sdf ** 2
        )

    gx = jax.jit(jax.grad(lambda z: loss(z, base)))(z0)
    gp = jax.jit(jax.grad(lambda z: loss(z, pal)))(z0)

    # fp32 ground-truth gradient on the same fixed trace: the pallas
    # backward (precise-forward gates + exact bias-path gz) must be at
    # least as faithful as the xla bf16 vjp. Measured here: pallas
    # cos~0.9998/rel~2% vs xla cos~0.954/rel~30%.
    _sg = jax.lax.stop_gradient
    d0r = _sg(out_x.trace.depth)
    anchr = _sg(jnp.where(out_x.trace.hit, d0r, out_x.trace.depth_at_min))
    p_s0 = origins + anchr[:, None] * dirs
    _, ddr = jax.jvp(
        lambda p: decoder_apply(params, z0, p, dcfg), (p_s0,), (dirs,)
    )
    denr = _sg(jnp.minimum(ddr, -base.grad.ift_min_denom))

    def loss_ref(z):
        s32r = decoder_apply(params, z, p_s0, dcfg)
        depth = jnp.where(out_x.trace.hit, d0r - s32r / denr, 0.0)
        return masked_l1(depth, target, mask) + 0.1 * jnp.mean(s32r ** 2)

    gr = jax.jit(jax.grad(loss_ref))(z0)
    cos = lambda a, b: float(
        jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    rel = lambda a, b: float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
    assert cos(gp, gr) > 0.995
    assert rel(gp, gr) <= rel(gx, gr) + 1e-3


def test_pallas_recompute_composes_with_vmap():
    """Multi-view tasks vmap render_rays over views (tasks/multiview.py).
    Kernel-level check: sdg under vmap must equal the sequential stack
    bit-for-bit (pallas_call vmap batching). Renderer-level check:
    gradients through a vmapped pallas-recompute render are finite and
    nonzero. (A depth A/B against the xla path is NOT asserted per-view:
    the two denominators legitimately differ through bf16 gates —
    fidelity vs fp32 is covered by the e2e test above.)"""
    import dataclasses

    from dist_renderer_tpu.config import GradConfig, MarchConfig, RenderConfig
    from dist_renderer_tpu.models.analytic import torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import render_rays

    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=200, batch=1024
    )
    sdg = make_precise_sdg(params, dcfg, block=128)
    pts = 0.6 * jax.random.normal(jax.random.PRNGKey(2), (3, 50, 3))
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    sv, dv, gv = jax.jit(jax.vmap(lambda p, v: sdg(z0, p, v)))(pts, dirs)
    for i in range(3):
        si, di, gi = jax.jit(sdg)(z0, pts[i], dirs[i])
        np.testing.assert_array_equal(np.asarray(sv[i]), np.asarray(si))
        np.testing.assert_array_equal(np.asarray(gv[i]), np.asarray(gi))

    img = 16
    sdf_fn = make_precise_sdf(params, dcfg)
    cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=32, convergence_eps=2e-3,
                          depth_eps=5e-4),
        grad=GradConfig(mode="ift", recompute="pallas"),
        compute_dtype="bfloat16",
    )
    views = []
    for ang in (0.0, 1.2, 2.4):
        cam = Camera.looking_at(
            (2.0 * np.sin(ang), 0.3, -2.0 * np.cos(ang)),
            focal=img * 1.2, img_hw=(img, img),
        )
        views.append(pixel_rays(cam, img, img))
    o_s = jnp.stack([v[0] for v in views])
    v_s = jnp.stack([v[1] for v in views])

    def per_view(z):
        return jax.vmap(
            lambda o, v: render_rays(sdf_fn, z, o, v, cfg).depth
        )(o_s, v_s)

    g = jax.jit(jax.grad(lambda z: jnp.sum(per_view(z) ** 2)))(z0)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_pallas_recompute_composes_with_shard_map():
    """Ray-sharded fits (parallel/sharding.py) run the recompute inside
    shard_map; each shard runs the kernel on its local rays — results
    must equal the unsharded call exactly (rays are independent)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params = init_decoder_params(jax.random.PRNGKey(0), dcfg)
    latent = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (8,))
    sdg = make_precise_sdg(params, dcfg, block=128)
    n = 8 * 64
    pts = 0.6 * jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    sharded = jax.jit(shard_map(
        lambda p, v: sdg(latent, p, v),
        mesh=mesh,
        in_specs=(P("rays"), P("rays")),
        out_specs=(P("rays"), P("rays"), P("rays")),
        check_vma=False,  # pallas_call outputs carry no vma info
    ))
    s_sh, dd_sh, g_sh = sharded(pts, dirs)
    s, dd, g = jax.jit(lambda p, v: sdg(latent, p, v))(pts, dirs)
    np.testing.assert_array_equal(np.asarray(s_sh), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(dd_sh), np.asarray(dd))
    np.testing.assert_array_equal(np.asarray(g_sh), np.asarray(g))


def test_pallas_recompute_polish_iters():
    """polish_iters > 1 on the pallas path: full Newton refinements
    (fresh denominator per iteration) must converge the depth at least
    as tightly as one step, with gradients still flowing."""
    import dataclasses

    from dist_renderer_tpu.config import GradConfig, MarchConfig, RenderConfig
    from dist_renderer_tpu.models.analytic import torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import render_rays

    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=300, batch=1024
    )
    img = 20
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=img * 1.2,
                            img_hw=(img, img))
    origins, dirs = pixel_rays(cam, img, img)
    sdf_fn = make_precise_sdf(params, dcfg)

    def run(polish):
        # loose-eps march: the polish must close the gap
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(max_steps=40, convergence_eps=8e-3,
                              depth_eps=2e-3),
            grad=GradConfig(mode="ift", recompute="pallas",
                            polish_iters=polish),
            compute_dtype="bfloat16",
        )
        return jax.jit(
            lambda z: render_rays(sdf_fn, z, origins, dirs, cfg),
            )(z0)

    out1, out3 = run(1), run(3)
    hit = np.asarray(out1.mask)
    assert hit.any()
    p1 = np.asarray(out1.points)[hit]
    p3 = np.asarray(out3.points)[hit]
    s1 = np.abs(np.asarray(decoder_apply(params, z0, jnp.asarray(p1), dcfg)))
    s3 = np.abs(np.asarray(decoder_apply(params, z0, jnp.asarray(p3), dcfg)))
    # monotone acceptance: polish may never make ANY ray worse — in
    # particular FALSE hits (|f| < eps with no crossing, which a loose
    # 8e-3 march produces on grazing rays) must not diverge
    assert s3.max() <= s1.max() * 1.02 + 1e-6
    assert np.median(s3) <= np.median(s1) + 1e-5
    # distribution-level: more rays land on the fp32 surface after
    # extra Newton steps (per-ray monotonicity does not survive the
    # final differentiable step + bf16 acceptance noise)
    assert (s3 < 2e-3).mean() >= (s1 < 2e-3).mean()
    # the residual tail is false/grazing hits the 8e-3 march fabricates
    # (no crossing to converge to) — the point of this test is that they
    # are bounded (max assert above), not that they are polishable
    assert (s3 < 2e-3).mean() > 0.7
    g = jax.jit(jax.grad(lambda z: jnp.sum(render_rays(
        sdf_fn, z, origins, dirs,
        RenderConfig(img_h=img, img_w=img,
                     march=MarchConfig(max_steps=40, convergence_eps=8e-3,
                                       depth_eps=2e-3),
                     grad=GradConfig(mode="ift", recompute="pallas",
                                     polish_iters=3),
                     compute_dtype="bfloat16")).depth ** 2)))(z0)
    assert np.isfinite(np.asarray(g)).all()
