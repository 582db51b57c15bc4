"""Performance decomposition on the real TPU: where do the milliseconds go?

Breaks the two bench workloads into phases and prints straggler telemetry
(per-kernel-block march residency from TraceResult.steps_per_ray), feeding
the optimization ladder in docs/PERFORMANCE.md.

  python scripts/diag_perf.py --img 512 --frames 8
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync_fetch(out):
    """Pull one scalar to the host — the only reliable sync here."""
    import jax.numpy as _jnp

    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(_jnp.sum(x))


def timeit(fn, *a, n=3):
    # hard host-fetch syncs: block_until_ready is a silent no-op until
    # the process's first device->host fetch (docs/PERFORMANCE.md)
    out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    return (time.perf_counter() - t0) / n, out


def residency_stats(name, res):
    r = np.asarray(res).astype(np.int64)
    tot = int(r.sum())
    print(
        f"  {name}: {r.size} blocks, residency sum={tot} "
        f"mean={r.mean():.1f} p50={np.percentile(r, 50):.0f} "
        f"p90={np.percentile(r, 90):.0f} max={r.max()} "
        f"zero-blocks={(r == 0).sum()}"
    )
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--strides", type=int, nargs="*", default=[4])
    ap.add_argument("--coarse-steps", type=int, default=24)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dist_renderer_tpu.config import DecoderConfig, GradConfig, MarchConfig, RenderConfig
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.folded import make_point_fn
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f
    from dist_renderer_tpu.ops.renderer import make_march_factory, render
    from dist_renderer_tpu.utils.losses import masked_l1

    img, F = args.img, args.frames
    dcfg = DecoderConfig()
    shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_decoder.npz")
    params, latent = get_or_fit_cached(cache, lambda p: shape(None, p), dcfg, steps=1500)

    march = MarchConfig(max_steps=args.steps, coarse_to_fine=True,
                        convergence_eps=2e-3, depth_eps=5e-4,
                        c2f_strides=tuple(args.strides),
                        c2f_coarse_steps=args.coarse_steps)
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img))
    origins, dirs = pixel_rays(cam, img, img)
    n = origins.shape[0]

    lat_b = jnp.stack([latent] * F) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(9), (F, dcfg.latent_size))
    ob = jnp.broadcast_to(origins[None], (F, n, 3))
    vb = jnp.broadcast_to(dirs[None], (F, n, 3))

    strides = tuple(args.strides)
    print(f"=== batched path: {F} frames, {img}^2, strides={strides}, "
          f"coarse_steps={args.coarse_steps} ===")
    fb = jax.jit(lambda l, o, v: render_batched_c2f(
        params, dcfg, l, o, v, (img, img), march,
        strides=strides, coarse_steps=args.coarse_steps))
    t_full, (d_b, hit_b, _) = timeit(fb, lat_b, ob, vb)
    mrays = F * n / t_full / 1e6
    print(f"full: {t_full*1e3:.1f} ms total = {t_full*1e3/F:.1f} ms/frame "
          f"-> {mrays:.2f} Mrays/s  (hit fraction "
          f"{float(jnp.mean(hit_b)):.3f})")

    # diag run (separate jit; telemetry outputs added)
    fbd = jax.jit(lambda l, o, v: render_batched_c2f(
        params, dcfg, l, o, v, (img, img), march,
        strides=strides, coarse_steps=args.coarse_steps, with_diag=True))
    _, (_, _, _, diag) = timeit(fbd, lat_b, ob, vb, n=1)
    tots = {}
    for k in sorted(diag):
        if k.endswith("_block_residency"):
            tots[k] = residency_stats(k, diag[k])
    for k in sorted(diag):
        if k.endswith("_ray_steps"):
            r = np.asarray(diag[k])
            print(f"  {k}: mean={r.mean():.2f} p50={np.percentile(r,50):.0f} "
                  f"p90={np.percentile(r,90):.0f} max={r.max()} "
                  f"zero-frac={(r==0).mean():.3f} eval_sum={int(r.sum())}")
    # implied per-block-step time if the kernel were the whole cost
    tot_res = sum(tots.values())
    if tot_res:
        print(f"  total block residency {tot_res} steps; full time implies "
              f"{t_full*1e6/tot_res:.2f} us/block-step")

    print(f"=== single-frame path: {img}^2 (bench latency config) ===")
    cfg = RenderConfig(img_h=img, img_w=img, march=march,
                       grad=GradConfig(mode="ift", compact_frac=4),
                       compute_dtype="bfloat16", use_pallas=not args.cpu)
    sdf_fn = make_precise_sdf(params, dcfg)
    factory = make_march_factory(params, dcfg, cfg)

    fwd = jax.jit(lambda z: render(sdf_fn, z, cam, cfg, factory).depth)
    t_fwd, _ = timeit(fwd, latent)
    print(f"fwd render: {t_fwd*1e3:.1f} ms")

    target = jnp.full((img, img), 1.5)
    masko = jnp.ones((img, img), bool)
    fwdbwd = jax.jit(lambda z: jax.value_and_grad(
        lambda zz: masked_l1(render(sdf_fn, zz, cam, cfg, factory).depth,
                             target, masko))(z))
    t_fb, _ = timeit(fwdbwd, latent)
    print(f"fwd+bwd: {t_fb*1e3:.1f} ms")

    # pieces
    from dist_renderer_tpu.ops.renderer import c2f_plan, _trace

    mf = factory(latent)
    planfn = jax.jit(lambda o, v: c2f_plan(mf, o, v, cfg))
    t_plan, plan = timeit(planfn, origins, dirs)
    print(f"c2f_plan (coarse trace + classify + sort): {t_plan*1e3:.1f} ms")

    perm = plan.order
    o_s, v_s = origins[perm], dirs[perm]
    id_s, ia_s = plan.init_depth[perm], plan.init_active[perm]
    tracefn = jax.jit(lambda o, v, idd, ia: _trace(mf, o, v, cfg, idd, ia).depth)
    t_tr, _ = timeit(tracefn, o_s, v_s, id_s, ia_s)
    print(f"fine trace (sorted, seeded): {t_tr*1e3:.1f} ms")

    p_surf = origins + jnp.ones((n, 1)) * dirs
    precfn = jax.jit(lambda z, p: sdf_fn(z, p))
    t_prec, _ = timeit(precfn, latent, p_surf)
    print(f"precise value eval (bf16x3 split, {n} pts): {t_prec*1e3:.1f} ms")

    vjpfn = jax.jit(lambda p: jax.vjp(mf, p)[1](jnp.ones((n,)))[0])
    t_vjp, _ = timeit(vjpfn, p_surf)
    print(f"march_fn vjp ({n} pts, normals+IFT denom): {t_vjp*1e3:.1f} ms")

    bwdfn = jax.jit(lambda z, p: jax.grad(
        lambda zz: jnp.sum(sdf_fn(zz, p)))(z))
    t_bwd, _ = timeit(bwdfn, latent, p_surf)
    print(f"precise-eval backward (z-grad, {n} pts): {t_bwd*1e3:.1f} ms")

    glue = t_fwd - t_plan - t_tr - t_prec - t_vjp
    print(f"unaccounted fwd glue: {glue*1e3:.1f} ms")


if __name__ == "__main__":
    main()
