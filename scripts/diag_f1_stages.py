"""Per-stage decomposition of the single-frame 512^2 render on the real
TPU, for the CURRENT graph:

  trace      — trace_frame only (coarse pyramid + classify + queue march)
  compose    — render_rays given a precomputed trace (recompute + scatters)
  fwd        — full render (depth + min_sdf outputs, bench.py's fwd)
  fwd+bwd    — depth-L1 loss -> latent grad

for each recompute mode requested (xla / pallas). The stage sum should
roughly reproduce fwd; the deltas locate the remaining latency.

  python scripts/diag_f1_stages.py [--img 512] [--modes xla,pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *a, n=8, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    x = out
    while isinstance(x, (tuple, list)):
        x = x[0]
    float(jnp.sum(jnp.asarray(x, jnp.float32)))  # arm the sync (CLAUDE.md)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        x = out
        while isinstance(x, (tuple, list)):
            x = x[0]
        float(jnp.sum(jnp.asarray(x, jnp.float32)))
        ts.append((time.perf_counter() - t0) / n)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--modes", default="xla,pallas")
    ap.add_argument("--proxy", action="store_true",
                    help="march the cached distilled proxy "
                         "(.bench_proxy.npz) — bench.py's default path")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from dist_renderer_tpu.config import (
        DecoderConfig, GradConfig, MarchConfig, RenderConfig,
    )
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import (
        make_march_factory, render, render_rays,
    )
    from dist_renderer_tpu.utils.losses import masked_l1

    img = args.img
    dcfg = DecoderConfig()
    shape = round_union(
        torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
    )
    params, z0 = get_or_fit_cached(
        "/root/repo/.bench_decoder.npz", lambda p: shape(None, p), dcfg,
        steps=1500,
    )
    on_tpu = (not args.cpu) and jax.devices()[0].platform != "cpu"
    cam = Camera.looking_at(
        (0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img)
    )
    origins, dirs = pixel_rays(cam, img, img)
    target = jnp.full((img, img), 1.5)
    mask = jnp.ones((img, img), bool)
    sdf_fn = make_precise_sdf(params, dcfg)
    print(f"device: {jax.devices()[0]}", flush=True)

    base = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(
            max_steps=50, coarse_to_fine=True, use_compaction=not on_tpu,
            convergence_eps=2e-3, depth_eps=5e-4,
            c2f_strides=(16, 4), c2f_coarse_steps=16,
        ),
        grad=GradConfig(mode="ift", compact_frac=4),
        compute_dtype="bfloat16",
        use_pallas=on_tpu,
    )
    pkw = {}
    if args.proxy:
        import dataclasses as _dc0

        from dist_renderer_tpu.models.proxy import (
            load_proxy_meta, load_proxy_npz, proxy_march_margins,
        )
        pparams, pcfg = load_proxy_npz("/root/repo/.bench_proxy.npz")
        pkw = dict(march_params=pparams, march_dcfg=pcfg)
        meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
        if meta is not None:
            bo, band = proxy_march_margins(meta,
                                           base.march.convergence_eps)
            base = _dc0.replace(base, march=_dc0.replace(
                base.march, proxy_backoff=bo, proxy_band=band))
    factory = make_march_factory(params, dcfg, base, **pkw)
    march_fn = factory(z0)

    # stage: coarse pyramid + classify + plan alone (the pre-march XLA
    # glue verdict r3 weak-#2 wants folded into the megakernel) — the
    # same assembly render_batched_c2f runs before its fine stage
    if on_tpu:
        import dataclasses as _dc2

        from dist_renderer_tpu.ops.c2f import classify_pyramid, plan_from_maps
        from dist_renderer_tpu.ops.pallas.batched_march import (
            batched_trace_padded, fold_bias_bank, pack_shared,
        )

        mm = base.march
        mp, md = (pparams, pcfg) if args.proxy else (params, dcfg)
        shared_m = pack_shared(mp, md)
        coarse_m = _dc2.replace(mm, max_steps=min(mm.max_steps, 16))

        @jax.jit
        def pyr(z, o, v):
            bank_m = fold_bias_bank(mp, z[None], md, shared_m)

            def trace_level(o_l, v_l, seed, active, stride):
                return batched_trace_padded(
                    shared_m, bank_m, o_l, v_l, coarse_m, seed, active,
                    512, False, True)

            maps = classify_pyramid(
                trace_level, o.reshape(1, img, img, 3),
                v.reshape(1, img, img, 3), (16, 4), mm.c2f_backoff)
            return plan_from_maps(maps)

        t_pyr = timeit(lambda: pyr(z0, origins, dirs)[0])
        print(f"pyramid+classify+plan alone:    {t_pyr*1e3:7.2f} ms",
              flush=True)

    # stage: trace only
    if on_tpu and hasattr(march_fn, "trace_frame"):
        trace_fn = jax.jit(lambda o, v: march_fn.trace_frame(
            o, v, base.march, (img, img)))
        t_trace = timeit(lambda: trace_fn(origins, dirs).depth)
        print(f"trace (pyramid+classify+march): {t_trace*1e3:7.2f} ms",
              flush=True)
        trace0 = jax.tree_util.tree_map(
            jax.lax.stop_gradient, trace_fn(origins, dirs))
    else:
        trace0 = None
        print("trace_frame unavailable (not on TPU) — skipping stage",
              flush=True)

    for name in args.modes.split(","):
        cfg = dataclasses.replace(
            base, grad=dataclasses.replace(base.grad, recompute=name)
        )
        factory_m = make_march_factory(params, dcfg, cfg)

        if trace0 is not None:
            comp = jax.jit(lambda z, tr: (
                lambda out: (out.depth, out.min_sdf)
            )(render_rays(sdf_fn, z, origins, dirs, cfg,
                          march_fn=march_fn, trace=tr)))
            t_comp = timeit(lambda: comp(z0, trace0))
            print(f"{name:7s} compose (given trace):  {t_comp*1e3:7.2f} ms",
                  flush=True)

        fwd = jax.jit(lambda z: (
            lambda out: (out.depth, out.min_sdf)
        )(render(sdf_fn, z, cam, cfg, factory_m)))
        t_fwd = timeit(lambda: fwd(z0))

        fwdbwd = jax.jit(lambda z: jax.value_and_grad(
            lambda zz: masked_l1(
                render(sdf_fn, zz, cam, cfg, factory_m).depth, target, mask)
        )(z))
        t_fb = timeit(lambda: fwdbwd(z0)[1])
        print(f"{name:7s} fwd {t_fwd*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
