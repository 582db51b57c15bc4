"""Diagnose the proxy-march + verify-stage pipeline on the real TPU.

Prints, for proxy vs full at 512^2:
  - plan-key fractions (rim/interior/skip) from the (proxy) pyramid
  - verify-key fractions (seeded-hit / re-march / skip)
  - per-stage step-count sums (what the kernels actually pay)
  - hit counts + stage timings

  python scripts/diag_proxy.py [--img 512] [--frames 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scheduler", default="auto")
    ap.add_argument("--backoff", type=float, default=None,
                    help="override the meta-derived proxy_backoff (0 = "
                         "seed the hit-verify AT the proxy depth)")
    ap.add_argument("--vcaps", default=None,
                    help="verify_round_caps, e.g. 1,4,12")
    ap.add_argument("--band", default=None, choices=["march", "probe"],
                    help="verify_band mode (probe = hybrid)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.pretrain import load_params_npz
    from dist_renderer_tpu.models.proxy import (
        load_proxy_meta, load_proxy_npz, proxy_march_margins,
    )
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    dcfg = DecoderConfig()
    params, z0 = load_params_npz("/root/repo/.bench_decoder.npz")
    proxy, pcfg = load_proxy_npz("/root/repo/.bench_proxy.npz")
    meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
    pbo, pband = proxy_march_margins(meta, 2e-3) if meta else (0.015, 0.02)
    if args.backoff is not None:
        pbo = args.backoff
    vkw = {}
    if args.vcaps:
        vkw["verify_round_caps"] = tuple(
            int(c) for c in args.vcaps.split(","))
    if args.band:
        vkw["verify_band"] = args.band

    img, F = args.img, args.frames
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    lat = jnp.stack([z0] * F) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(9), (F, dcfg.latent_size))
    ob = jnp.broadcast_to(o[None], (1,) + o.shape)
    vb = jnp.broadcast_to(v[None], (1,) + v.shape)
    march = MarchConfig(
        max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
        coarse_to_fine=True, c2f_strides=(16, 4), c2f_coarse_steps=16,
        scheduler=args.scheduler,
    )
    interp = jax.default_backend() != "tpu"

    def run(tag, proxy_arg, **extra):
        fn = jax.jit(lambda l, o_, v_: render_batched_c2f(
            params, dcfg, l,
            jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
            jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
            (img, img), march, strides=(16, 4), coarse_steps=16,
            shared_origin=True, return_steps=True, return_last=True,
            proxy=proxy_arg, proxy_backoff=pbo, proxy_band=pband,
            scheduler=args.scheduler,
            interpret=interp, **{**vkw, **extra},
        ))
        out = fn(lat, ob, vb)
        float(jnp.sum(out[0]))  # arm the sync
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(lat, ob, vb)
        jax.block_until_ready(out[0])
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / 3 / F
        d, hit, msdf, steps, lastf, unres = out[:6]
        hit = np.asarray(hit)
        steps = np.asarray(steps)
        print(f"[{tag}] {dt*1e3:8.2f} ms/frame  hits={hit.sum()/F:.0f}  "
              f"unres={np.asarray(unres).sum()/F:.0f}  "
              f"steps sum/frame={steps.sum()/F:.0f} "
              f"mean={steps.mean():.2f} p99={np.percentile(steps,99):.0f}",
              flush=True)
        return out

    # diag pass (JIT'D — eager ops pay ~1 s tunnel latency each):
    # plan + verify key fractions, per-stage residency
    diag_fn = jax.jit(lambda l, o_, v_: render_batched_c2f(
        params, dcfg, l,
        jnp.broadcast_to(o_, (F,) + o.shape),
        jnp.broadcast_to(v_, (F,) + v.shape),
        (img, img), march, strides=(16, 4), coarse_steps=16,
        shared_origin=True, with_diag=True, proxy=(proxy, pcfg),
        proxy_backoff=pbo, proxy_band=pband,
        scheduler="rounds", interpret=interp, **vkw,
    )[-1])
    diag = diag_fn(lat, ob, vb)
    pk = np.asarray(diag["plan_key"])
    n = pk.size
    print(f"plan key (proxy pyramid): rim={np.mean(pk==0):.3f} "
          f"interior={np.mean(pk==1):.3f} skip={np.mean(pk==2):.3f}")
    vk = np.asarray(diag["verify_key"])
    print(f"verify key: re-march(band/unres)={np.mean(vk==0):.4f} "
          f"seeded-hit={np.mean(vk==1):.4f} skip={np.mean(vk==2):.4f}")
    for k_ in sorted(diag):
        if k_.endswith("block_residency"):
            r = np.asarray(diag[k_])
            print(f"  {k_}: blocks={r.size} residency sum={r.sum():.0f}")

    run("full ", None)
    run("proxy", (proxy, pcfg))
    # band-only verify (verify_hits="polish"): hits skip the seeded
    # confirmation march; the proxy-vs-polish delta is the seeded-hit
    # confirmation's cost, polish-vs-noverify is the band/unres re-march
    run("proxy-polish", (proxy, pcfg), verify_hits="polish")

    # polish trace + the batched full-decoder finalize IN ONE JIT — the
    # genuine polish-mode production step (what bench.py times)
    from dist_renderer_tpu.ops.renderer import finalize_hits_batched

    def _fin_step(l, o_, v_):
        of = jnp.broadcast_to(o_, (F,) + o_.shape[1:])
        vf = jnp.broadcast_to(v_, (F,) + v_.shape[1:])
        out = render_batched_c2f(
            params, dcfg, l, of, vf, (img, img), march,
            strides=(16, 4), coarse_steps=16, shared_origin=True,
            proxy=(proxy, pcfg), proxy_backoff=pbo, proxy_band=pband,
            scheduler=args.scheduler, interpret=interp,
            verify_hits="polish", **vkw)
        return finalize_hits_batched(
            params, dcfg, l, of, vf, out[0], out[1], out[2],
            convergence_eps=march.convergence_eps, polish_iters=2)

    try:
        fin = jax.jit(_fin_step)
        out = fin(lat, ob, vb)
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(3):
            out = fin(lat, ob, vb)
        jax.block_until_ready(out[0])
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / 3 / F
        print(f"[proxy-polish+finalize] {dt*1e3:8.2f} ms/frame  "
              f"hits={np.asarray(out[1]).sum()/F:.0f}", flush=True)
    except Exception as e:  # keep the remaining rows on a compile failure
        print(f"[proxy-polish+finalize] FAILED: {e}", flush=True)

    # polish-all: fine band rays skip their entry-seeded re-march too —
    # weak candidates polished from the proxy dip anchor. The delta vs
    # proxy-polish+finalize is the band re-march's cost net of the
    # slightly bigger finalize bucket
    def _fin_all_step(l, o_, v_):
        of = jnp.broadcast_to(o_, (F,) + o_.shape[1:])
        vf = jnp.broadcast_to(v_, (F,) + v_.shape[1:])
        out = render_batched_c2f(
            params, dcfg, l, of, vf, (img, img), march,
            strides=(16, 4), coarse_steps=16, shared_origin=True,
            proxy=(proxy, pcfg), proxy_backoff=pbo, proxy_band=pband,
            scheduler=args.scheduler, interpret=interp,
            verify_hits="polish-all", **vkw)
        return finalize_hits_batched(
            params, dcfg, l, of, vf, out[0], out[1], out[2],
            convergence_eps=march.convergence_eps, polish_iters=2,
            weak=out[3], compact_frac=3)

    try:
        fin_all = jax.jit(_fin_all_step)
        out = fin_all(lat, ob, vb)
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(3):
            out = fin_all(lat, ob, vb)
        jax.block_until_ready(out[0])
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / 3 / F
        print(f"[proxy-polish-all+finalize] {dt*1e3:8.2f} ms/frame  "
              f"hits={np.asarray(out[1]).sum()/F:.0f}", flush=True)
    except Exception as e:
        print(f"[proxy-polish-all+finalize] FAILED: {e}", flush=True)

    # UNVERIFIED proxy trace: the proxy-vs-noverify delta is the verify
    # stage's full cost (kernel + glue) at this F/scheduler — the number
    # the verify-cap sweeps are trying to shrink
    run("proxy-noverify", (proxy, pcfg), proxy_verify=False)


if __name__ == "__main__":
    main()
