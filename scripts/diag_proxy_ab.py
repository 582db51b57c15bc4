"""Cost attribution for the proxy pipeline at batch: time
render_batched_c2f under controlled ablations (one compiled fn each):

  full          — no proxy (the r3 baseline path)
  proxy         — proxy march + full-decoder verify (production)
  proxy-nv      — proxy march, verify SKIPPED (diagnostics only): the
                  delta vs `proxy` is the verify stage's true cost, the
                  delta vs `full` is the proxy march's true saving
  proxy-bN      — production verify, proxy_block=N (wide proxy blocks)

  python scripts/diag_proxy_ab.py [--frames 8] [--blocks 1024,2048]
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
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--blocks", default="1024,2048")
    ap.add_argument("--modes", default="full,march,nv",
                    help="comma list: full,march,hybrid,cert,certp,nv,"
                         "march-bN,hybrid-bN,cert-bN,nv-bN (N from "
                         "--blocks). hybrid = verify_mode='march' + "
                         "verify_band='probe' (seeded hit march, 3-probe "
                         "band)")
    ap.add_argument("--vcaps", default=None,
                    help="verify_round_caps, e.g. 1,3,8,24 (default None "
                         "= main round_caps)")
    ap.add_argument("--backoff", type=float, default=None,
                    help="override the meta-derived proxy_backoff (0 = "
                         "seed the hit-verify AT the proxy depth; pairs "
                         "with --vcaps 1,... — scripts/diag_verify_caps)")
    ap.add_argument("--cpu", action="store_true")
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
    proxy = load_proxy_npz("/root/repo/.bench_proxy.npz")
    meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
    pbo, pband = proxy_march_margins(meta, 2e-3) if meta else (0.015, 0.02)
    if args.backoff is not None:
        pbo = args.backoff

    img, F = args.img, args.frames
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    lat = jnp.stack([z0] * F) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(9), (F, dcfg.latent_size))
    ob = jnp.broadcast_to(o[None], (1,) + o.shape)
    vb = jnp.broadcast_to(v[None], (1,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True, c2f_strides=(16, 4),
                        c2f_coarse_steps=16)
    interp = jax.default_backend() != "tpu"

    def run(tag, **kw):
        fn = jax.jit(lambda l, o_, v_: render_batched_c2f(
            params, dcfg, l,
            jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
            jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
            (img, img), march, strides=(16, 4), coarse_steps=16,
            shared_origin=True, interpret=interp, **kw,
        )[:2])
        d, h = fn(lat, ob, vb)
        float(jnp.sum(d))
        t0 = time.perf_counter()
        for _ in range(3):
            d, h = fn(lat, ob, vb)
        jax.block_until_ready(d)
        float(jnp.sum(d))
        dt = (time.perf_counter() - t0) / 3 / F
        print(f"[{tag:12s}] {dt*1e3:7.2f} ms/frame "
              f"hits={int(np.asarray(h).sum())/F:.0f}", flush=True)

    pkw = dict(proxy=proxy, proxy_backoff=pbo, proxy_band=pband)
    if args.vcaps:
        pkw["verify_round_caps"] = tuple(
            int(c) for c in args.vcaps.split(","))
    modes = {
        "full": lambda: run("full"),
        "march": lambda: run("proxy-march", verify_mode="march", **pkw),
        "hybrid": lambda: run("hybrid", verify_mode="march",
                              verify_band="probe", **pkw),
        "cert": lambda: run("cert+bandm", verify_mode="cert", **pkw),
        "certp": lambda: run("cert+bandp", verify_mode="cert",
                             verify_band="probe", **pkw),
        "nv": lambda: run("proxy-nv", proxy_verify=False, **pkw),
    }
    for b in args.blocks.split(","):
        if not b:
            continue
        b = int(b)
        modes[f"march-b{b}"] = lambda b=b: run(
            f"march-b{b}", proxy_block=b, verify_mode="march", **pkw)
        modes[f"hybrid-b{b}"] = lambda b=b: run(
            f"hybrid-b{b}", proxy_block=b, verify_mode="march",
            verify_band="probe", **pkw)
        modes[f"cert-b{b}"] = lambda b=b: run(
            f"cert-b{b}", proxy_block=b, verify_mode="cert", **pkw)
        modes[f"nv-b{b}"] = lambda b=b: run(
            f"nv-b{b}", proxy_block=b, proxy_verify=False, **pkw)
    for m in args.modes.split(","):
        modes[m]()


if __name__ == "__main__":
    main()
