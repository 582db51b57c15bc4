"""Band-margin fidelity of verify_band='probe' vs 'march' on the BENCH
proxy (the production question; the toy test proxy's error is ~3x
larger). Also reports hit agreement and promoted/demoted accounting.

  python scripts/diag_band_fidelity.py [--img 512] [--frames 8] [--cpu]
"""

import argparse
import os
import sys

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
    print(f"bench proxy err: {meta}")

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

    def run(**kw):
        fn = jax.jit(lambda l, o_, v_: render_batched_c2f(
            params, dcfg, l,
            jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
            jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
            (img, img), march, strides=(16, 4), coarse_steps=16,
            shared_origin=True, interpret=interp, proxy=proxy,
            proxy_backoff=pbo, proxy_band=pband, **kw,
        )[:3])
        d, h, ms = fn(lat, ob, vb)
        return np.asarray(d), np.asarray(h), np.asarray(ms)

    d_m, h_m, ms_m = run(verify_mode="march")
    d_p, h_p, ms_p = run(verify_mode="cert", verify_band="probe")

    agree = (h_m == h_p).mean()
    flips = int((h_m != h_p).sum())
    print(f"hit agreement {agree:.6f} ({flips} flips / {h_m.size})")
    mboth = ~h_m & ~h_p
    near = ms_m < pband
    sel = mboth & near
    if sel.any():
        dd = np.abs(ms_p[sel] - ms_m[sel])
        print(f"band rays {int(sel.sum())}: margin |probe-march| "
              f"p50 {np.median(dd):.2e} p95 {np.percentile(dd, 95):.2e} "
              f"max {dd.max():.2e}")
    hb = h_m & h_p
    de = np.abs(d_p - d_m)[hb]
    print(f"hit depth |probe-march| p50 {np.median(de):.2e} "
          f"p95 {np.percentile(de, 95):.2e} max {de.max():.2e}")


if __name__ == "__main__":
    main()
