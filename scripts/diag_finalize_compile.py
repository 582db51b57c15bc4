"""Isolate the r5 batch-#2 compile failure: trace+finalize in one jit
(bench.py's polish batched headline) reproducibly got HTTP 500 from the
remote compile helper at F=64/512^2, while the trace-only module and the
single-frame polish graphs compiled fine.

Stages, each its own jit so the failing module is identified:
  1. finalize_hits_batched ALONE on synthetic trace outputs (F, 512^2)
  2. trace ALONE (the bench batched graph, verify_hits="polish")
  3. trace + finalize COMBINED (what bench.py times under polish)

Run on the real chip: python scripts/diag_finalize_compile.py --img 512 --frames 64
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip", default="",
                    help="comma list of stages to skip (finalize,trace,combined)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    skip = set(s for s in args.skip.split(",") if s)

    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.proxy import (
        load_proxy_npz, load_proxy_meta, proxy_march_margins,
    )
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f
    from dist_renderer_tpu.ops.renderer import finalize_hits_batched

    img, F = args.img, args.frames
    dcfg = DecoderConfig()
    target = round_union(torus_sdf(0.6, 0.25), sphere_sdf(0.45), k=8.0)
    params, lat0 = get_or_fit_cached(
        os.path.join(repo, ".bench_decoder.npz"), target, dcfg)
    proxy, pcfg = load_proxy_npz(os.path.join(repo, ".bench_proxy.npz"))
    march = MarchConfig(max_steps=args.steps)
    meta = load_proxy_meta(os.path.join(repo, ".bench_proxy.npz"))
    pbo, pband = proxy_march_margins(meta, march.convergence_eps)

    cam = Camera.looking_at((0.9, 0.65, -1.9), focal=float(img) * 1.2,
                            img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    ob = jnp.broadcast_to(o[None], (1,) + o.shape)
    vb = jnp.broadcast_to(v[None], (1,) + v.shape)
    lat = jnp.broadcast_to(lat0[None], (F, dcfg.latent_size)) + 0.001 * \
        jax.random.normal(jax.random.PRNGKey(9), (F, dcfg.latent_size))
    n = img * img

    def timed(tag, fn, *a):
        t0 = time.perf_counter()
        try:
            out = fn(*a)
            jax.block_until_ready(out)
            float(jnp.sum(out[0]))
        except Exception as e:
            print(f"[{tag}] FAILED after {time.perf_counter()-t0:.1f}s: "
                  f"{str(e)[:300]}", flush=True)
            return None
        print(f"[{tag}] compiled+ran in {time.perf_counter()-t0:.1f}s",
              flush=True)
        return out

    def trace(l, o_, v_, verify_hits="polish"):
        of = jnp.broadcast_to(o_, (F,) + o_.shape[1:])
        vf = jnp.broadcast_to(v_, (F,) + v_.shape[1:])
        return render_batched_c2f(
            params, dcfg, l, of, vf, (img, img), march,
            strides=(16, 4), coarse_steps=16, shared_origin=True,
            proxy=(proxy, pcfg), proxy_backoff=pbo, proxy_band=pband,
            verify_hits=verify_hits,
            verify_round_caps=march.proxy_verify_caps,
            proxy_block=march.proxy_block_width,
            interpret=jax.default_backend() != "tpu")

    def fin(l, o_, v_, d, h, m):
        of = jnp.broadcast_to(o_, (F,) + o_.shape[1:])
        vf = jnp.broadcast_to(v_, (F,) + v_.shape[1:])
        return finalize_hits_batched(
            params, dcfg, l, of, vf, d, h, m,
            convergence_eps=march.convergence_eps, polish_iters=2)

    # synthetic trace outputs: plausible hit fraction + depths
    key = jax.random.PRNGKey(0)
    h_syn = jax.random.uniform(key, (F, n)) < 0.21
    d_syn = jnp.where(h_syn, 1.7 + 0.1 * jax.random.normal(key, (F, n)), 10.0)
    m_syn = jnp.where(h_syn, 1e-3, 0.3).astype(jnp.float32)

    if "finalize" not in skip:
        timed("finalize-alone", jax.jit(fin), lat, ob, vb, d_syn, h_syn, m_syn)
    tr = None
    if "trace" not in skip:
        tr = timed("trace-alone", jax.jit(trace), lat, ob, vb)
    if "combined" not in skip:
        comb = jax.jit(lambda l, o_, v_: fin(l, o_, v_, *trace(l, o_, v_)[:3]))
        out = timed("combined", comb, lat, ob, vb)
        if out is not None:
            # steady-state timing for the bench-style step
            t0 = time.perf_counter()
            for _ in range(3):
                out = comb(lat, ob, vb)
            jax.block_until_ready(out[0])
            float(jnp.sum(out[0]))
            dt = (time.perf_counter() - t0) / 3 / F
            print(f"[combined] {dt*1e3:8.2f} ms/frame  "
                  f"hits={np.asarray(out[1]).sum()/F:.0f}", flush=True)
        if tr is not None:
            # two-dispatch alternative: trace jit + finalize jit
            jt, jf = jax.jit(trace), jax.jit(fin)
            def two(l, o_, v_):
                d, h, m = jt(l, o_, v_)[:3]
                return jf(l, o_, v_, d, h, m)
            out = two(lat, ob, vb)
            jax.block_until_ready(out[0]); float(jnp.sum(out[0]))
            t0 = time.perf_counter()
            for _ in range(3):
                out = two(lat, ob, vb)
            jax.block_until_ready(out[0]); float(jnp.sum(out[0]))
            dt = (time.perf_counter() - t0) / 3 / F
            print(f"[two-dispatch] {dt*1e3:8.2f} ms/frame  "
                  f"hits={np.asarray(out[1]).sum()/F:.0f}", flush=True)

    if "polish-all" not in skip:
        # production structure (bench.py): trace jit + ONE single-frame
        # finalize jit dispatched per frame with a traced index — the
        # F-wide finalize module is uncompilable on this service
        jt_all = jax.jit(lambda l, o_, v_: trace(l, o_, v_, "polish-all"))

        @jax.jit
        def fin1(l_all, o1, v1, d_all, h_all, m_all, w_all, i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i, 1, 0)
            return finalize_hits_batched(
                params, dcfg, sl(l_all), o1, v1,
                sl(d_all), sl(h_all), sl(m_all),
                convergence_eps=march.convergence_eps, polish_iters=2,
                compact_frac=3, weak=sl(w_all))

        def comb_all(l, o_, v_):
            t = jt_all(l, o_, v_)
            outs = [fin1(l, o_[:1], v_[:1], t[0], t[1], t[2], t[3],
                         np.int32(i)) for i in range(F)]
            return (jnp.concatenate([u[0] for u in outs]),
                    jnp.concatenate([u[1] for u in outs]))

        out = timed("combined-polish-all", comb_all, lat, ob, vb)
        if out is not None:
            t0 = time.perf_counter()
            for _ in range(3):
                out = comb_all(lat, ob, vb)
            jax.block_until_ready(out[0])
            float(jnp.sum(out[0]))
            dt = (time.perf_counter() - t0) / 3 / F
            print(f"[combined-polish-all] {dt*1e3:8.2f} ms/frame  "
                  f"hits={np.asarray(out[1]).sum()/F:.0f}", flush=True)
            # hardware parity vs the march-verify trace (the exactness
            # anchor for batched verdicts): flips + common-hit deltas
            ref = jax.jit(
                lambda l, o_, v_: trace(l, o_, v_, "march"))(lat, ob, vb)
            rh = np.asarray(ref[1]); ph = np.asarray(out[1])
            rd = np.asarray(ref[0]); pd = np.asarray(out[0])
            rm = np.abs(np.asarray(ref[2]))
            flips = rh != ph
            both = rh & ph
            dd_ = np.abs(rd - pd)[both]
            if dd_.size == 0:
                dd_ = np.zeros(1)
            print(f"[parity polish-all vs march] flips={flips.sum()} "
                  f"({flips.mean():.5f})  flip|msdf|max="
                  f"{rm[flips].max() if flips.any() else 0:.2e}  "
                  f"common-hit depth delta med={np.median(dd_):.2e} "
                  f"p95={np.percentile(dd_, 95):.2e} max={dd_.max():.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
