"""Decompose the COMPOSE stage (render_rays given a precomputed trace)
into its glue + kernel pieces on the real TPU — round-5 item #2: compose
was ~10.2 ms of the 25.5 ms single-frame fwd (r3 stage split) and has
never been itemized.

Pieces timed separately (each its own jit, fed the same real trace):
  sort      — hit-first lax.sort (key + pix payload) over [N]
  gather    — bucket takes of dirs/d0/anchor/hit (+origins unless shared)
  sdg       — the fused recompute kernel alone at the bucket width
  scatter   — fused depth+normal scatter + the min_sdf margin scatter
  margin    — p_anchor compute + lazy_margin forward (full width)
  compose   — the real render_rays(trace=...) fwd (depth+min_sdf outputs)
  compose-d — same but only depth consumed (margin path pruned?)
  bwd       — value_and_grad of a depth L1 through compose

  python scripts/diag_compose.py [--img 512] [--proxy]
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


def timeit(fn, *a, n=10, reps=3):
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
    ap.add_argument("--proxy", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses as _dc

    from dist_renderer_tpu.config import (
        DecoderConfig, GradConfig, MarchConfig, RenderConfig,
    )
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.models.analytic import (
        round_union, sphere_sdf, torus_sdf,
    )
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import (
        make_march_factory, render_rays,
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
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))
    origins, dirs = pixel_rays(cam, img, img)
    n = origins.shape[0]
    sdf_fn = make_precise_sdf(params, dcfg)
    print(f"device: {jax.devices()[0]}", flush=True)

    cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(
            max_steps=50, coarse_to_fine=True, use_compaction=not on_tpu,
            convergence_eps=2e-3, depth_eps=5e-4,
            c2f_strides=(16, 4), c2f_coarse_steps=16,
        ),
        grad=GradConfig(mode="ift", compact_frac=4, recompute="pallas"),
        compute_dtype="bfloat16",
        use_pallas=on_tpu,
    )
    pkw = {}
    if args.proxy:
        from dist_renderer_tpu.models.proxy import (
            load_proxy_meta, load_proxy_npz, proxy_march_margins,
        )
        pparams, pcfg = load_proxy_npz("/root/repo/.bench_proxy.npz")
        pkw = dict(march_params=pparams, march_dcfg=pcfg)
        meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
        if meta is not None:
            bo, band = proxy_march_margins(meta, cfg.march.convergence_eps)
            cfg = _dc.replace(cfg, march=_dc.replace(
                cfg.march, proxy_backoff=bo, proxy_band=band))
    factory = make_march_factory(params, dcfg, cfg, **pkw)
    march_fn = factory(z0)

    # per-jit-call dispatch floor on this deployment (tunnel RPC + host
    # glue): every standalone piece below pays this once — subtract it
    # before attributing piece cost, and treat pieces as upper bounds
    # (inside ONE jit XLA overlaps/fuses them)
    @jax.jit
    def piece_noop(x):
        return x + 1.0

    tiny = jnp.zeros((8,), jnp.float32)
    t = timeit(lambda: piece_noop(tiny))
    print(f"  noop jit (dispatch floor): {t*1e3:7.2f} ms", flush=True)

    # one real trace, stop-gradient, reused by every piece
    trace_fn = jax.jit(lambda o, v: march_fn.trace_frame(
        o, v, cfg.march, (img, img)))
    t_trace = timeit(lambda: trace_fn(origins, dirs).depth)
    print(f"trace                      : {t_trace*1e3:7.2f} ms", flush=True)
    trace0 = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                    trace_fn(origins, dirs))
    n_hit = int(jnp.sum(trace0.hit))
    bucket = min(((n // 4 + 511) // 512) * 512, n)
    print(f"rays {n}  hits {n_hit} ({100*n_hit/n:.1f}%)  bucket {bucket}",
          flush=True)

    d0 = trace0.depth
    anchor = jnp.where(trace0.hit, d0, trace0.depth_at_min)

    # ---- piece: hit-first sort
    @jax.jit
    def piece_sort(hit):
        key = (~hit).astype(jnp.int32)
        pix = jnp.arange(n, dtype=jnp.int32)
        _, pix_s = jax.lax.sort((key, pix), dimension=0, num_keys=1,
                                is_stable=True)
        return pix_s[:bucket]

    t = timeit(lambda: piece_sort(trace0.hit))
    print(f"  sort (hit-first, [N])    : {t*1e3:7.2f} ms", flush=True)

    # ---- piece: 2-class counting sort (the production path since r5)
    from dist_renderer_tpu.ops.binning import counting_sort_perm

    @jax.jit
    def piece_csort(hit):
        return counting_sort_perm((~hit).astype(jnp.int32), 2)[0][:bucket]

    t = timeit(lambda: piece_csort(trace0.hit))
    print(f"  csort (2-class counting) : {t*1e3:7.2f} ms", flush=True)

    # ---- piece: packed single-array sort (key<<20 | pix in ONE int32 —
    # no payload lanes to move through the sort network; pix < 2^20 at
    # any production frame size, key is 1 bit)
    @jax.jit
    def piece_packsort(hit):
        packed = ((~hit).astype(jnp.int32) << 20) | jnp.arange(
            n, dtype=jnp.int32)
        return (jax.lax.sort(packed, dimension=0)[:bucket]
                & ((1 << 20) - 1))

    t = timeit(lambda: piece_packsort(trace0.hit))
    print(f"  packsort (1-array, [N])  : {t*1e3:7.2f} ms", flush=True)

    # ---- piece: static-size nonzero (cumsum + scatter of hit indices
    # only; order-preserving, same hit-first-prefix contract)
    @jax.jit
    def piece_nonzero(hit):
        return jnp.nonzero(hit, size=bucket, fill_value=n)[0]

    t = timeit(lambda: piece_nonzero(trace0.hit))
    print(f"  nonzero (size=bucket)    : {t*1e3:7.2f} ms", flush=True)
    idx_b = piece_sort(trace0.hit)

    # ---- piece: bucket gathers
    @jax.jit
    def piece_gather(idx):
        take = lambda a: jnp.take(a, idx, axis=0)
        return (take(origins), take(dirs), take(d0), take(anchor),
                take(trace0.hit))

    t = timeit(lambda: piece_gather(idx_b))
    print(f"  gathers (5 fields)       : {t*1e3:7.2f} ms", flush=True)
    o_b, v_b, d_b, a_b, h_b = piece_gather(idx_b)

    # ---- piece: the fused sdg kernel alone at bucket width
    sdg = sdf_fn.sdg_builder(cfg.grad.recompute_block)
    anch_b = jnp.where(h_b, d_b, a_b)
    p_b = o_b + anch_b[:, None] * v_b

    @jax.jit
    def piece_sdg(z, p, v):
        return sdg(z, p, v)[0]

    t = timeit(lambda: piece_sdg(z0, p_b, v_b))
    print(f"  sdg kernel @ bucket      : {t*1e3:7.2f} ms", flush=True)

    # ---- piece: scatters (fused depth+normal + min_sdf margin scatter)
    db = jnp.ones((bucket,), jnp.float32)
    nb = jnp.ones((bucket, 3), jnp.float32)
    sb = jnp.ones((bucket,), jnp.float32)
    ms_full = trace0.min_sdf

    @jax.jit
    def piece_scatter(idx, d_b_, n_b_, s_b_):
        base = jnp.concatenate([
            jnp.zeros((1, n), d_b_.dtype), jnp.zeros((3, n), n_b_.dtype),
        ])
        vals = jnp.concatenate([d_b_[None], n_b_.T], axis=0)
        outp = base.at[:, idx].set(vals)
        min_sdf = ms_full.at[idx].set(s_b_)
        return outp[0], min_sdf, outp[1:4].T

    t = timeit(lambda: piece_scatter(idx_b, db, nb, sb))
    print(f"  scatters (4ch + margin)  : {t*1e3:7.2f} ms", flush=True)

    # ---- piece: margin forward (p_anchor at full width)
    @jax.jit
    def piece_margin(a_):
        p_anchor = origins + a_[:, None] * dirs
        return p_anchor

    t = timeit(lambda: piece_margin(anchor))
    print(f"  margin p_anchor [N,3]    : {t*1e3:7.2f} ms", flush=True)

    # ---- the real compose, both output sets
    comp = jax.jit(lambda z, tr: (
        lambda out: (out.depth, out.min_sdf)
    )(render_rays(sdf_fn, z, origins, dirs, cfg, march_fn=march_fn,
                  trace=tr)))
    t_comp = timeit(lambda: comp(z0, trace0))
    print(f"compose (depth+min_sdf)    : {t_comp*1e3:7.2f} ms", flush=True)

    comp_d = jax.jit(lambda z, tr: render_rays(
        sdf_fn, z, origins, dirs, cfg, march_fn=march_fn, trace=tr).depth)
    t_comp_d = timeit(lambda: comp_d(z0, trace0))
    print(f"compose (depth only)       : {t_comp_d*1e3:7.2f} ms", flush=True)

    # ---- bwd through compose only (trace fixed)
    target = jnp.full((n,), 1.5)
    mask = jnp.ones((n,), bool)

    fb = jax.jit(lambda z, tr: jax.value_and_grad(
        lambda zz: masked_l1(
            render_rays(sdf_fn, zz, origins, dirs, cfg, march_fn=march_fn,
                        trace=tr).depth, target, mask))(z))
    t_fb = timeit(lambda: fb(z0, trace0)[1])
    print(f"compose fwd+bwd (depth L1) : {t_fb*1e3:7.2f} ms "
          f"(bwd alone ~ {((t_fb-t_comp_d)*1e3):.2f})", flush=True)


if __name__ == "__main__":
    main()
