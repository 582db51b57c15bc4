"""Task (e): batched category-scale rendering — many latents x many views
(BASELINE.json config #5, the throughput stretch: 1k latents x 16 views at
512^2). Latent/view axes shard over the device mesh; each frame's rays can
additionally shard over a "rays" axis (SURVEY.md §2 parallelism table).

On one chip this streams (latent, view) pairs through the fast render
path; on a mesh it uses parallel.sharding.

  python -m dist_renderer_tpu.tasks.batched_render --latents 16 --views 4 --img 128
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.ops.camera import pixel_rays
from dist_renderer_tpu.ops.renderer import render_rays
from dist_renderer_tpu.tasks.common import (
    add_common_args, load_task_decoder, make_render_cfg, ring_cameras,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--latents", type=int, default=16)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--latent-noise", type=float, default=0.05)
    ap.add_argument("--pallas", action="store_true",
                    help="use the multi-frame fused kernel (TPU)")
    ap.add_argument("--stream", action="store_true",
                    help="config-#5 stretch scale: per-chunk on-device "
                         "summary reduction instead of materializing every "
                         "depth map (1k latents x 16 views at 512^2 is "
                         "16.8 GB of depth — past single-chip HBM)")
    ap.add_argument("--proxy", default=None,
                    help="path to a distilled proxy npz (models/proxy.py); "
                         "the march runs the proxy, a full-decoder verify "
                         "re-derives depth + hit in-pipeline")
    ap.add_argument("--scan", action="store_true",
                    help="with --stream: run the whole chunk loop ON DEVICE "
                         "(lax.map over chunk-reshaped latents inside one "
                         "jit) instead of a host loop of per-chunk "
                         "dispatches. The host loop pays an eager latent "
                         "slice + a dispatch round-trip per chunk over the "
                         "tunnel (r5: config #5 measured 36 ms/frame at "
                         "chunk=128 vs ~17 in the resident-args F=64 bench); "
                         "the scan is one dispatch for the entire run")
    ap.add_argument("--chunk", type=int, default=None,
                    help="frames per compiled launch on the --pallas path "
                         "(must be a multiple of --views; default: largest "
                         "views-multiple <= 128). The r5 config-#5 run at "
                         "512^2 measured 36 ms/frame at chunk=128 vs ~17 in "
                         "the F=64 bench — chunk is the first A/B knob")
    args = ap.parse_args(argv)

    params, base_latent, dcfg = load_task_decoder(args)
    cfg = make_render_cfg(args)
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    sdf_fn = make_precise_sdf(params, dcfg)

    cams = ring_cameras(args.img, args.views)
    rays = [pixel_rays(c, args.img, args.img) for c in cams]
    origins = jnp.stack([r[0] for r in rays])
    dirs = jnp.stack([r[1] for r in rays])

    latents = base_latent[None, :] + args.latent_noise * jax.random.normal(
        jax.random.PRNGKey(0), (args.latents, base_latent.shape[0])
    )

    n_dev = len(jax.devices())
    if n_dev > 1 and args.latents % n_dev == 0:
        # shard latents across the mesh (pure DP — no collectives)
        from dist_renderer_tpu.parallel.mesh import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(("latents",))
        latents = jax.device_put(latents, NamedSharding(mesh, P("latents")))

    if args.pallas:
        # multi-frame fused kernel: (latent, view) pairs become frames,
        # streamed in fixed-size chunks (one compiled program reused; 128
        # frames of 256^2 is the measured single-chip memory sweet spot)
        from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

        n_frames = args.latents * args.views
        # chunk must be a multiple of views: each chunk's frame i pairs
        # with view (i % views), so a chunk that straddles a latent
        # boundary mid-ring would pair frames with the WRONG cameras
        if args.chunk is not None:
            if args.chunk % args.views or n_frames % args.chunk:
                raise SystemExit(
                    f"--chunk {args.chunk} must be a multiple of --views "
                    f"({args.views}) dividing latents*views ({n_frames})")
            chunk = args.chunk
        else:
            chunk = min(128 - 128 % args.views if args.views <= 128
                        else args.views, n_frames)
            while chunk > args.views and n_frames % chunk:
                chunk -= args.views
        reps = (chunk + args.views - 1) // args.views

        proxy = None
        pbo, pband = cfg.march.proxy_backoff, cfg.march.proxy_band
        if args.proxy:
            from dist_renderer_tpu.models.proxy import (
                load_proxy_meta, load_proxy_npz, proxy_march_margins,
            )
            proxy = load_proxy_npz(args.proxy)
            # verify margins are a property of THIS proxy's measured error,
            # not config constants (same rule as bench.py)
            meta = load_proxy_meta(args.proxy)
            if meta:
                pbo, pband = proxy_march_margins(
                    meta, cfg.march.convergence_eps)

        # rays enter as ARGUMENTS and tile on device: baking the tiled
        # [chunk, N, 3] arrays into the graph as constants blows the
        # remote-compile service's request-size limit at 512^2 (HTTP 413)
        @jax.jit
        def render_chunk(lat_f, o_views, v_views):
            o_chunk = jnp.tile(o_views, (reps, 1, 1))[:chunk]
            v_chunk = jnp.tile(v_views, (reps, 1, 1))[:chunk]
            return render_batched_c2f(
                params, dcfg, lat_f, o_chunk, v_chunk,
                (args.img, args.img), cfg.march, proxy=proxy,
                proxy_backoff=pbo, proxy_band=pband,
                verify_mode=cfg.march.proxy_verify_mode,
                verify_band=cfg.march.proxy_verify_band,
                verify_hits=cfg.march.proxy_verify_hits,
                verify_round_caps=cfg.march.proxy_verify_caps,
                verify_gen_caps=cfg.march.proxy_verify_caps_queue,
                proxy_block=cfg.march.proxy_block_width,
                interpret=jax.default_backend() != "tpu",
            )[:2]

        if args.stream:
            # summary reduction per chunk (hit count + masked depth sum —
            # enough to prove every ray was rendered and sane) instead of
            # 16.8 GB of depth maps at the 1k x 16 x 512^2 stretch scale
            @jax.jit
            def render_chunk_summary(lat_f, o_views, v_views):
                d, h = render_chunk(lat_f, o_views, v_views)
                return (jnp.sum(jnp.where(h, d, 0.0)),
                        jnp.sum(h.astype(jnp.int32)))

            @jax.jit
            def render_stream_scan(lat_frames, o_views, v_views):
                lat_c = lat_frames.reshape(n_frames // chunk, chunk, -1)
                ds, hs = jax.lax.map(
                    lambda lc: render_chunk_summary(lc, o_views, v_views),
                    lat_c)
                return jnp.sum(ds, dtype=jnp.float64
                               if jax.config.jax_enable_x64
                               else jnp.float32), jnp.sum(hs)

            def render_batch(latents):
                if args.scan:
                    lat_frames = jnp.repeat(latents, args.views, axis=0)
                    ds, hs = render_stream_scan(lat_frames, origins, dirs)
                    return float(ds), int(hs)
                lat_frames = jnp.repeat(latents, args.views, axis=0)
                dsum = 0.0
                hits = 0
                pend_d, pend_h = [], []
                for ci, s in enumerate(range(0, n_frames, chunk)):
                    ds, hs = render_chunk_summary(
                        lat_frames[s:s + chunk], origins, dirs)
                    # keep dispatch ASYNC: a device->host fetch per chunk
                    # serializes the tunnel round-trip (~0.3-1.2 s) into
                    # every chunk; draining every 16 chunks bounds the
                    # dispatch queue while amortizing the sync
                    pend_d.append(ds)
                    pend_h.append(hs)
                    if len(pend_d) >= 16:
                        dsum += float(sum(pend_d))   # real sync
                        hits += int(sum(pend_h))
                        pend_d, pend_h = [], []
                if pend_d:
                    dsum += float(sum(pend_d))
                    hits += int(sum(pend_h))
                return dsum, hits
        else:
            def render_batch(latents):
                lat_frames = jnp.repeat(latents, args.views, axis=0)
                ds, hs = [], []
                for s in range(0, n_frames, chunk):
                    d, h = render_chunk(lat_frames[s:s + chunk], origins, dirs)
                    ds.append(d)
                    hs.append(h)
                d = jnp.concatenate(ds).reshape(args.latents, args.views, -1)
                h = jnp.concatenate(hs).reshape(args.latents, args.views, -1)
                return d, h
    else:
        @jax.jit
        def render_batch(latents):
            def one_latent(z):
                mf = make_point_fn(params, z, dcfg, cfg.dtype)

                def one_view(o, v):
                    out = render_rays(sdf_fn, z, o, v, cfg, mf)
                    return out.depth, out.mask

                return jax.vmap(one_view)(origins, dirs)

            return jax.vmap(one_latent)(latents)

    extra = {}
    if args.pallas and args.stream:
        # warm up on ONE chunk (compile + sync-arm); the timed region then
        # streams every chunk with a real per-chunk host fetch
        lat_frames = jnp.repeat(latents, args.views, axis=0)
        float(render_chunk_summary(lat_frames[:chunk], origins, dirs)[0])
        if args.scan:
            # AOT-compile the one-dispatch program so the timed region is
            # pure device time (running it once as warmup would BE the run)
            render_stream_scan.lower(lat_frames, origins, dirs).compile()
        t0 = time.perf_counter()
        dsum, hits = render_batch(latents)
        dt = time.perf_counter() - t0
        extra = {"hit_frac": round(hits / (args.latents * args.views *
                                           args.img * args.img), 4),
                 "mean_hit_depth": round(dsum / max(hits, 1), 4),
                 "chunk_frames": chunk}
        try:
            ms = jax.devices()[0].memory_stats() or {}
            if "peak_bytes_in_use" in ms:
                extra["peak_hbm_gb"] = round(
                    ms["peak_bytes_in_use"] / 2**30, 2)
        except Exception:
            pass
    else:
        depth, mask = jax.tree_util.tree_map(
            jax.block_until_ready, render_batch(latents)
        )
        t0 = time.perf_counter()
        depth, mask = render_batch(latents)
        jax.block_until_ready(depth)
        dt = time.perf_counter() - t0
        hits = int(jnp.sum(mask))
        extra = {"hit_frac": round(hits / mask.size, 4),
                 "mean_hit_depth": round(
                     float(jnp.sum(jnp.where(mask, depth, 0.0)))
                     / max(hits, 1), 4)}

    n_rays = args.latents * args.views * args.img * args.img
    mrays = n_rays / dt / 1e6
    print(json.dumps({
        "latents": args.latents, "views": args.views, "img": args.img,
        "total_rays": n_rays, "seconds": round(dt, 3),
        "Mrays_per_s": round(mrays, 2), "devices": n_dev, **extra,
    }))
    return mrays


if __name__ == "__main__":
    main()
