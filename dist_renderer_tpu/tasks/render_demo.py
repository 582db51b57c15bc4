"""Task (a): render demo — depth/normal/silhouette maps from a decoder +
latent + camera (BASELINE.json config #1; SURVEY.md §3.1).

  python -m dist_renderer_tpu.tasks.render_demo --img 256 --out out/demo
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.ops.renderer import render
from dist_renderer_tpu.tasks.common import (
    add_common_args, default_camera, load_task_decoder, make_render_cfg,
)
from dist_renderer_tpu.utils.viz import save_render_panel, save_image, colorize_depth


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--mesh", action="store_true", help="also extract an .obj")
    args = ap.parse_args(argv)

    params, latent, dcfg = load_task_decoder(args)
    cfg = make_render_cfg(args)
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    sdf_fn = make_precise_sdf(params, dcfg)
    factory = lambda z: make_point_fn(params, z, dcfg, cfg.dtype)

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.views):
        cam = default_camera(args.img, elev_azim=(20.0, 30.0 + 360.0 * i / max(args.views, 1)))
        t0 = time.perf_counter()
        out = render(sdf_fn, latent, cam, cfg, factory)
        jax.block_until_ready(out.depth)
        dt = time.perf_counter() - t0
        path = os.path.join(args.out, f"view{i:02d}.png")
        save_render_panel(path, out)
        hits = int(out.mask.sum())
        print(f"view {i}: {dt*1e3:.1f} ms, {hits} hit px -> {path}")

    if args.mesh:
        from dist_renderer_tpu.eval.mesh import extract_mesh, save_obj

        verts, faces = extract_mesh(lambda p: sdf_fn(latent, p), resolution=128)
        obj = os.path.join(args.out, "shape.obj")
        save_obj(obj, verts, faces)
        print(f"mesh: {len(verts)} verts, {len(faces)} faces -> {obj}")


if __name__ == "__main__":
    main()
