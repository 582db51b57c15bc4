"""Preprocessing tool: generate synthetic datasets in the on-disk layouts
the loaders read (SURVEY.md §2 'Preprocessing tools' — the reference ships
scripts that arrange ShapeNet depth renders + normalization params; with
zero network this tool synthesizes equivalent data from analytic shapes /
fitted decoders).

  python -m dist_renderer_tpu.tasks.make_synthetic_data --out data/synth \
      --instances 4 --views 6 --img 128
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.ops.renderer import render
from dist_renderer_tpu.tasks.common import (
    add_common_args, load_task_decoder, make_render_cfg, ring_cameras,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--instances", type=int, default=4)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--latent-noise", type=float, default=0.03)
    args = ap.parse_args(argv)

    params, base_latent, dcfg = load_task_decoder(args)
    cfg = make_render_cfg(args)
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    sdf_fn = make_precise_sdf(params, dcfg)

    cams = ring_cameras(args.img, args.views)
    key = jax.random.PRNGKey(0)

    depth_root = os.path.join(args.out, "depth")
    mv_root = os.path.join(args.out, "multiview")
    for i in range(args.instances):
        key, k = jax.random.split(key)
        z = base_latent + args.latent_noise * jax.random.normal(k, base_latent.shape)
        name = f"inst{i:04d}"

        # depth-completion layout (view 0 only)
        d_dir = os.path.join(depth_root, name)
        os.makedirs(d_dir, exist_ok=True)
        cam = cams[0]
        out = render(sdf_fn, z, cam, cfg)
        np.save(os.path.join(d_dir, "depth.npy"),
                np.asarray(out.depth, np.float32))
        np.save(os.path.join(d_dir, "mask.npy"), np.asarray(out.mask))
        # known-shape latent (pose estimation — config #4 — freezes the
        # shape; mirrors DeepSDF experiment dirs shipping LatentCodes)
        np.save(os.path.join(d_dir, "latent.npy"),
                np.asarray(z, np.float32))
        with open(os.path.join(d_dir, "camera.json"), "w") as f:
            json.dump({
                "K": np.asarray(cam.K).tolist(),
                "R": np.asarray(cam.R).tolist(),
                "T": np.asarray(cam.T).tolist(),
            }, f)

        # PMO multiview layout
        m_dir = os.path.join(mv_root, name)
        os.makedirs(m_dir, exist_ok=True)
        cams_json = []
        from PIL import Image

        for vi, cam in enumerate(cams):
            out = render(sdf_fn, z, cam, cfg)
            m = np.asarray(out.mask)
            n = np.asarray(out.normal)
            rgb = (((n + 1) / 2) * m[..., None] * 255).astype(np.uint8)
            Image.fromarray(rgb).save(os.path.join(m_dir, f"view{vi:02d}.png"))
            Image.fromarray((m * 255).astype(np.uint8)).save(
                os.path.join(m_dir, f"mask{vi:02d}.png")
            )
            cams_json.append({
                "K": np.asarray(cam.K).tolist(),
                "R": np.asarray(cam.R).tolist(),
                "T": np.asarray(cam.T).tolist(),
            })
        with open(os.path.join(m_dir, "cameras.json"), "w") as f:
            json.dump(cams_json, f)
        print(f"{name}: depth + {args.views} views written")

    print(f"done: {args.instances} instances under {args.out}")


if __name__ == "__main__":
    main()
