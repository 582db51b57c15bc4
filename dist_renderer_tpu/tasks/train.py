"""DeepSDF auto-decoder training CLI — produce the experiment dirs the
renderer (and the reference ecosystem) consume.

  # train on analytic shapes, export a DeepSDF experiment dir
  python -m dist_renderer_tpu.tasks.train --shapes sphere torus union \
      --steps 3000 --out experiments/analytic3

  # train from DeepSDF-format sample files ([N,4] npy/npz of x,y,z,sdf)
  python -m dist_renderer_tpu.tasks.train --samples data/sdf/*.npy --out exp/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.checkpoint import save_deepsdf_experiment
from dist_renderer_tpu.models.train_deepsdf import (
    train_deepsdf_analytic, train_deepsdf_samples,
)
from dist_renderer_tpu.tasks.common import analytic_shape


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shapes", nargs="*", default=None,
                    choices=["sphere", "torus", "union"],
                    help="analytic training shapes")
    ap.add_argument("--samples", nargs="*", default=None,
                    help="DeepSDF-format sample files ([N,4] npy / npz)")
    ap.add_argument("--out", required=True, help="experiment dir to export")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-shapes", type=int, default=4)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--latent-lr", type=float, default=1e-3)
    ap.add_argument("--decoder-width", type=int, default=512)
    ap.add_argument("--decoder-depth", type=int, default=8)
    ap.add_argument("--latent-size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    depth = args.decoder_depth
    dcfg = DecoderConfig(
        latent_size=args.latent_size,
        hidden_dims=(args.decoder_width,) * depth,
        latent_in=(depth // 2,) if depth >= 2 else (),
    )

    if args.samples:
        files = []
        for pat in args.samples:
            files.extend(sorted(glob.glob(pat)))
        if not files:
            raise SystemExit(f"no sample files matched {args.samples}")
        banks = []
        for f in files:
            d = np.load(f)
            if hasattr(d, "files"):  # npz: DeepSDF pos/neg arrays
                arr = np.concatenate(
                    [d[k][:, :4] for k in ("pos", "neg") if k in d.files]
                )
            else:
                arr = np.asarray(d)[:, :4]
            banks.append(arr.astype(np.float32))
        params, latents, losses = train_deepsdf_samples(
            banks, dcfg, steps=args.steps, batch_shapes=args.batch_shapes,
            points_per_shape=args.points, lr=args.lr, latent_lr=args.latent_lr,
        )
        names = [os.path.basename(f) for f in files]
    else:
        shape_names = args.shapes or ["sphere", "torus", "union"]
        fns = [
            (lambda p, s=analytic_shape(n): s(None, p)) for n in shape_names
        ]
        params, latents, losses = train_deepsdf_analytic(
            fns, dcfg, steps=args.steps, batch_shapes=args.batch_shapes,
            points_per_shape=args.points, lr=args.lr, latent_lr=args.latent_lr,
        )
        names = shape_names

    h = np.asarray(losses)
    print(f"trained {len(names)} shapes: loss {h[:50].mean():.4f} -> "
          f"{h[-50:].mean():.4f} over {args.steps} steps")
    save_deepsdf_experiment(args.out, params, dcfg, latents=jnp.asarray(latents))
    with open(os.path.join(args.out, "shapes.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"exported DeepSDF experiment dir -> {args.out}")
    return h


if __name__ == "__main__":
    main()
