"""Quantitative evaluation driver: chamfer distance of an optimized shape
vs ground truth, with per-category aggregation (SURVEY.md §2
'Evaluation': chamfer eval scripts in core/evaluation/ of the reference).

Given latents (or the analytic-fallback decoder), extracts surfaces and
reports symmetric chamfer — the DIST/DeepSDF quality metric.

  python -m dist_renderer_tpu.tasks.evaluate --img 64 --instances 3
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.eval.chamfer import chamfer_distance, sample_surface_points
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.tasks.common import add_common_args, analytic_shape, load_task_decoder


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--instances", type=int, default=1)
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--latent-noise", type=float, default=0.0)
    ap.add_argument("--mesh-based", action="store_true",
                    help="sample via marching-tetrahedra mesh instead of "
                         "SDF projection")
    args = ap.parse_args(argv)

    params, base_latent, dcfg = load_task_decoder(args)
    gt = analytic_shape(args.shape)
    gt_fn = lambda p: gt(None, p)

    key = jax.random.PRNGKey(0)
    results = []
    for i in range(args.instances):
        key, k1, k2, k3 = jax.random.split(key, 4)
        z = base_latent + args.latent_noise * jax.random.normal(k1, base_latent.shape)
        from dist_renderer_tpu.models.decoder import make_precise_sdf
        _psdf = make_precise_sdf(params, dcfg)
        pred_fn = lambda p, _z=z: _psdf(_z, p)

        if args.mesh_based:
            from dist_renderer_tpu.eval.mesh import extract_mesh
            from dist_renderer_tpu.eval.native import sample_mesh_surface_native
            from dist_renderer_tpu.eval.mesh import sample_mesh_surface

            verts, faces = extract_mesh(pred_fn, resolution=96)
            pa = sample_mesh_surface_native(verts, faces, args.samples, seed=i)
            if pa is None:
                pa = sample_mesh_surface(verts, faces, args.samples, seed=i)
            pa = jnp.asarray(pa)
        else:
            pa = sample_surface_points(pred_fn, args.samples, k2)
        pb = sample_surface_points(gt_fn, args.samples, k3)
        a2b, b2a, total = chamfer_distance(pa, pb)
        results.append({
            "instance": i,
            "chamfer_pred_to_gt": float(a2b),
            "chamfer_gt_to_pred": float(b2a),
            "chamfer_sym": float(total),
        })
        print(json.dumps(results[-1]))

    agg = {
        "category": args.shape,
        "n": len(results),
        "chamfer_sym_mean": float(np.mean([r["chamfer_sym"] for r in results])),
        "chamfer_sym_median": float(np.median([r["chamfer_sym"] for r in results])),
    }
    print(json.dumps(agg))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "chamfer.json"), "w") as f:
            json.dump({"per_instance": results, "aggregate": agg}, f, indent=2)
    return agg


if __name__ == "__main__":
    main()
