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


def _image_metrics(args, pred_fn, gt_fn):
    """Render-space quality vs the GT shape, both rendered by the SAME
    pipeline over a camera ring (removes renderer bias from the
    comparison — only the geometry differs): masked depth L1 and normal
    cosine error on both-hit pixels, silhouette IoU over the frame.
    Mirrors the reference's depth/normal/silhouette eval axes
    (SURVEY.md §2 'Evaluation')."""
    from dist_renderer_tpu.config import MarchConfig, RenderConfig
    from dist_renderer_tpu.ops.renderer import render
    from dist_renderer_tpu.tasks.common import ring_cameras

    cfg = RenderConfig(
        img_h=args.img, img_w=args.img,
        march=MarchConfig(max_steps=args.march_steps),
    )
    p_sdf = lambda z, p: pred_fn(p)
    g_sdf = lambda z, p: gt_fn(p)
    z = jnp.zeros((1,))
    d_l1, n_err, iou = [], [], []
    for cam in ring_cameras(args.img, args.views):
        po = render(p_sdf, z, cam, cfg)
        go = render(g_sdf, z, cam, cfg)
        both = po.mask & go.mask
        nb = jnp.maximum(jnp.sum(both), 1)
        d_l1.append(float(
            jnp.sum(jnp.where(both, jnp.abs(po.depth - go.depth), 0.0)) / nb
        ))
        cos = jnp.sum(po.normal * go.normal, axis=-1)
        n_err.append(float(
            jnp.sum(jnp.where(both, 1.0 - cos, 0.0)) / nb
        ))
        iou.append(float(
            jnp.sum(po.mask & go.mask)
            / jnp.maximum(jnp.sum(po.mask | go.mask), 1)
        ))
    return {
        "depth_l1": float(np.mean(d_l1)),
        "normal_cos_err": float(np.mean(n_err)),
        "silhouette_iou": float(np.mean(iou)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--instances", type=int, default=1)
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--latent-noise", type=float, default=0.0)
    ap.add_argument("--mesh-based", action="store_true",
                    help="sample via marching-tetrahedra mesh instead of "
                         "SDF projection")
    ap.add_argument("--image-metrics", action="store_true",
                    help="also report render-space metrics vs the GT shape "
                         "rendered by the SAME pipeline: masked depth L1, "
                         "normal cosine error, silhouette IoU (the render-"
                         "quality axes of the reference's eval tables)")
    ap.add_argument("--views", type=int, default=4,
                    help="ring views for --image-metrics")
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
        if args.image_metrics:
            results[-1].update(_image_metrics(args, pred_fn, gt_fn))
        print(json.dumps(results[-1]))

    agg = {
        "category": args.shape,
        "n": len(results),
        "chamfer_sym_mean": float(np.mean([r["chamfer_sym"] for r in results])),
        "chamfer_sym_median": float(np.median([r["chamfer_sym"] for r in results])),
    }
    if args.image_metrics:
        for k in ("depth_l1", "normal_cos_err", "silhouette_iou"):
            agg[f"{k}_mean"] = float(np.mean([r[k] for r in results]))
    print(json.dumps(agg))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "chamfer.json"), "w") as f:
            json.dump({"per_instance": results, "aggregate": agg}, f, indent=2)
    return agg


if __name__ == "__main__":
    main()
