"""Task (c): multi-view reconstruction — silhouette + photometric
consistency over a ring of views, gradients accumulate on one shared
latent (BASELINE.json config #3; SURVEY.md §3.4).

Views are vmapped on-chip; with multiple devices the view axis shards via
the parallel layer instead (SURVEY.md §2 parallelism table, 'view
parallel').

Observation sources:
  --data ROOT [--instance I]  read real images/masks/cameras through
      data.datasets.PMOMultiViewDataset (the PMO-style on-disk layout).
  (default)  synthesize observations by texturing the GT shape with a
      fixed random color decoder.

  python -m dist_renderer_tpu.tasks.multiview --img 128 --views 8
  python -m dist_renderer_tpu.tasks.multiview --data data/synth/multiview
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import OptimConfig
from dist_renderer_tpu.models.color_decoder import (
    color_apply, init_color_params, make_color_config,
)
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import render_rays
from dist_renderer_tpu.tasks.common import (
    add_common_args, load_task_decoder, make_render_cfg, ring_cameras,
)
from dist_renderer_tpu.utils import losses as L
from dist_renderer_tpu.utils.optim import fit
from dist_renderer_tpu.utils.viz import MetricsLogger, colorize_depth, panel, save_image


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--data", default=None,
                    help="PMO-style multi-view dataset root "
                    "(PMOMultiViewDataset layout); omit to synthesize")
    ap.add_argument("--instance", type=int, default=0,
                    help="dataset instance index (with --data)")
    ap.add_argument("--w-sil", type=float, default=1.0)
    ap.add_argument("--w-photo", type=float, default=1.0)
    ap.add_argument("--w-reg", type=float, default=1e-4)
    ap.add_argument("--mesh", action="store_true",
                    help="extract the reconstructed mesh (OBJ) after the "
                    "fit — the reference's post-fit output (SURVEY.md §3.4)")
    ap.add_argument("--mesh-res", type=int, default=128)
    args = ap.parse_args(argv)

    params, gt_latent, dcfg = load_task_decoder(args)
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    sdf_fn = make_precise_sdf(params, dcfg)

    if args.data:
        # real observed images/masks/cameras via the REAL loader
        # (SURVEY.md §3.4's call stack starts from observed data)
        import dataclasses

        from dist_renderer_tpu.data.datasets import PMOMultiViewDataset

        mv = PMOMultiViewDataset(args.data)[args.instance]
        args.views = mv.images.shape[0]
        h, w = mv.images.shape[1:3]
        args.img = h
        cfg = make_render_cfg(args)
        cfg = dataclasses.replace(cfg, img_h=h, img_w=w)
        cams = mv.cameras
        gt_imgs = jnp.asarray(mv.images.reshape(args.views, h * w, 3))
        obs_masks = jnp.asarray(mv.masks.reshape(args.views, h * w))
        print(f"observation: {mv.name} ({args.views} views, {h}x{w}) "
              f"from {args.data}")
    else:
        cfg = make_render_cfg(args)
        cams = ring_cameras(args.img, args.views)
        gt_imgs = obs_masks = None

    factory = lambda z: make_point_fn(params, z, dcfg, cfg.dtype)
    cam_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    rays = [pixel_rays(c, cfg.img_h, cfg.img_w) for c in cams]
    origins = jnp.stack([r[0] for r in rays])  # [V, N, 3]
    dirs = jnp.stack([r[1] for r in rays])

    def render_view(z, o, v):
        return render_rays(sdf_fn, z, o, v, cfg, factory(z))

    if gt_imgs is None:
        # synthesize observations: GT masks + GT images (textured via a
        # fixed random color decoder so photometric consistency has signal)
        ccfg = make_color_config(latent_size=dcfg.latent_size,
                                 hidden_dims=(64,) * 4, latent_in=())
        cparams = init_color_params(jax.random.PRNGKey(7), ccfg)
        color_fn = lambda zc, p: color_apply(cparams, zc, p, ccfg)
        z_color = jnp.zeros((dcfg.latent_size,))
        gt_out = jax.vmap(lambda o, v: render_view(gt_latent, o, v))(origins, dirs)
        gt_imgs = jax.vmap(lambda pts, m: jnp.where(
            m[:, None], color_fn(z_color, pts), 0.0
        ))(gt_out.points, gt_out.mask)  # [V, N, 3]
        obs_masks = gt_out.mask  # [V, N]

    hw = (cfg.img_h, cfg.img_w)
    os.makedirs(args.out, exist_ok=True)
    logger = MetricsLogger(os.path.join(args.out, "metrics.csv"))

    def loss_fn(z):
        out = jax.vmap(lambda o, v: render_view(z, o, v))(origins, dirs)
        ls = jax.vmap(L.silhouette_loss)(out.min_sdf, obs_masks).mean()

        # photometric: project view i's surface points into view (i+1)%V
        def photo(i):
            j = (i + 1) % args.views
            cam_i = jax.tree_util.tree_map(lambda x: x[i], cam_stack)
            cam_j = jax.tree_util.tree_map(lambda x: x[j], cam_stack)
            return L.photometric_loss(
                out.points[i], out.mask[i],
                gt_imgs[i].reshape(hw + (3,)), cam_i,
                gt_imgs[j].reshape(hw + (3,)), cam_j,
            )

        lp = jnp.mean(jnp.stack([photo(i) for i in range(args.views)]))
        lr_ = L.latent_reg(z)
        total = args.w_sil * ls + args.w_photo * lp + args.w_reg * lr_
        return total, {"sil": ls, "photo": lp}

    res = fit(
        loss_fn, jnp.zeros_like(gt_latent),
        OptimConfig(lr=args.lr, steps=args.steps),
    )
    import numpy as _np

    for s, l in enumerate(_np.asarray(res.loss_history)):
        logger.log(s, loss=float(l))

    out = jax.vmap(lambda o, v: render_view(res.variables, o, v))(origins, dirs)
    imgs = [colorize_depth(out.depth[i].reshape(hw), out.mask[i].reshape(hw))
            for i in range(min(args.views, 4))]
    save_image(os.path.join(args.out, "final_views.png"), panel(imgs))
    # reconstruction quality vs the observations (real or synthesized):
    # silhouette IoU of the fitted render against the observed masks
    iou = float(jnp.mean(jax.vmap(
        lambda m, g: jnp.sum(m & g) / jnp.maximum(jnp.sum(m | g), 1)
    )(out.mask, obs_masks)))
    summary = {"final_loss": float(res.loss_history[-1]), "mask_iou": iou}
    if args.data:
        print(f"final: loss {summary['final_loss']:.5f}  mask IoU {iou:.4f}")
    else:
        summary["latent_err"] = float(
            jnp.linalg.norm(res.variables - gt_latent)
        )
        print(f"final: loss {summary['final_loss']:.5f}  mask IoU {iou:.4f}"
              f"  |z - z_gt| {summary['latent_err']:.4f}")
    import json

    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    if args.mesh:
        import os as _os

        from dist_renderer_tpu.eval.mesh import extract_mesh, save_obj

        verts, faces = extract_mesh(
            lambda p: sdf_fn(res.variables, p), resolution=args.mesh_res
        )
        obj = _os.path.join(args.out, "reconstructed.obj")
        save_obj(obj, verts, faces)
        print(f"mesh: {len(verts)} verts {len(faces)} faces -> {obj}")
    logger.close()
    return res


if __name__ == "__main__":
    main()
