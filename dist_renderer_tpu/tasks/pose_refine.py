"""Task (d): camera pose estimation by render-and-compare — decoder and
latent frozen, extrinsics promoted to optimization variables via a
continuous rotation parameterization (BASELINE.json config #4; SURVEY.md
§3.5). Gradients reach the pose through ray origins/directions inside the
last-step decoder eval — the config that stresses gradient correctness
through camera geometry (SURVEY.md §7 hard part 3).

  python -m dist_renderer_tpu.tasks.pose_refine --img 128 --steps 100
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from dist_renderer_tpu.config import OptimConfig
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.ops.camera import (
    Camera, camera_from_pose, pixel_rays, pose_from_camera, so3_exp,
)
from dist_renderer_tpu.ops.renderer import render_rays
from dist_renderer_tpu.tasks.common import (
    add_common_args, default_camera, load_task_decoder, make_render_cfg,
)
from dist_renderer_tpu.utils import losses as L
from dist_renderer_tpu.utils.optim import fit
from dist_renderer_tpu.utils.viz import MetricsLogger, save_render_panel


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--param", default="so3", choices=["so3", "rot6d"])
    ap.add_argument("--data", default=None,
                    help="ShapeNet-depth dataset root: the observed depth/"
                    "mask/camera come from disk (SURVEY.md §3.5 starts "
                    "from an observed image; config #4 assumes the shape "
                    "is known, so the task decoder's latent must match "
                    "the observed instance — e.g. a make_synthetic_data "
                    "layout generated from the same decoder)")
    ap.add_argument("--instance", type=int, default=0,
                    help="dataset instance index (with --data)")
    ap.add_argument("--rot-err-deg", type=float, default=10.0,
                    help="initial rotation perturbation")
    ap.add_argument("--trans-err", type=float, default=0.1)
    ap.add_argument("--w-depth", type=float, default=10.0)
    ap.add_argument("--w-sil", type=float, default=1.0)
    # pose needs a hotter schedule than latent fitting (measured on TPU:
    # lr 1e-2/120 steps leaves 8deg of a 10deg perturbation; lr 3e-2/400
    # steps recovers to 0.000 deg)
    ap.add_argument("--warm", type=int, default=0,
                    help="warm-start refresh period N: reuse each "
                    "iteration's trace as the next one's seeds/"
                    "classification, full refresh every N steps "
                    "(Pallas render path only)")
    ap.set_defaults(lr=3e-2, steps=300)
    args = ap.parse_args(argv)

    params, latent, dcfg = load_task_decoder(args)
    from dist_renderer_tpu.models.decoder import make_precise_sdf

    if args.data:
        # real observed data through the REAL loader: the hidden GT pose
        # is the dataset camera; the optimizer only ever sees its
        # perturbation + the observed depth/mask images
        from dist_renderer_tpu.data.datasets import ShapeNetDepthDataset

        obs = ShapeNetDepthDataset(args.data)[args.instance]
        h, w = obs.depth.shape
        assert h == w, "pose_refine assumes square images"
        args.img = h
        cfg = make_render_cfg(args)
        sdf_fn = make_precise_sdf(params, dcfg)
        if obs.latent is not None:
            # the dataset ships the instance's known-shape latent
            # (config #4 freezes the shape)
            latent = jnp.asarray(obs.latent)
        march_fn = make_point_fn(params, latent, dcfg, cfg.dtype)
        cam_gt = obs.camera
        obs_depth = jnp.asarray(obs.depth).reshape(-1)
        obs_valid = jnp.asarray(obs.valid).reshape(-1)
        obs_mask = jnp.asarray(obs.mask).reshape(-1)
        print(f"observation: {obs.name} ({h}x{w}, "
              f"{int(obs_valid.sum())} valid depth px) from {args.data}")
    else:
        cfg = make_render_cfg(args)
        sdf_fn = make_precise_sdf(params, dcfg)
        march_fn = make_point_fn(params, latent, dcfg, cfg.dtype)
        # synthesize the ground-truth camera and observation
        cam_gt = default_camera(args.img)
        o, v = pixel_rays(cam_gt, args.img, args.img)
        gt = render_rays(sdf_fn, latent, o, v, cfg, march_fn)
        obs_depth = gt.depth
        obs_valid = gt.mask
        obs_mask = gt.mask
    hw = (args.img, args.img)

    # perturb the pose
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.linalg.norm(axis)
    dR = so3_exp(axis * jnp.radians(args.rot_err_deg))
    R0 = dR @ cam_gt.R
    T0 = cam_gt.T + args.trans_err * jax.random.normal(k2, (3,))
    pose0 = pose_from_camera(Camera(K=cam_gt.K, R=R0, T=T0), args.param)

    os.makedirs(args.out, exist_ok=True)
    logger = MetricsLogger(os.path.join(args.out, "metrics.csv"))

    def _obj(out):
        ld = L.depth_loss(out.depth, obs_depth, obs_valid, out.mask)
        ls = L.silhouette_loss(out.min_sdf, obs_mask)
        total = args.w_depth * ld + args.w_sil * ls
        return total, {"depth": ld, "sil": ls}

    def loss_fn(pose):
        cam = camera_from_pose(pose, cam_gt.K, args.param)
        oo, vv = pixel_rays(cam, args.img, args.img)
        out = render_rays(sdf_fn, latent, oo, vv, cfg, march_fn)
        return _obj(out)

    warm_carry = None
    use_warm = bool(args.warm) and cfg.use_pallas
    if use_warm:
        # warm path rides the full render() (Pallas trace_frame) so the
        # previous iteration's trace replaces the coarse pyramid;
        # gradients reach the pose through ray origins/dirs in the
        # differentiable recompute exactly as in render_rays
        from dist_renderer_tpu.ops.renderer import (
            make_march_factory, render as render_full, render_with_warm,
            warm_from_trace,
        )

        factory = make_march_factory(params, dcfg, cfg)

        def loss_fn_warm(pose, carry):
            cam = camera_from_pose(pose, cam_gt.K, args.param)
            out, carry = render_with_warm(
                sdf_fn, latent, cam, cfg, factory, carry, args.warm
            )
            # render() returns [H, W] maps; the observation is flat [N]
            out = out._replace(
                depth=out.depth.reshape(-1),
                mask=out.mask.reshape(-1),
                min_sdf=out.min_sdf.reshape(-1),
            )
            total, aux = _obj(out)
            aux["carry"] = carry
            return total, aux

        out0 = render_full(
            sdf_fn, latent,
            camera_from_pose(pose0, cam_gt.K, args.param), cfg, factory,
        )
        warm_carry = (jnp.int32(1), warm_from_trace(out0.trace))

    res = fit(loss_fn_warm if use_warm else loss_fn, pose0,
              OptimConfig(lr=args.lr, steps=args.steps),
              carry_init=warm_carry)
    for s, l in enumerate(np.asarray(res.loss_history)):
        logger.log(s, loss=float(l))

    cam_f = camera_from_pose(res.variables, cam_gt.K, args.param)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(cam_f.R.T @ cam_gt.R)) - 1) / 2, -1, 1))
    )
    t_err = float(jnp.linalg.norm(cam_f.T - cam_gt.T))
    oo, vv = pixel_rays(cam_f, args.img, args.img)
    out = render_rays(sdf_fn, latent, oo, vv, cfg, march_fn)

    class _V:  # reshape for the panel helper
        depth = out.depth.reshape(hw); mask = out.mask.reshape(hw)
        normal = out.normal.reshape(hw + (3,)); min_sdf = out.min_sdf.reshape(hw)

    save_render_panel(os.path.join(args.out, "final.png"), _V, obs_depth.reshape(hw))
    print(f"final: loss {float(res.loss_history[-1]):.5f}  "
          f"rot err {rot_err:.3f} deg (init {args.rot_err_deg})  "
          f"trans err {t_err:.4f} (init ~{args.trans_err})")
    logger.close()
    return res, rot_err, t_err


if __name__ == "__main__":
    main()
