"""Task (b): single-depth shape completion — optimize a latent code so the
render matches one observed (partial) depth map (BASELINE.json config #2;
SURVEY.md §3.3 call stack).

Observation sources:
  --data ROOT [--instance I]  read a real on-disk observation through
      data.datasets.ShapeNetDepthDataset (depth.npy + mask + camera.json
      [+ normalization.npz], the reference's depth-completion layout).
  (default)  synthesize the observation by rendering a GROUND-TRUTH
      latent/shape, optionally masked to a partial view; the task then
      recovers shape from scratch exactly like the reference demo.

  python -m dist_renderer_tpu.tasks.depth_completion --img 128 --steps 150
  python -m dist_renderer_tpu.tasks.depth_completion --data data/synth/depth
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import LossConfig, OptimConfig
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.folded import make_point_fn
from dist_renderer_tpu.ops.renderer import render
from dist_renderer_tpu.tasks.common import (
    add_common_args, default_camera, load_task_decoder, make_render_cfg,
)
from dist_renderer_tpu.utils import losses as L
from dist_renderer_tpu.utils.optim import fit
from dist_renderer_tpu.utils.viz import MetricsLogger, save_render_panel


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--partial", type=float, default=0.5,
                    help="fraction of image columns observed (partial depth)")
    ap.add_argument("--data", default=None,
                    help="ShapeNet-depth dataset root (ShapeNetDepthDataset "
                    "layout); omit to synthesize the observation")
    ap.add_argument("--instance", type=int, default=0,
                    help="dataset instance index (with --data)")
    ap.add_argument("--w-depth", type=float, default=10.0)
    ap.add_argument("--w-sil", type=float, default=1.0)
    ap.add_argument("--w-reg", type=float, default=1e-4)
    ap.add_argument("--vis-every", type=int, default=0)
    ap.add_argument("--mesh", action="store_true",
                    help="extract the fitted shape's mesh (OBJ) and, when "
                    "a hidden GT exists, report chamfer vs it — the "
                    "reference's post-fit evaluation (SURVEY.md §3.3)")
    ap.add_argument("--mesh-res", type=int, default=128)
    ap.add_argument("--warm", type=int, default=0,
                    help="warm-start refresh period N: reuse each "
                    "iteration's trace as the next one's seeds/"
                    "classification (skips the coarse pyramid), full "
                    "refresh every N steps. Pallas render path only.")
    args = ap.parse_args(argv)

    params, gt_latent, dcfg = load_task_decoder(args)
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    sdf_fn = make_precise_sdf(params, dcfg)

    gt = None
    if args.data:
        # real observed data through the REAL loader (SURVEY.md §3.3 starts
        # from observed data; no synthetic fallback on this path)
        import dataclasses

        from dist_renderer_tpu.data.datasets import ShapeNetDepthDataset

        obs = ShapeNetDepthDataset(args.data)[args.instance]
        h, w = obs.depth.shape
        args.img = h
        cfg = make_render_cfg(args)
        cfg = dataclasses.replace(cfg, img_h=h, img_w=w)
        factory = lambda z: make_point_fn(params, z, dcfg, cfg.dtype)
        cam = obs.camera
        obs_depth = jnp.asarray(obs.depth)
        obs_valid = jnp.asarray(obs.valid)
        obs_mask = jnp.asarray(obs.mask)
        col_mask = jnp.ones((w,), bool)
        print(f"observation: {obs.name} ({h}x{w}, "
              f"{int(obs_valid.sum())} valid depth px) from {args.data}")
    else:
        cfg = make_render_cfg(args)
        factory = lambda z: make_point_fn(params, z, dcfg, cfg.dtype)
        cam = default_camera(args.img)
        # synthesize the observation from the GT latent; mask to a partial strip
        gt = render(sdf_fn, gt_latent, cam, cfg, factory)
        w_obs = int(args.img * args.partial)
        col_mask = jnp.arange(args.img) < w_obs
        obs_valid = gt.mask & col_mask[None, :]
        obs_depth = jnp.where(obs_valid, gt.depth, 0.0)
        obs_mask = gt.mask & col_mask[None, :]  # silhouette supervision only where seen

    os.makedirs(args.out, exist_ok=True)
    logger = MetricsLogger(os.path.join(args.out, "metrics.csv"))

    def _obj(z, out):
        ld = L.depth_loss(out.depth, obs_depth, obs_valid, out.mask)
        ls = L.silhouette_loss(
            jnp.where(col_mask[None, :], out.min_sdf, 0.0), obs_mask
        )
        lr_ = L.latent_reg(z)
        total = args.w_depth * ld + args.w_sil * ls + args.w_reg * lr_
        return total, {"depth": ld, "sil": ls, "reg": lr_}

    def loss_fn(z):
        return _obj(z, render(sdf_fn, z, cam, cfg, factory))

    def loss_fn_warm(z, carry):
        # iteration k's trace seeds iteration k+1 (SURVEY.md §3.3: the
        # same camera re-renders hundreds of times; the coarse pyramid
        # is skipped between refreshes)
        from dist_renderer_tpu.ops.renderer import render_with_warm

        out, carry = render_with_warm(
            sdf_fn, z, cam, cfg, factory, carry, args.warm
        )
        total, aux = _obj(z, out)
        aux["carry"] = carry
        return total, aux

    z0 = jnp.zeros_like(gt_latent)  # cold start (mean latent)
    warm_carry = None
    use_warm = bool(args.warm) and cfg.use_pallas
    if use_warm:
        from dist_renderer_tpu.ops.renderer import warm_from_trace

        out0 = render(sdf_fn, z0, cam, cfg, factory)
        warm_carry = (jnp.int32(1), warm_from_trace(out0.trace))

    if args.vis_every:
        def cb(step, z, loss):
            logger.log(step, loss=loss)
            if step % args.vis_every == 0:
                out = render(sdf_fn, z, cam, cfg, factory)
                save_render_panel(
                    os.path.join(args.out, f"iter{step:05d}.png"), out, obs_depth
                )

        res = fit(
            loss_fn_warm if use_warm else loss_fn, z0,
            OptimConfig(lr=args.lr, steps=args.steps),
            checkpoint_dir=args.checkpoint_dir,
            log_every=max(args.steps // 10, 1),
            callback=cb,
            carry_init=warm_carry,
        )
    else:
        # no per-step host work -> whole loop runs on device (lax.scan)
        res = fit(loss_fn_warm if use_warm else loss_fn, z0,
                  OptimConfig(lr=args.lr, steps=args.steps),
                  carry_init=warm_carry)
        for step, l in enumerate(np.asarray(res.loss_history)):
            logger.log(step, loss=float(l))

    out = render(sdf_fn, res.variables, cam, cfg, factory)
    save_render_panel(os.path.join(args.out, "final.png"), out, obs_depth)
    if gt is not None:
        # quality: full-image depth error vs the (hidden) complete GT
        err = float(L.depth_loss(out.depth, gt.depth, gt.mask, out.mask))
        lat_err = float(jnp.linalg.norm(res.variables - gt_latent))
        print(f"final: loss {float(res.loss_history[-1]):.5f}  "
              f"full-depth L1 {err:.5f}  |z - z_gt| {lat_err:.4f}")
    else:
        # real data: no hidden GT — report fit on the observed region
        err = float(L.depth_loss(out.depth, obs_depth, obs_valid, out.mask))
        print(f"final: loss {float(res.loss_history[-1]):.5f}  "
              f"observed-depth L1 {err:.5f}")

    if args.mesh:
        # SURVEY.md §3.3 finale: marching-tetra mesh of the fitted shape
        # (+ chamfer vs the hidden GT when this run synthesized one)
        from dist_renderer_tpu.eval.chamfer import (
            chamfer_distance, sample_surface_points,
        )
        from dist_renderer_tpu.eval.mesh import extract_mesh, save_obj

        verts, faces = extract_mesh(
            lambda p: sdf_fn(res.variables, p), resolution=args.mesh_res
        )
        obj = os.path.join(args.out, "fitted.obj")
        save_obj(obj, verts, faces)
        msg = f"mesh: {len(verts)} verts {len(faces)} faces -> {obj}"
        if gt is not None:
            pa = sample_surface_points(
                lambda p: sdf_fn(res.variables, p), n=20000
            )
            pb = sample_surface_points(
                lambda p: sdf_fn(gt_latent, p), n=20000,
                key=jax.random.PRNGKey(1),
            )
            ch = float(chamfer_distance(pa, pb)[2])
            msg += f"  chamfer-sq vs GT {ch:.2e}"
        print(msg)
    logger.close()
    return res


if __name__ == "__main__":
    main()
