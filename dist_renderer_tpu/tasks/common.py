"""Shared task-driver plumbing: decoder loading (DeepSDF experiment dir,
npz fixture, or fitted-to-analytic fallback), camera setup, output dirs.

Reference analog: the argparse boilerplate shared by the reference's demo
scripts (SURVEY.md §2 'Task drivers'). Zero-network fallback: with no
pretrained experiment dir available, tasks fit a decoder to an analytic
shape so every demo runs end-to-end out of the box."""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import (
    DecoderConfig, GradConfig, LossConfig, MarchConfig, OptimConfig, RenderConfig,
)
from dist_renderer_tpu.models.decoder import Params
from dist_renderer_tpu.ops.camera import Camera


def add_common_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--experiment-dir", default=None,
                    help="DeepSDF experiment dir (specs.json + ModelParameters)")
    ap.add_argument("--checkpoint", default="latest")
    ap.add_argument("--params-npz", default=None,
                    help="decoder params saved by models.pretrain.save_params_npz")
    ap.add_argument("--shape", default="torus",
                    choices=["sphere", "torus", "union"],
                    help="analytic fallback shape when no checkpoint given")
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100, help="optimization steps")
    ap.add_argument("--march-steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--out", default="out")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="c2f + compaction + bf16 march")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="orbax checkpoint dir for resume")
    ap.add_argument("--decoder-width", type=int, default=512,
                    help="hidden width of the fallback-fitted decoder")
    ap.add_argument("--decoder-depth", type=int, default=8)
    ap.add_argument("--latent-size", type=int, default=256)
    ap.add_argument("--fit-steps", type=int, default=1500,
                    help="training steps for the analytic-fallback decoder")
    ap.add_argument("--recompute", default="pallas", choices=["xla", "pallas"],
                    help="differentiable-recompute impl on the --fast "
                         "path (GradConfig.recompute): 'pallas' = fused "
                         "VMEM-resident kernel, ops/pallas/recompute.py")
    ap.add_argument("--no-cache", action="store_true",
                    help="do not cache the fallback-fitted decoder")


def analytic_shape(name: str):
    from dist_renderer_tpu.models.analytic import (
        round_union, sphere_sdf, torus_sdf,
    )

    return {
        "sphere": sphere_sdf(0.5),
        "torus": torus_sdf(0.5, 0.18),
        "union": round_union(
            torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
        ),
    }[name]


def load_task_decoder(args) -> Tuple[Params, jax.Array, DecoderConfig]:
    """Resolve the decoder per CLI args (experiment dir > npz > fitted)."""
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.experiment_dir:
        from dist_renderer_tpu.models.checkpoint import load_decoder, load_latent_codes

        params, dcfg = load_decoder(args.experiment_dir, args.checkpoint)
        try:
            latent = load_latent_codes(args.experiment_dir, args.checkpoint)[0]
        except (OSError, KeyError):
            latent = jnp.zeros((dcfg.latent_size,))
        return params, latent, dcfg
    if args.params_npz:
        from dist_renderer_tpu.models.pretrain import load_params_npz

        params, latent = load_params_npz(args.params_npz)
        return params, latent, DecoderConfig()
    # fallback: fit to an analytic shape (cached per shape/arch)
    from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf, get_or_fit_cached

    shape = analytic_shape(args.shape)
    width, depth = args.decoder_width, args.decoder_depth
    dcfg = DecoderConfig(
        latent_size=args.latent_size,
        hidden_dims=(width,) * depth,
        latent_in=(depth // 2,) if depth >= 2 else (),
    )
    target = lambda p: shape(None, p)
    if args.no_cache:
        params, latent = fit_decoder_to_sdf(target, dcfg, steps=args.fit_steps)
    else:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            f".task_decoder_{args.shape}_{width}x{depth}_{args.latent_size}.npz",
        )
        params, latent = get_or_fit_cached(
            cache, target, dcfg, steps=args.fit_steps
        )
    return params, latent, dcfg


def make_render_cfg(args) -> RenderConfig:
    march_kw = {}
    if args.fast:
        # march precision matched to the bf16 hot loop: bf16 SDF noise is
        # ~2e-3, so tighter convergence criteria only buy wasted bisection
        # steps; the fp32 IFT polish restores depth accuracy afterwards
        march_kw = dict(convergence_eps=2e-3, depth_eps=5e-4)
    on_tpu = (not args.cpu)
    try:
        on_tpu = on_tpu and jax.devices()[0].platform != "cpu"
    except Exception:
        on_tpu = False
    return RenderConfig(
        img_h=args.img, img_w=args.img,
        march=MarchConfig(
            max_steps=args.march_steps,
            coarse_to_fine=args.fast,
            use_compaction=args.fast and not on_tpu,
            **march_kw,
        ),
        # hit-compacted differentiable recompute (bench-matched fast path)
        grad=GradConfig(mode="ift", compact_frac=4,
                        recompute=getattr(args, "recompute", "xla"))
        if args.fast else GradConfig(mode="last_step"),
        compute_dtype="bfloat16" if args.fast else "float32",
        use_pallas=args.fast and on_tpu,
    )


def default_camera(img: int, dist: float = 2.2, elev_azim=(20.0, 30.0)) -> Camera:
    import numpy as np

    el, az = np.radians(elev_azim[0]), np.radians(elev_azim[1])
    eye = dist * np.array(
        [np.cos(el) * np.sin(az), np.sin(el), -np.cos(el) * np.cos(az)]
    )
    return Camera.looking_at(tuple(eye), focal=img * 1.1, img_hw=(img, img))


def ring_cameras(img: int, n_views: int = 8, dist: float = 2.2, elev: float = 20.0):
    """n cameras on a ring — the PMO-style multi-view rig (SURVEY.md §3.4)."""
    import numpy as np

    cams = []
    for i in range(n_views):
        az = 360.0 * i / n_views
        cams.append(default_camera(img, dist, (elev, az)))
    return cams
