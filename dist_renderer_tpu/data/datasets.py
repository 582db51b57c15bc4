"""Dataset loaders: ShapeNet depth renders and PMO-style multi-view sets.

Reference analog: ``core/dataset/`` in B1ueber2y/DIST-Renderer (SURVEY.md
§2 'Datasets'): ShapeNet renders + depth maps + DeepSDF normalization
params (npz) for the depth-completion task; the PMO multi-view dataset
(images, masks, cameras — Lin et al. CVPR 2019) for multi-view
reconstruction.

This environment has no network and no dataset downloads; the loaders
therefore (a) read the on-disk layouts when present, and (b) expose a
`SyntheticShapeDataset` that renders observations from analytic shapes /
fitted decoders so every task runs end-to-end without downloads. The
synthetic path generates EXACTLY the observation tuple the real loaders
produce, so swapping in real data is a constructor change.

All loaders yield plain numpy/jnp arrays batched into fixed shapes (no
torch DataLoader machinery — host-side numpy feeding jit'ed device steps
is the idiomatic JAX input pipeline at this scale).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from dist_renderer_tpu.ops.camera import Camera


class DepthObservation(NamedTuple):
    """One depth-completion observation (SURVEY.md §3.3)."""

    depth: np.ndarray        # [H, W] float32, 0 where invalid
    valid: np.ndarray        # [H, W] bool
    mask: np.ndarray         # [H, W] bool silhouette
    camera: Camera
    name: str
    latent: Optional[np.ndarray] = None   # known-shape latent (config #4:
                                          # pose estimation freezes the
                                          # shape; DeepSDF experiment dirs
                                          # ship LatentCodes the same way)


class MultiViewObservation(NamedTuple):
    """One multi-view sample: V views of a single object (SURVEY.md §3.4)."""

    images: np.ndarray       # [V, H, W, 3] float32 in [0,1]
    masks: np.ndarray        # [V, H, W] bool
    cameras: List[Camera]
    name: str


def _load_norm_params(path: str) -> Tuple[np.ndarray, float]:
    """DeepSDF normalization npz: offset + scale mapping mesh -> unit sphere."""
    d = np.load(path)
    return np.asarray(d["offset"]).reshape(3), float(d["scale"])


class ShapeNetDepthDataset:
    """Reads the reference's depth-completion layout: per-instance depth
    maps (npy or 16-bit png), masks, camera json, and DeepSDF
    normalization params. Directory layout (one dir per instance):

        <root>/<instance>/depth.npy         [H,W] float32 meters (0=invalid)
        <root>/<instance>/mask.png|npy      silhouette
        <root>/<instance>/camera.json       {"K": 3x3, "R": 3x3, "T": 3}
        <root>/<instance>/normalization.npz offset+scale (optional)
        <root>/<instance>/latent.npy        known-shape latent (optional)
    """

    def __init__(self, root: str):
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"ShapeNet depth root {root} not found — this environment "
                "has no dataset downloads; use SyntheticShapeDataset instead"
            )
        self.root = root
        self.instances = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, i: int) -> DepthObservation:
        inst = self.instances[i]
        d = os.path.join(self.root, inst)
        depth = np.load(os.path.join(d, "depth.npy")).astype(np.float32)
        mask_p = os.path.join(d, "mask.npy")
        if os.path.exists(mask_p):
            mask = np.load(mask_p).astype(bool)
        else:
            from PIL import Image

            mask = np.asarray(Image.open(os.path.join(d, "mask.png"))) > 127
        with open(os.path.join(d, "camera.json")) as f:
            cam = json.load(f)
        camera = Camera(
            K=jnp.asarray(cam["K"], jnp.float32),
            R=jnp.asarray(cam["R"], jnp.float32),
            T=jnp.asarray(cam["T"], jnp.float32),
        )
        norm_p = os.path.join(d, "normalization.npz")
        if os.path.exists(norm_p):
            offset, scale = _load_norm_params(norm_p)
            # bring observation into DeepSDF-normalized coordinates
            depth = depth * scale
            camera = Camera(
                K=camera.K,
                R=camera.R,
                T=(camera.T + camera.R @ jnp.asarray(offset)) * scale,
            )
        lat_p = os.path.join(d, "latent.npy")
        latent = np.load(lat_p) if os.path.exists(lat_p) else None
        return DepthObservation(depth, depth > 0, mask, camera, inst, latent)


class PMOMultiViewDataset:
    """Reads a PMO-style multi-view layout:

        <root>/<instance>/view{i:02d}.png   RGB
        <root>/<instance>/mask{i:02d}.png   silhouette
        <root>/<instance>/cameras.json      [{"K":..., "R":..., "T":...}, ...]
    """

    def __init__(self, root: str):
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"PMO root {root} not found — use SyntheticShapeDataset "
                "for network-free runs"
            )
        self.root = root
        self.instances = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, i: int) -> MultiViewObservation:
        from PIL import Image

        inst = self.instances[i]
        d = os.path.join(self.root, inst)
        with open(os.path.join(d, "cameras.json")) as f:
            cams_raw = json.load(f)
        cameras = [
            Camera(
                K=jnp.asarray(c["K"], jnp.float32),
                R=jnp.asarray(c["R"], jnp.float32),
                T=jnp.asarray(c["T"], jnp.float32),
            )
            for c in cams_raw
        ]
        images, masks = [], []
        for v in range(len(cameras)):
            img = np.asarray(Image.open(os.path.join(d, f"view{v:02d}.png")))
            images.append(img[..., :3].astype(np.float32) / 255.0)
            masks.append(
                np.asarray(Image.open(os.path.join(d, f"mask{v:02d}.png"))) > 127
            )
        return MultiViewObservation(
            np.stack(images), np.stack(masks), cameras, inst
        )


class SyntheticShapeDataset:
    """Renders observations from a decoder (or analytic SDF) — the
    network-free stand-in producing the same observation tuples as the
    real loaders. Used by tests, demos, and benchmarks."""

    def __init__(
        self,
        sdf_fn,                      # (latent, points) -> sdf
        latents: np.ndarray,         # [B, L]
        img: int = 128,
        n_views: int = 8,
        march_fn_factory=None,
        render_cfg=None,
    ):
        from dist_renderer_tpu.config import MarchConfig, RenderConfig

        self.sdf_fn = sdf_fn
        self.latents = latents
        self.img = img
        self.n_views = n_views
        self.factory = march_fn_factory
        self.cfg = render_cfg or RenderConfig(
            img_h=img, img_w=img, march=MarchConfig(max_steps=50)
        )

    def __len__(self) -> int:
        return len(self.latents)

    def depth_observation(self, i: int, view: int = 0) -> DepthObservation:
        from dist_renderer_tpu.ops.renderer import render
        from dist_renderer_tpu.tasks.common import ring_cameras

        cam = ring_cameras(self.img, max(self.n_views, 1))[view]
        z = jnp.asarray(self.latents[i])
        out = render(self.sdf_fn, z, cam, self.cfg,
                     self.factory if self.factory else None)
        depth = np.asarray(out.depth)
        mask = np.asarray(out.mask)
        return DepthObservation(depth, mask.copy(), mask, cam, f"synthetic{i:04d}")

    def multiview_observation(self, i: int, color_fn=None) -> MultiViewObservation:
        from dist_renderer_tpu.ops.renderer import render
        from dist_renderer_tpu.tasks.common import ring_cameras

        cams = ring_cameras(self.img, self.n_views)
        z = jnp.asarray(self.latents[i])
        images, masks = [], []
        for cam in cams:
            out = render(self.sdf_fn, z, cam, self.cfg,
                         self.factory if self.factory else None)
            m = np.asarray(out.mask)
            if color_fn is not None:
                rgb = np.asarray(color_fn(z, out.points.reshape(-1, 3)))
                rgb = rgb.reshape(self.img, self.img, 3) * m[..., None]
            else:
                # shaded normals as a stand-in texture
                n = np.asarray(out.normal)
                rgb = ((n + 1) / 2) * m[..., None]
            images.append(rgb.astype(np.float32))
            masks.append(m)
        return MultiViewObservation(
            np.stack(images), np.stack(masks), cams, f"synthetic{i:04d}"
        )


def batch_iterator(
    dataset, batch_size: int, shuffle: bool = True, seed: int = 0
) -> Iterator[List]:
    """Host-side batching: fixed-size batches of dataset items (the last
    partial batch is dropped so device shapes stay static)."""
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for start in range(0, len(idx) - batch_size + 1, batch_size):
        yield [dataset[int(i)] for i in idx[start:start + batch_size]]
