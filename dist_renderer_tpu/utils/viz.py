"""Visualization helpers — save/colorize depth, normal, silhouette maps.

Reference analog: ``core/visualize/`` in B1ueber2y/DIST-Renderer
(SURVEY.md §2 'Visualization'): colormapped depth, RGB-encoded normals,
binary silhouettes, side-by-side progress panels dumped during
optimization. Uses PIL/matplotlib (cv2-free paths kept simple)."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _to_np(x) -> np.ndarray:
    return np.asarray(x)


def colorize_depth(
    depth, mask=None, near: Optional[float] = None, far: Optional[float] = None
) -> np.ndarray:
    """Depth map -> uint8 RGB (viridis-ish via matplotlib), background black."""
    import matplotlib.cm as cm

    d = _to_np(depth).astype(np.float64)
    m = _to_np(mask).astype(bool) if mask is not None else d > 0
    if m.any():
        lo = near if near is not None else d[m].min()
        hi = far if far is not None else d[m].max()
    else:
        lo, hi = 0.0, 1.0
    norm = np.zeros_like(d)
    if hi > lo:
        norm[m] = np.clip((d[m] - lo) / (hi - lo), 0, 1)
    rgba = cm.viridis(1.0 - norm)
    rgb = (rgba[..., :3] * 255).astype(np.uint8)
    rgb[~m] = 0
    return rgb


def colorize_normal(normal, mask=None) -> np.ndarray:
    """Unit normals -> uint8 RGB with the usual (n+1)/2 encoding."""
    n = _to_np(normal)
    rgb = ((n + 1.0) * 0.5 * 255).clip(0, 255).astype(np.uint8)
    if mask is not None:
        rgb[~_to_np(mask).astype(bool)] = 0
    return rgb


def colorize_silhouette(min_sdf, scale: float = 20.0) -> np.ndarray:
    """Soft silhouette from the min-SDF margin: sigmoid(-scale * margin)."""
    s = 1.0 / (1.0 + np.exp(np.clip(scale * _to_np(min_sdf), -30, 30)))
    g = (s * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def save_image(path: str, rgb: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(rgb).save(path)


def panel(images: Sequence[np.ndarray], pad: int = 4) -> np.ndarray:
    """Horizontal side-by-side panel (equal heights assumed)."""
    h = max(im.shape[0] for im in images)
    cols = []
    for im in images:
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        if im.shape[0] < h:
            im = np.pad(im, ((0, h - im.shape[0]), (0, 0), (0, 0)))
        cols.append(im)
        cols.append(np.zeros((h, pad, 3), np.uint8))
    return np.concatenate(cols[:-1], axis=1)


def save_render_panel(path: str, out, obs_depth=None) -> None:
    """Save a depth | normal | silhouette (+ optional observation) panel
    from a RenderOutput — the reference's per-iteration progress dump."""
    imgs = [
        colorize_depth(out.depth, out.mask),
        colorize_normal(out.normal, out.mask),
        colorize_silhouette(out.min_sdf),
    ]
    if obs_depth is not None:
        imgs.append(colorize_depth(obs_depth))
    save_image(path, panel(imgs))


class MetricsLogger:
    """Structured per-iteration scalars -> CSV (+ optional TensorBoard),
    SURVEY.md §5 'Metrics / logging / observability'."""

    def __init__(self, path: Optional[str] = None, tensorboard_dir: Optional[str] = None):
        self.path = path
        self._file = None
        self._keys = None
        self._tb = None
        if tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except ImportError:
                pass

    def log(self, step: int, **scalars) -> None:
        if self.path:
            if self._file is None:
                os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
                self._file = open(self.path, "w")
                self._keys = list(scalars.keys())
                self._file.write(",".join(["step"] + self._keys) + "\n")
            row = [str(step)] + [f"{float(scalars.get(k, float('nan'))):.6g}" for k in self._keys]
            self._file.write(",".join(row) + "\n")
            self._file.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
