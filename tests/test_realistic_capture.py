"""Config #3 on externally-authored imagery (VERDICT r2 'missing' #5).

Everything the multiview task consumes here is built OUTSIDE the package's
render pipeline, the way a capture rig would publish it:

  - cameras.json written by hand from a numpy look-at (only the documented
    convention is shared: x_cam = R @ x_world + T, OpenCV axes, pinhole K);
  - RGB views from an independent closed-form numpy ray-sphere raycaster
    (no tracer, no decoder), procedurally textured + Lambertian-shaded;
  - realistic capture degradations: vignetting, Gaussian sensor noise,
    8-bit PNG quantization, a NON-black cluttered background, and masks
    from an "imperfect segmenter" (random flips in the boundary band).

The PMOMultiViewDataset loader must ingest the layout, and the multiview
fit must still recover the geometry (silhouette IoU) through the noise —
the closest offline stand-in for PMO/real-photo data (SURVEY.md §3.4).
"""

import json
import os

import numpy as np

RADIUS = 0.5   # matches tasks.common.analytic_shape("sphere")
IMG = 24
VIEWS = 3

TINY = [
    # 600 pretrain steps: at 150 the tiny decoder's own sphere is ~10%
    # small and caps achievable IoU at ~0.6 even at the GT latent
    "--cpu", "--no-cache", "--fit-steps", "600",
    "--decoder-width", "24", "--decoder-depth", "4", "--latent-size", "8",
    "--img", str(IMG), "--march-steps", "32", "--shape", "sphere",
]


def _look_at(eye, img):
    """Numpy look-at in the documented convention (camera.py:22): rows of
    R are (right, down, forward); T = -R @ eye; principal point (w-1)/2."""
    eye = np.asarray(eye, np.float64)
    fwd = -eye / np.linalg.norm(eye)          # toward the origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    T = -R @ eye
    focal = img * 1.3
    K = np.array([[focal, 0, (img - 1) / 2.0],
                  [0, focal, (img - 1) / 2.0],
                  [0, 0, 1.0]])
    return K, R, T


def _raycast_sphere(K, R, T, img):
    """Closed-form ray-sphere intersection — no package tracer involved."""
    ys, xs = np.mgrid[0:img, 0:img].astype(np.float64)
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(-1, 3)
    d_cam = pix @ np.linalg.inv(K).T
    d = d_cam @ R                              # R^T @ d_cam, batched
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -R.T @ T
    b = d @ o
    disc = b * b - (o @ o - RADIUS * RADIUS)
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    pts = o[None, :] + t[:, None] * d
    return hit.reshape(img, img), pts.reshape(img, img, 3)


def _shade(pts, hit):
    """View-independent procedural texture + fixed-light Lambertian."""
    n = pts / RADIUS
    light = np.array([0.4, -0.8, -0.45])
    light = light / np.linalg.norm(light)
    lam = np.clip((n * light).sum(-1), 0.15, 1.0)
    tex = 0.55 + 0.4 * np.sin(
        np.stack([5.0 * pts[..., 0] + 3.0 * pts[..., 1],
                  4.0 * pts[..., 1] + 2.0 * pts[..., 2],
                  6.0 * pts[..., 2] + 1.0], axis=-1)
    )
    rgb = tex * lam[..., None]
    return np.where(hit[..., None], rgb, 0.0)


def _corrupt(rgb, hit, rng):
    """Capture-like degradations on the CLEAN render."""
    img = rgb.shape[0]
    ys, xs = np.mgrid[0:img, 0:img].astype(np.float64)
    ru2 = (((xs - img / 2) ** 2 + (ys - img / 2) ** 2)
           / (2 * (img / 2) ** 2))
    # cluttered, non-black background: vertical gradient + two blobs
    bg = 0.25 + 0.2 * (ys / img)[..., None] * np.ones(3)
    for cx, cy, r, c in ((5, 6, 3, 0.7), (18, 15, 4, 0.12)):
        blob = ((xs - cx) ** 2 + (ys - cy) ** 2) < r * r
        bg = np.where(blob[..., None], c, bg)
    out = np.where(hit[..., None], rgb, bg)
    out = out * (1.0 - 0.3 * ru2)[..., None]          # vignetting
    out = out + rng.normal(0.0, 0.02, out.shape)       # sensor noise
    return np.clip(out, 0.0, 1.0)


def _imperfect_mask(hit, rng):
    """Flip ~a third of the boundary-band pixels (segmentation error)."""
    h = hit.astype(np.uint8)
    grow = np.zeros_like(h)
    grow[1:, :] |= h[:-1, :]
    grow[:-1, :] |= h[1:, :]
    grow[:, 1:] |= h[:, :-1]
    grow[:, :-1] |= h[:, 1:]
    grow |= h
    shrink = np.ones_like(h)
    shrink[1:, :] &= h[:-1, :]
    shrink[:-1, :] &= h[1:, :]
    shrink[:, 1:] &= h[:, :-1]
    shrink[:, :-1] &= h[:, 1:]
    shrink &= h
    band = (grow == 1) & (shrink == 0)
    flip = band & (rng.random(h.shape) < 0.35)
    return (hit ^ flip).astype(bool)


def _write_capture(root):
    from PIL import Image

    rng = np.random.default_rng(11)
    inst = os.path.join(root, "capture0")
    os.makedirs(inst, exist_ok=True)
    cams, clean_masks = [], []
    for i in range(VIEWS):
        az = np.deg2rad(360.0 * i / VIEWS)
        elev = np.deg2rad(20.0)
        eye = 2.2 * np.array([
            np.sin(az) * np.cos(elev), np.sin(elev), -np.cos(az) * np.cos(elev)
        ])
        K, R, T = _look_at(eye, IMG)
        hit, pts = _raycast_sphere(K, R, T, IMG)
        rgb = _corrupt(_shade(pts, hit), hit, rng)
        mask = _imperfect_mask(hit, rng)
        Image.fromarray((rgb * 255).round().astype(np.uint8)).save(
            os.path.join(inst, f"view{i:02d}.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(inst, f"mask{i:02d}.png"))
        cams.append({"K": K.tolist(), "R": R.tolist(), "T": T.tolist()})
        clean_masks.append(hit)
    with open(os.path.join(inst, "cameras.json"), "w") as f:
        json.dump(cams, f)
    return np.stack(clean_masks)


def test_loader_ingests_external_capture(tmp_path):
    from dist_renderer_tpu.data.datasets import PMOMultiViewDataset

    root = str(tmp_path / "capture")
    clean = _write_capture(root)
    ds = PMOMultiViewDataset(root)
    assert len(ds) == 1
    s = ds[0]
    assert s.images.shape == (VIEWS, IMG, IMG, 3)
    assert s.images.min() >= 0.0 and s.images.max() <= 1.0
    # background is cluttered, NOT black (the synthetic datasets' tell)
    assert s.images[~s.masks].mean() > 0.1
    # observed masks are imperfect but close to the clean silhouettes
    agree = (s.masks == clean).mean()
    assert 0.9 < agree < 1.0, agree
    # cameras round-trip the documented convention: R orthonormal,
    # centers on the capture ring
    for c in s.cameras:
        R = np.asarray(c.R)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.norm(np.asarray(c.center)), 2.2, atol=1e-3)


def test_multiview_fit_survives_capture_noise(tmp_path):
    """Geometry recovery through sensor noise, clutter, and bad masks:
    the silhouette+photometric fit must reach high mask IoU against the
    observed (imperfect) masks — noise-floor-limited, not geometry-
    limited."""
    from dist_renderer_tpu.tasks.multiview import main

    root = str(tmp_path / "capture")
    _write_capture(root)
    out_dir = str(tmp_path / "out")
    # schedule chosen by sweep: photometric must stay SUBORDINATE to the
    # silhouette term on cluttered backgrounds (wrong-geometry warps
    # sample clutter, so pure photometric descent rewards SHRINKING the
    # silhouette — w_photo 1.0 at lr 1e-1 lands at IoU ~0.4 with a LOWER
    # loss; w_photo 0.3 at lr 3e-2 recovers ~0.76-0.78 in both 1- and
    # 8-device envs)
    res = main(TINY + [
        "--data", root, "--out", out_dir,
        "--steps", "300", "--lr", "3e-2", "--w-photo", "0.3",
    ])
    h = np.asarray(res.loss_history)
    assert np.isfinite(h).all()
    assert h[-1] < h[0]
    with open(os.path.join(out_dir, "summary.json")) as f:
        summary = json.load(f)
    # ceiling is ~0.85 (decoder-quality 0.89 x segmentation corruption);
    # 0.65 = geometry recovered (the shrink-degenerate basin sits ~0.4)
    assert summary["mask_iou"] > 0.65, summary
