"""Real-data path round trip (VERDICT r1 item 4 / SURVEY.md §2 'Datasets'):
the preprocessing tool writes both documented on-disk layouts, the REAL
loaders (ShapeNetDepthDataset / PMOMultiViewDataset) read them back, and
the depth-completion + multiview task CLIs run optimization steps
end-to-end from `--data` with no synthetic fallback."""

import os

import numpy as np

TINY = [
    "--cpu", "--no-cache", "--fit-steps", "150",
    "--decoder-width", "24", "--decoder-depth", "4", "--latent-size", "8",
    "--img", "24", "--march-steps", "32", "--shape", "sphere",
]


def _make(tmp_path):
    from dist_renderer_tpu.tasks.make_synthetic_data import main as make_main

    root = str(tmp_path / "synth")
    make_main(TINY + ["--out", root, "--instances", "2", "--views", "3"])
    return root


def test_loaders_read_generated_layouts(tmp_path):
    from dist_renderer_tpu.data.datasets import (
        PMOMultiViewDataset, ShapeNetDepthDataset,
    )

    root = _make(tmp_path)
    ds = ShapeNetDepthDataset(os.path.join(root, "depth"))
    assert len(ds) == 2
    obs = ds[0]
    assert obs.depth.shape == (24, 24)
    assert obs.valid.dtype == bool and obs.valid.sum() > 10
    assert obs.mask.sum() > 10
    assert np.allclose(
        np.asarray(obs.camera.R) @ np.asarray(obs.camera.R).T, np.eye(3),
        atol=1e-5,
    )

    mv = PMOMultiViewDataset(os.path.join(root, "multiview"))
    assert len(mv) == 2
    s = mv[1]
    assert s.images.shape == (3, 24, 24, 3)
    assert s.masks.shape == (3, 24, 24)
    assert len(s.cameras) == 3
    assert s.images.max() <= 1.0 and s.images.min() >= 0.0
    # hit pixels carry texture, background is black
    assert s.images[s.masks].mean() > 0.05
    assert s.images[~s.masks].max() == 0.0


def test_depth_completion_from_disk(tmp_path):
    from dist_renderer_tpu.tasks.depth_completion import main

    root = _make(tmp_path)
    res = main(TINY + [
        "--data", os.path.join(root, "depth"), "--instance", "1",
        "--out", str(tmp_path / "out"), "--steps", "60", "--lr", "5e-2",
    ])
    h = np.asarray(res.loss_history)
    assert np.isfinite(h).all()
    # the cold-start latent renders nothing (masked losses ~0 at step 0);
    # the meaningful bar is descent from the post-appearance peak
    assert h[-1] < 0.7 * h[1:].max()


def test_pose_refine_from_disk(tmp_path):
    """Config #4 from an on-disk observation (VERDICT r3 item 7): the
    observed depth/mask/camera are read through the real loader; the
    optimizer recovers the dataset camera from a perturbed initial pose."""
    from dist_renderer_tpu.tasks.pose_refine import main

    root = _make(tmp_path)
    res, rot_err, t_err = main(TINY + [
        "--data", os.path.join(root, "depth"), "--instance", "0",
        "--out", str(tmp_path / "out"), "--steps", "120", "--lr", "3e-2",
        "--rot-err-deg", "8.0", "--trans-err", "0.05",
    ])
    h = np.asarray(res.loss_history)
    assert np.isfinite(h).all()
    assert rot_err < 4.0, f"rotation not recovered: {rot_err:.2f} deg"
    assert t_err < 0.05, f"translation not recovered: {t_err:.3f}"


def test_multiview_from_disk(tmp_path):
    from dist_renderer_tpu.tasks.multiview import main

    root = _make(tmp_path)
    res = main(TINY + [
        "--data", os.path.join(root, "multiview"),
        "--out", str(tmp_path / "out"), "--steps", "15", "--lr", "1e-2",
    ])
    h = np.asarray(res.loss_history)
    assert np.isfinite(h).all()
    assert h.min() <= h[0]
