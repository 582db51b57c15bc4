"""End-to-end task-driver smoke tests (SURVEY.md §4 'Integration'):
each of the four application drivers runs to completion on CPU with a
tiny fitted decoder and actually improves its objective."""

import json
import os

import numpy as np
import pytest

TINY = [
    "--cpu", "--no-cache", "--fit-steps", "150",
    "--decoder-width", "24", "--decoder-depth", "4", "--latent-size", "8",
    "--img", "24", "--march-steps", "32", "--shape", "sphere",
]


def test_render_demo(tmp_path):
    from dist_renderer_tpu.tasks.render_demo import main

    main(TINY + ["--out", str(tmp_path)])
    assert (tmp_path / "view00.png").exists()


def test_depth_completion_recovers(tmp_path, capsys):
    from dist_renderer_tpu.tasks.depth_completion import main

    res = main(TINY + ["--out", str(tmp_path), "--steps", "30", "--lr", "5e-2"])
    h = np.asarray(res.loss_history)
    assert h[-1] < h[0]
    assert (tmp_path / "final.png").exists()
    assert (tmp_path / "metrics.csv").exists()


def test_pose_refine_reduces_error(tmp_path):
    from dist_renderer_tpu.tasks.pose_refine import main

    res, rot_err, t_err = main(
        TINY + ["--out", str(tmp_path), "--steps", "40", "--lr", "2e-2",
                "--rot-err-deg", "6", "--trans-err", "0.05"]
    )
    assert rot_err < 6.0  # strictly better than the perturbation
    h = np.asarray(res.loss_history)
    assert h[-1] < h[0]


def test_pose_refine_rot6d_param(tmp_path):
    """The continuous 6D rotation parameterization also recovers pose."""
    from dist_renderer_tpu.tasks.pose_refine import main

    res, rot_err, t_err = main(
        TINY + ["--out", str(tmp_path), "--steps", "40", "--lr", "2e-2",
                "--rot-err-deg", "6", "--trans-err", "0.05",
                "--param", "rot6d"]
    )
    assert rot_err < 6.0
    h = np.asarray(res.loss_history)
    assert h[-1] < h[0]


def test_multiview_runs(tmp_path):
    from dist_renderer_tpu.tasks.multiview import main

    res = main(TINY + ["--out", str(tmp_path), "--steps", "15",
                       "--views", "3", "--lr", "1e-2"])
    h = np.asarray(res.loss_history)
    assert np.isfinite(h).all()
    # smoke bar: optimization must not diverge (tiny decoder, few steps)
    assert h[-1] <= h.max()
    assert h.min() <= h[0]


def test_train_cli_exports_consumable_experiment(tmp_path):
    """train CLI -> DeepSDF experiment dir -> render_demo --experiment-dir
    (the reference's own consumption workflow)."""
    from dist_renderer_tpu.tasks.train import main as train_main
    from dist_renderer_tpu.tasks.render_demo import main as demo_main

    exp = str(tmp_path / "exp")
    h = train_main([
        "--cpu", "--shapes", "sphere", "--steps", "120", "--points", "256",
        "--decoder-width", "16", "--decoder-depth", "3",
        "--latent-size", "4", "--out", exp,
    ])
    assert h[-30:].mean() < h[:30].mean()
    out = str(tmp_path / "render")
    demo_main([
        "--cpu", "--experiment-dir", exp, "--img", "16",
        "--march-steps", "24", "--out", out,
    ])
    import os

    assert os.path.exists(os.path.join(out, "view00.png"))


def test_batched_render_runs(capsys):
    from dist_renderer_tpu.tasks.batched_render import main

    mrays = main(TINY + ["--latents", "2", "--views", "2", "--out", "/tmp/unused"])
    assert mrays > 0


def test_batched_render_stream_matches_materialized(capsys):
    """Config-#5 stretch mode: the streamed summary reduction (async
    per-chunk drain) must report the same hit statistics as the
    materializing path on the same scene."""
    import json as _json

    from dist_renderer_tpu.tasks.batched_render import main

    args = TINY + ["--latents", "2", "--views", "2", "--pallas"]
    main(args)
    base = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(args + ["--stream"])
    stream = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stream["hit_frac"] == pytest.approx(base["hit_frac"], abs=1e-6)
    assert stream["mean_hit_depth"] == pytest.approx(
        base["mean_hit_depth"], abs=1e-4
    )


def test_batched_render_stream_scan_matches_host_loop(capsys):
    """--scan (whole chunk loop on device via lax.map, one dispatch)
    must report the same summary as the host chunk loop, including with
    an explicit --chunk override; non-divisible --chunk errors."""
    import json as _json

    from dist_renderer_tpu.tasks.batched_render import main

    args = TINY + ["--latents", "4", "--views", "2", "--pallas", "--stream"]
    main(args)
    host = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(args + ["--scan"])
    scan = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(args + ["--scan", "--chunk", "2"])
    scan2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for got in (scan, scan2):
        assert got["hit_frac"] == pytest.approx(host["hit_frac"], abs=1e-6)
        assert got["mean_hit_depth"] == pytest.approx(
            host["mean_hit_depth"], abs=1e-4
        )
    with pytest.raises(SystemExit):
        main(args + ["--chunk", "3"])


def test_evaluate_image_metrics(tmp_path):
    """The eval driver's chamfer AND render-space metrics: a decoder
    fitted to the GT shape must score near-perfect on all axes; the
    JSON artifact carries per-instance + aggregate rows."""
    from dist_renderer_tpu.tasks.evaluate import main

    # 600 pretrain steps: at 150 the tiny decoder underfits the sphere
    # (~10% small) and every metric measures decoder quality, not the
    # eval driver
    tiny600 = ["--fit-steps" if a == "--fit-steps" else a for a in TINY]
    tiny600[tiny600.index("--fit-steps") + 1] = "600"
    agg = main(tiny600 + [
        "--instances", "2", "--samples", "512", "--latent-noise", "1e-3",
        "--image-metrics", "--views", "2", "--out", str(tmp_path),
    ])
    # breakage bars, not decoder-quality bars (the 24x4 net at 600 fit
    # steps measures chamfer ~0.018 / depth L1 ~0.019 / cos err ~0.05 /
    # IoU ~0.95 against its own GT)
    assert agg["chamfer_sym_mean"] < 0.03
    assert agg["depth_l1_mean"] < 0.05
    assert agg["normal_cos_err_mean"] < 0.2
    assert agg["silhouette_iou_mean"] > 0.85
    blob = json.load(open(tmp_path / "chamfer.json"))
    assert len(blob["per_instance"]) == 2
    assert "silhouette_iou" in blob["per_instance"][0]
