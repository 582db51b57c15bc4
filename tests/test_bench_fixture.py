"""Guard the committed benchmark decoder fixture: benchmarks across rounds
are only comparable if .bench_decoder.npz keeps representing the same
shape at the same quality."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.pretrain import load_params_npz

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".bench_decoder.npz")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not present")
def test_bench_decoder_fixture_quality():
    params, z0 = load_params_npz(FIXTURE)
    dcfg = DecoderConfig()
    assert len(params["layers"]) == 9
    assert z0.shape == (256,)

    shape = round_union(
        torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
    )
    pts = jax.random.uniform(jax.random.PRNGKey(5), (4096, 3), minval=-1, maxval=1)
    pred = np.asarray(decoder_apply(params, z0, pts, dcfg))
    tgt = np.asarray(shape(None, pts))
    band = np.abs(tgt) < 0.1
    err = np.abs(pred - np.clip(tgt, -0.1, 0.1))[band]
    assert err.mean() < 0.02, "bench decoder fixture degraded — benchmarks not comparable"
    sign_ok = ((pred > 0) == (tgt > 0))[band].mean()
    assert sign_ok > 0.9


def test_bench_cpu_smoke_json_contract():
    """bench.py is a driver hook: run it the way the driver does (bare
    subprocess, no conftest) at smoke scale and hold the one-JSON-line
    output contract."""
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no fake devices: the driver's env
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py"),
         "--cpu", "--img", "16", "--steps", "8", "--frames", "1"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline",
                "fwd_ms_per_frame", "fwdbwd_ms_per_frame"):
        assert key in rec, key
    assert rec["unit"] == "Mrays/s" and rec["value"] > 0
