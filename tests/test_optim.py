"""Optimizer harness: scan fast path == Python-loop path; orbax resume."""

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import OptimConfig
from dist_renderer_tpu.utils.optim import fit


def _loss(v):
    l = jnp.sum((v - 3.0) ** 2)
    return l, {"l": l}


def test_scan_matches_loop():
    cfg = OptimConfig(lr=0.1, steps=25, checkpoint_every=0)
    v0 = jnp.zeros(4)
    scan = fit(_loss, v0, cfg)                       # no callback => scan path
    loop = fit(_loss, v0, cfg, callback=lambda *a: None)  # forces loop path
    np.testing.assert_allclose(
        np.asarray(scan.variables), np.asarray(loop.variables), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scan.loss_history), np.asarray(loop.loss_history), atol=1e-5
    )
    assert float(scan.loss_history[-1]) < float(scan.loss_history[0])


def test_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "ck")
    cfg = OptimConfig(lr=0.1, steps=10, checkpoint_every=5)
    r1 = fit(_loss, jnp.zeros(3), cfg, checkpoint_dir=ckpt)
    # resume: starts from step 10 == nothing left to do; variables intact
    r2 = fit(_loss, jnp.zeros(3), cfg, checkpoint_dir=ckpt)
    np.testing.assert_allclose(
        np.asarray(r2.variables), np.asarray(r1.variables), atol=1e-6
    )
