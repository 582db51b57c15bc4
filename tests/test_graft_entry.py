"""Driver-hook regression: entry() compiles single-device and
dryrun_multichip runs a full sharded step on the fake 8-device mesh."""

import importlib.util
import os

import jax


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    import numpy as np

    ge = _load()
    fn, args = ge.entry(img=64)   # driver default is 128; 64 keeps the
    out = jax.jit(fn)(*args)      # interpret-mode CPU check fast
    depth, normal, min_sdf = out
    hw = depth.shape
    assert normal.shape == hw + (3,)
    assert min_sdf.shape == hw
    # the production engine on the bench fixture must actually render
    # the shape (a broken fast path returning all-background would still
    # have the right shapes)
    hits = np.isfinite(np.asarray(depth)) & (np.asarray(depth) > 0)
    assert hits.sum() > 0.05 * depth.size


def test_dryrun_multichip_eight():
    ge = _load()
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd_count():
    ge = _load()
    ge.dryrun_multichip(2)


def test_dryrun_multichip_bare_subprocess():
    """Reproduce the DRIVER's environment (round-1 red gate): a bare
    process WITHOUT conftest's fake-device env, whose visible backend has
    1 device, calling dryrun_multichip(8). The hook must respawn itself
    with a fake 8-CPU-device platform and succeed (VERDICT round 1,
    item 1). The inline jax_platforms=cpu line is test-harness safety
    only (don't open a TPU tunnel client from the suite); the driver's
    1-device condition is faithfully reproduced because no
    xla_force_host_platform_device_count flag is set here."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_DIST_TPU_DRYRUN_CHILD")
    }
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8, 'precondition: bare process must see <8 devices'\n"
        "import importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('graft_entry', {os.path.join(repo, '__graft_entry__.py')!r})\n"
        "mod = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(mod)\n"
        "mod.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"bare-subprocess dryrun failed:\nSTDOUT:{proc.stdout}\nSTDERR:{proc.stderr[-4000:]}"
    )
    assert "OK" in proc.stdout
