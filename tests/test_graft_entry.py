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
    ge = _load()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    depth, normal, min_sdf = out
    n = depth.shape[0]
    assert normal.shape == (n, 3)
    assert min_sdf.shape == (n,)


def test_dryrun_multichip_eight():
    ge = _load()
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd_count():
    ge = _load()
    ge.dryrun_multichip(2)
