"""Profiling / debug utility tests (SURVEY.md §5)."""

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import MarchConfig
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.tracer import sphere_trace
from dist_renderer_tpu.utils.debug import checkify_render, debug_mode
from dist_renderer_tpu.utils.profiling import Timer, march_efficiency


def test_timer_records():
    t = Timer()
    out = t.timeit("matmul", lambda: jnp.ones((32, 32)) @ jnp.ones((32, 32)),
                   warmup=1, iters=2)
    s = t.summary()
    assert "matmul" in s and s["matmul"]["mean_ms"] >= 0.0
    assert "matmul" in t.dump()


def test_march_efficiency_reports_savings():
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(32, 32))
    o, v = pixel_rays(cam, 32, 32)
    f = lambda p: sphere_sdf(0.5)(None, p)
    res = sphere_trace(f, o, v, MarchConfig(max_steps=64))
    eff = march_efficiency(res)
    assert eff["ray_steps"] > 0
    assert eff["savings"] >= 1.0  # live set shrinks => fewer than naive


def test_debug_mode_restores_flags():
    before = jax.config.jax_debug_nans
    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_checkify_catches_nan():
    def f(x):
        return jnp.log(x)  # nan for x < 0

    checked = checkify_render(f)
    err, out = checked(jnp.array([-1.0]))
    assert err.get() is not None  # NaN reported, not silently propagated
