"""Bit-exactness of the coarse-resolution classify_pyramid layout.

Round-4 glue work re-laid classify_pyramid to carry inter-level state at
coarse resolution and upsample once (ops/c2f.py layout note). For nested
strides this must be BIT-identical to the original full-resolution
round-trip layout — this test keeps a verbatim copy of that original as
the reference and drives both with a synthetic (pure-function)
trace_level whose outputs depend on seed/active, so every propagation
path (level-wise skip, seed hand-down, anchor/margin merge) is covered.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dist_renderer_tpu.ops.c2f import (
    C2FMaps, classify_pyramid, default_windows, plan_from_maps,
)


def _reference_classify_pyramid(trace_level, o_g, v_g, strides, backoff,
                                windows=default_windows):
    """The pre-round-4 full-resolution layout, kept verbatim as the
    exactness reference."""
    f, h, w = o_g.shape[:3]
    maps = None

    for stride in strides:
        hh, ww = h // stride, w // stride
        o_l = o_g[:, ::stride, ::stride].reshape(f, -1, 3)
        v_l = v_g[:, ::stride, ::stride].reshape(f, -1, 3)
        if maps is None:
            seed = None
            active = jnp.ones((f, hh * ww), bool)
        else:
            seed = maps.seed[:, ::stride, ::stride].reshape(f, -1)
            active = maps.hit_any[:, ::stride, ::stride].reshape(f, -1)
            seed = jnp.where(
                active, seed,
                maps.anchor[:, ::stride, ::stride].reshape(f, -1),
            )
        res = trace_level(o_l, v_l, seed, active, stride)

        seedable = res.hit | res.unresolved
        depth_grid = jnp.where(seedable, res.depth, jnp.inf).reshape(
            f, hh, ww
        )
        hitish = seedable.reshape(f, hh, ww)
        strict = res.hit.reshape(f, hh, ww)

        dmin = windows(depth_grid, jax.lax.min, jnp.inf)
        dmax = windows(
            jnp.where(jnp.isfinite(depth_grid), depth_grid, -jnp.inf),
            jax.lax.max, -jnp.inf,
        )
        hit_any = windows(hitish, jax.lax.bitwise_or, False)
        hit_all = windows(strict, jax.lax.bitwise_and, True)

        up = lambda g: jnp.repeat(jnp.repeat(g, stride, 1), stride, 2)
        rng = dmax - dmin
        bo = jnp.where(rng < backoff, 0.2 * backoff, backoff)
        new_anchor = up(res.depth_at_min.reshape(f, hh, ww))
        new_margin = up(res.min_sdf.reshape(f, hh, ww))
        if maps is not None:
            act_up = up(active.reshape(f, hh, ww))
            new_anchor = jnp.where(act_up, new_anchor, maps.anchor)
            new_margin = jnp.where(act_up, new_margin, maps.margin)
        maps = C2FMaps(
            seed=jnp.where(jnp.isfinite(up(dmin)), up(dmin) - up(bo), jnp.nan),
            hit_any=up(hit_any),
            hit_all=up(hit_all),
            anchor=new_anchor,
            margin=new_margin,
            width=up(jnp.where(jnp.isfinite(rng), rng, jnp.inf)),
        )
    return maps


def _synthetic_trace_level(o_l, v_l, seed, active, stride):
    """Pure-function stand-in for a coarse march. Every output depends on
    the ray, the SEED, and ACTIVE (inactive rays get the sentinel-style
    values the real tracer produces), so layout bugs in any propagated
    field change the result."""
    f, r = o_l.shape[:2]
    x = jnp.sum(o_l * 3.1 + v_l * 7.7, axis=-1)
    s = jnp.where(jnp.isnan(seed), 0.0, seed) if seed is not None else (
        jnp.zeros((f, r)))
    base = jnp.sin(x * 12.9898 + s * 4.37 + stride) * 43758.5453
    u = base - jnp.floor(base)          # [0, 1) pseudo-random
    depth = 1.0 + u + 0.25 * s
    hit = (u < 0.35) & active
    unresolved = (u > 0.92) & active
    # inactive rays: tracer sentinel (geometric margin, negative-ish)
    dam = jnp.where(active, depth * 0.9, 1.0 + 0.1 * u)
    msdf = jnp.where(active, u - 0.35, -0.05 - u * 0.01)
    return types.SimpleNamespace(
        depth=depth, hit=hit, unresolved=unresolved,
        depth_at_min=dam, min_sdf=msdf,
    )


@pytest.mark.parametrize("strides", [(4,), (8, 2), (16, 4), (16, 4, 2)])
def test_classify_pyramid_matches_fullres_reference(strides):
    f, h, w = 2, 32, 48
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    o_g = jax.random.normal(k1, (f, h, w, 3))
    v_g = jax.random.normal(k2, (f, h, w, 3))

    got = classify_pyramid(_synthetic_trace_level, o_g, v_g, strides, 0.03)
    ref = _reference_classify_pyramid(
        _synthetic_trace_level, o_g, v_g, strides, 0.03
    )
    for name, g, r in zip(C2FMaps._fields, got, ref):
        g, r = np.asarray(g), np.asarray(r)
        assert g.shape == r.shape == (f, h, w), name
        np.testing.assert_array_equal(g, r, err_msg=f"map {name}")

    # and the derived plan (what the fine stage actually consumes)
    for name, g, r in zip(("key", "init_depth", "skip"),
                          plan_from_maps(got), plan_from_maps(ref)):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(r), err_msg=f"plan {name}"
        )


def test_classify_pyramid_empty_strides_none():
    o = jnp.zeros((1, 8, 8, 3))
    assert classify_pyramid(_synthetic_trace_level, o, o, (), 0.03) is None
