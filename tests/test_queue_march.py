"""Work-queue fine march (ops/pallas/queue_march.py) — exactness bars.

The queue kernel's generations are pure SCHEDULING: a paused ray's march
carry (depth, bracket, min-SDF accumulators, step count) is requeued and
resumed, so the result must be BIT-IDENTICAL to one uninterrupted
full-budget march of the same rays (batched_trace_padded, salvage=True).
That is a far stronger bar than the multi-round scheduler's (whose
per-round fresh caps change straggler budgets) — and it covers the
in-kernel compaction matmuls (bf16x3 one-hot transport must be exact to
the last mantissa bit), the frame-pure queue invariant across bias-bank
frames, and the overflow fallback.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.analytic import torus_sdf
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.ops.c2f import classify_pyramid, plan_from_maps
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.pallas.batched_march import (
    batched_trace_padded,
    fold_bias_bank,
    pack_shared,
)
from dist_renderer_tpu.ops.pallas.queue_march import queue_march

IMG = 32
F = 3
MARCH = MarchConfig(max_steps=32, convergence_eps=2e-3, depth_eps=5e-4)


@pytest.fixture(scope="module")
def scene():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=200, batch=512
    )
    lat = jnp.stack([z0] * F) + 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), (F, dcfg.latent_size)
    )
    cam = Camera.looking_at(
        (0.0, 0.0, -2.0), focal=IMG * 1.2, img_hw=(IMG, IMG)
    )
    o, v = pixel_rays(cam, IMG, IMG)
    ob = jnp.broadcast_to(o[None], (F,) + o.shape)
    vb = jnp.broadcast_to(v[None], (F,) + v.shape)
    shared = pack_shared(params, dcfg)
    bank = fold_bias_bank(params, lat, dcfg, shared)
    coarse = dc.replace(MARCH, max_steps=12)

    def tl(ol, vl, seed, act, stride):
        return batched_trace_padded(
            shared, bank, ol, vl, coarse, seed, act, 512, True, True
        )

    maps = classify_pyramid(
        tl, ob.reshape(F, IMG, IMG, 3), vb.reshape(F, IMG, IMG, 3), (4,),
        0.05,
    )
    key, idep, _ = plan_from_maps(maps)
    ref = batched_trace_padded(
        shared, bank, ob, vb, MARCH, idep, key != 2, 512, True, True
    )
    return shared, bank, ob, vb, key, idep, ref


def _assert_exact(res, ref, key):
    d, hit, msdf, dam, lastf, steps, unres = res
    act = np.asarray(key != 2)
    r_pad = ref.steps_per_ray.shape[0] // F
    ref_steps = ref.steps_per_ray.reshape(F, r_pad)[:, :IMG * IMG]
    assert int(np.asarray(ref.hit).sum()) > 300  # scene visible
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(
        np.asarray(d)[act], np.asarray(ref.depth)[act]
    )
    np.testing.assert_array_equal(np.asarray(msdf), np.asarray(ref.min_sdf))
    np.testing.assert_array_equal(
        np.asarray(dam)[act], np.asarray(ref.depth_at_min)[act]
    )
    np.testing.assert_array_equal(
        np.asarray(lastf)[act], np.asarray(ref.last_sdf)[act]
    )
    np.testing.assert_array_equal(
        np.asarray(steps)[act], np.asarray(ref_steps)[act]
    )
    np.testing.assert_array_equal(np.asarray(unres), np.asarray(ref.unresolved))


def test_queue_march_bit_exact_vs_full_march(scene):
    shared, bank, ob, vb, key, idep, ref = scene
    res = jax.jit(lambda: queue_march(
        shared, bank, ob, vb, key, idep, MARCH, block=512,
        gen_caps=(6, 16), interpret=True,
    ))()
    _assert_exact(res, ref, key)


def test_queue_march_single_generation_cap(scene):
    """A cap >= max_steps means no ray is ever requeued — degenerate
    single-generation schedule must still be exact."""
    shared, bank, ob, vb, key, idep, ref = scene
    res = jax.jit(lambda: queue_march(
        shared, bank, ob, vb, key, idep, MARCH, block=512,
        gen_caps=(64,), interpret=True,
    ))()
    _assert_exact(res, ref, key)


def test_queue_march_tiny_caps_heavy_requeue(scene):
    """Pathological schedule (cap 2 per generation): maximal requeue
    traffic through the compaction path, still bit-exact."""
    shared, bank, ob, vb, key, idep, ref = scene
    res = jax.jit(lambda: queue_march(
        shared, bank, ob, vb, key, idep, MARCH, block=512,
        gen_caps=(2, 2, 2), interpret=True,
    ))()
    _assert_exact(res, ref, key)


def test_queue_march_dense_frac_extremes(scene):
    """dense_frac is pure SCHEDULING: march-every-gen-0-chunk (0.0, the
    pre-round-3 behavior) and pack-every-chunk (2.0: gen 0 never touches
    the MLP, every live ray marches lane-dense from the queue) must both
    stay bit-exact vs the uninterrupted full march. qcap_frac=1 for the
    pack-all case so the whole live set fits without tripping the
    overflow fallback (which would pass this test vacuously)."""
    shared, bank, ob, vb, key, idep, ref = scene
    for frac, qf in ((0.0, 2), (2.0, 1)):
        res = jax.jit(lambda frac=frac, qf=qf: queue_march(
            shared, bank, ob, vb, key, idep, MARCH, block=512,
            gen_caps=(6, 16), qcap_frac=qf, dense_frac=frac,
            interpret=True,
        ))()
        _assert_exact(res, ref, key)


def test_queue_march_overflow_fallback(scene):
    """A queue too small for the survivors must trip the overflow flag
    and fall back to the plain full-width march — never drop rays."""
    shared, bank, ob, vb, key, idep, ref = scene
    res = jax.jit(lambda: queue_march(
        shared, bank, ob, vb, key, idep, MARCH, block=512,
        gen_caps=(2,), qcap_frac=10 ** 6, interpret=True,
    ))()
    _assert_exact(res, ref, key)


def test_queue_march_shared_origin(scene):
    """[F, 1, 3] shared-origin input broadcasts to the same rays. XLA may
    fuse the broadcast operand into the ray-setup arithmetic with 1-ulp
    rounding differences (measured: 3/3072 elements at 2.4e-7), so this
    variant gets a float tolerance instead of the bit-exact bar."""
    shared, bank, ob, vb, key, idep, ref = scene
    d, hit, msdf, dam, lastf, steps, unres = jax.jit(lambda: queue_march(
        shared, bank, ob[:, :1, :], vb, key, idep, MARCH, block=512,
        gen_caps=(6, 16), interpret=True,
    ))()
    act = np.asarray(key != 2)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(d)[act], np.asarray(ref.depth)[act], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(msdf), np.asarray(ref.min_sdf), atol=1e-6
    )
