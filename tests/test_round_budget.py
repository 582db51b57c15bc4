"""Layout-independence of the multi-round fine march budget.

Regression for a round-2 latent bug found by the round-3 flagship
multichip gate: intermediate capped rounds marched only a static n/4
bucket with NO overflow guard, so when survivors exceeded the bucket
(rough decoder, tight budgets — exactly the multichip dryrun's config)
the overflow rays silently skipped a round and the TOTAL step budget
became layout-dependent: a sharded band (small n) and the full frame
(large n) returned different hits/depths, breaking the sharded path's
plan-exactness guarantee.

The invariant under test: fine_march_rounds results are a pure function
of each ray's (seed, class, caps) — independent of how many rays share
the call (full frame vs horizontal bands) and of live_frac.
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
    fine_march_rounds,
    fold_bias_bank,
    pack_shared,
)

# deliberately ROUGH decoder + TIGHT budget: many rays survive the cap-4
# round, overflowing the n/4 bucket of the big layout
MARCH = MarchConfig(max_steps=24, convergence_eps=2e-3, depth_eps=5e-4)
IMG = 32
F = 2


@pytest.fixture(scope="module")
def plan():
    dcfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,))
    params, z0 = fit_decoder_to_sdf(
        lambda p: torus_sdf(0.55, 0.2)(None, p), dcfg, steps=150, batch=512
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
        tl, ob.reshape(F, IMG, IMG, 3), vb.reshape(F, IMG, IMG, 3), (4,), 0.05
    )
    key, idep, _ = plan_from_maps(maps)
    return shared, bank, ob, vb, key, idep


def _run(shared, bank, o, v, key, idep, live_frac, difficulty_repack=None):
    return jax.jit(
        lambda: fine_march_rounds(
            shared, bank, o, v, key, idep, MARCH, block=512,
            round_caps=(4, 12), interpret=True, live_frac=live_frac,
            return_steps=True, difficulty_repack=difficulty_repack,
        )
    )()


def test_difficulty_repack_is_pure_scheduling(plan):
    """The |last f|-quantized repack (production default at F >= 48 —
    never reached by small-F tests, so forced on here) regroups
    survivors between rounds but must leave every per-ray result
    bit-identical: depth, hit, min-SDF, and the per-ray step budget."""
    shared, bank, ob, vb, key, idep = plan
    base = _run(shared, bank, ob, vb, key, idep, 3, difficulty_repack=False)
    qf = _run(shared, bank, ob, vb, key, idep, 3, difficulty_repack=True)
    for a, b, nm in zip(base, qf, ("depth", "hit", "min_sdf", "steps")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"difficulty repack changed {nm}",
        )


def test_band_vs_full_frame_budget(plan):
    """Full frame == the same rays marched band-by-band, bit-for-bit on
    hits and per-ray step budgets."""
    shared, bank, ob, vb, key, idep = plan
    d1, h1, m1, st1 = _run(shared, bank, ob, vb, key, idep, live_frac=3)
    # overflow must actually occur in the big layout for this test to
    # bite: >512 live rays in at least one frame after classification
    assert int(np.asarray((key != 2).sum(axis=1)).max()) > 512

    rows_per_band = 8
    for b in range(IMG // rows_per_band):
        sl = slice(b * rows_per_band * IMG, (b + 1) * rows_per_band * IMG)
        d2, h2, m2, st2 = _run(
            shared, bank, ob[:, sl], vb[:, sl], key[:, sl], idep[:, sl],
            live_frac=2,
        )
        np.testing.assert_array_equal(
            np.asarray(h1)[:, sl], np.asarray(h2),
            err_msg=f"band {b}: hit mask differs from full frame",
        )
        np.testing.assert_array_equal(
            np.asarray(st1)[:, sl], np.asarray(st2),
            err_msg=f"band {b}: per-ray step budgets differ",
        )
        both = np.asarray(h1)[:, sl] & np.asarray(h2)
        np.testing.assert_allclose(
            np.asarray(d1)[:, sl][both], np.asarray(d2)[both], atol=1e-6,
            err_msg=f"band {b}: hit depths differ",
        )


def test_return_flags_do_not_change_results(plan):
    """Round-4 payload diet: dam/stp/lsdf are created and sorted only
    when their flag asks for them. Flag combinations are pure OUTPUT
    selection — the core triple (and each optional field, when present)
    must be bit-identical across combinations, including the payload-free
    return_unres path the proxy verify stage uses."""
    shared, bank, ob, vb, key, idep = plan

    def run(**flags):
        return jax.jit(
            lambda: fine_march_rounds(
                shared, bank, ob, vb, key, idep, MARCH, block=512,
                round_caps=(4, 12), interpret=True, live_frac=3, **flags
            )
        )()

    full = run(return_anchor=True, return_steps=True, return_last=True)
    d, h, m, dam, stp, lsdf, unres = full

    combos = [
        dict(),
        dict(return_unres=True),
        dict(return_anchor=True),
        dict(return_steps=True),
        dict(return_last=True),
        dict(return_anchor=True, return_unres=True),
    ]
    for flags in combos:
        out = list(run(**flags))
        for nm, ref in (("depth", d), ("hit", h), ("min_sdf", m)):
            np.testing.assert_array_equal(
                np.asarray(out.pop(0)), np.asarray(ref),
                err_msg=f"{flags}: {nm}",
            )
        if flags.get("return_anchor"):
            np.testing.assert_array_equal(
                np.asarray(out.pop(0)), np.asarray(dam),
                err_msg=f"{flags}: dam",
            )
        if flags.get("return_steps"):
            np.testing.assert_array_equal(
                np.asarray(out.pop(0)), np.asarray(stp),
                err_msg=f"{flags}: steps",
            )
        if flags.get("return_last"):
            np.testing.assert_array_equal(
                np.asarray(out.pop(0)), np.asarray(lsdf),
                err_msg=f"{flags}: lsdf",
            )
        if flags.get("return_last") or flags.get("return_unres"):
            np.testing.assert_array_equal(
                np.asarray(out.pop(0)), np.asarray(unres),
                err_msg=f"{flags}: unres",
            )
        assert not out, f"{flags}: unexpected extra outputs"
