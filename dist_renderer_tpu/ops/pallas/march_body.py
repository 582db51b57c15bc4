"""THE march-step body shared by every Mosaic march kernel.

Exactly one implementation of (a) the fused DeepSDF MLP in the kernel's
[feature(sublane), ray(lane)] layout and (b) the bracket-secant march
while_loop, consumed by:

  - ops/pallas/fused_march.py   (single-frame grid kernel)
  - ops/pallas/batched_march.py (multi-frame grid kernel AND the
    one-grid-step persistent kernel)

The three kernels previously carried byte-identical copies of this body;
a seed-heuristic or convergence change had to land three times in
lockstep (round-2 VERDICT "what's weak" #2). They now differ ONLY in how
rays/weights/biases reach the body (BlockSpec pipelining vs manual DMA,
per-layer bias refs vs a one-hot-selected bias-bank column).

Algorithm (SURVEY.md §3.1, rebuilt): aggressive stepping d += alpha*f
while unbracketed, switch to guarded secant (regula falsi with a 5%
bisection clamp) once a sign change brackets the hit — converges
geometrically regardless of learned-SDF noise, where the reference's
damped fixed-point corrector diverges (docs/PERFORMANCE.md idea 1).

Mosaic constraints honored here (CLAUDE.md kernel rules): no i1 vectors
in loop carries (flags travel as f32 0/1), lax.while_loop for the real
early exit, fp32 accumulation in the dots with one rounding per
activation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_BIG = -3.0e38  # stand-ins for +-inf that survive bf16/fp32 where-games
_POS_BIG = 3.0e38


def mlp_apply(kinds, w_refs, biases, final_tanh, p8, out_rows=1,
              p8_lo=None):
    """One fused MLP eval: p8 [8, B] bf16 (rows 0-2 = xyz) -> sdf [1, B] fp32.

    out_rows: leading output rows to return (1 for SDF decoders — the
    march kernels; 3 for RGB heads via ops/pallas/mlp_eval.py).

    kinds: per-layer input descriptor 'h' / 'x' / 'hx' (hidden and/or
    network-input term — the skip-concat layer is 'hx'). w_refs: weight
    pl.Refs in layer order, h-weight before x-weight within a layer, read
    AT USE so dead blocks that skip the march never touch them (an
    up-front materialization made every dead block pay an ~11.6 us VMEM
    sweep — scripts/diag_kernel.py). biases: per-layer arrays
    broadcastable against the layer output [out_p, B] (a [out_p, 1]
    column from per-layer refs or a bias-bank one-hot reduction).

    p8_lo: optional bf16 LOW HALF of the input positions (bf16x2 split:
    p8_lo = bf16(p_fp32 - fp32(p8))). When given, every 'x' dot runs
    twice (hi + lo, fp32 accumulation) — the x-dots are [out_p, 8] and
    cost ~1.5% of a hidden dot, so this removes the ~ulp(|p|) ~ 4e-3
    bf16 POSITION quantization nearly for free. The hidden-layer
    rounding noise (~5e-4) remains; used by the proxy verify
    certification probes where probe spacing is ~the quantum.

    Precision: dots accumulate in fp32 and round ONCE to bf16 at each
    activation. bf16 accumulation was tried and rejected — p95 ~3.6e-3
    noise on the sdf value, beyond the march's own convergence eps.
    """
    h = None
    wi = 0
    n_layers = len(kinds)
    for li, kind in enumerate(kinds):
        acc = None
        if "h" in kind:
            acc = jax.lax.dot_general(
                w_refs[wi][:, :], h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            wi += 1
        if "x" in kind:
            xz = jax.lax.dot_general(
                w_refs[wi][:, :], p8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if p8_lo is not None:
                xz = xz + jax.lax.dot_general(
                    w_refs[wi][:, :], p8_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc = xz if acc is None else acc + xz
            wi += 1
        acc = acc + biases[li]
        if li < n_layers - 1:
            h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
        else:
            h = acc
    sdf = h[0:out_rows, :]
    if final_tanh:
        sdf = jnp.tanh(sdf)
    return sdf


def default_rows(d, zeros):
    """Init-state output rows for rays that never march (dead blocks /
    skip class): depth and d_at_min at the seed anchor, +inf min/last sdf,
    zero hit/steps/unresolved/bracketed. Layout must match march_rows."""
    big = jnp.full_like(d, _POS_BIG)
    return jnp.concatenate([d, zeros, big, d, big, zeros, zeros, zeros], axis=0)


def make_carry(d0, act0, *, hit=None, d_lo=None, f_lo=None, d_hi=None,
               f_hi=None, min_sdf=None, d_at_min=None, last_f=None,
               steps=None, unres=None):
    """Build the 12-tuple march carry. Defaults give a FRESH march; the
    work-queue kernel overrides fields to CONTINUE a paused ray exactly
    where it left off (depth, bracket, min-SDF accumulators, step count —
    the march step is Markov in this carry, so a continued march is
    bit-identical to an uninterrupted one)."""
    f32 = jnp.float32
    B = d0.shape[1]
    zeros = jnp.zeros((1, B), f32)

    def dflt(x, val):
        return x if x is not None else jnp.full((1, B), val, f32)

    return (
        d0,                                   # d
        act0,                                 # active flag
        hit if hit is not None else zeros,    # hit flag
        dflt(d_lo, _NEG_BIG),
        dflt(f_lo, _POS_BIG),
        dflt(d_hi, _POS_BIG),
        dflt(f_hi, _NEG_BIG),
        dflt(min_sdf, _POS_BIG),
        d_at_min if d_at_min is not None else d0,
        dflt(last_f, _POS_BIG),
        steps if steps is not None else zeros,
        unres if unres is not None else zeros,  # exhausted-without-bracket
    )


def rows_from_carry(outc):
    """Format a final march carry as the standard [8, B] output rows:
    depth, hit, min_sdf, depth_at_min, last_f, steps, unresolved-at-exit,
    owns-a-bracket."""
    (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
     last_f, steps, unres_f) = outc
    f32 = jnp.float32
    brk = ((d_lo > _NEG_BIG / 2) & (d_hi < _POS_BIG / 2)).astype(f32)
    return jnp.concatenate(
        [d, hit_f, min_sdf, d_at_min, last_f, steps,
         jnp.maximum(act_f, unres_f), brk],
        axis=0,
    )


def march_loop(mlp, o, v, near, far, march, max_steps, salvage, carry0,
               kmax=None):
    """Run the bracket-secant march while_loop from an arbitrary carry.

    kmax bounds THIS call's block iterations (a work-queue generation
    cap — rays still active at kmax are paused, their carry rows
    requeued); max_steps is the per-ray TOTAL budget (the carry's step
    counter is compared against it for exhaustion). kmax=None means
    max_steps. Returns the final carry.
    """
    eps = march.convergence_eps
    deps = march.depth_eps
    alpha = march.alpha
    margin = march.far_margin
    f32 = jnp.float32
    B = o.shape[1]
    if kmax is None:
        kmax = max_steps

    def march_one(c):
        (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
         last_f, steps, unres_f) = c
        act = act_f > 0.5
        p = o + d * v
        p8 = jnp.concatenate([p, jnp.zeros((5, B), f32)], axis=0)
        f = mlp(p8.astype(jnp.bfloat16))

        better = act & (f < min_sdf)
        min_sdf = jnp.where(better, f, min_sdf)
        d_at_min = jnp.where(better, d, d_at_min)

        outside = f > 0.0
        d_lo = jnp.where(act & outside, d, d_lo)
        f_lo = jnp.where(act & outside, f, f_lo)
        d_hi = jnp.where(act & ~outside, d, d_hi)
        f_hi = jnp.where(act & ~outside, f, f_hi)
        bracketed = (d_lo > _NEG_BIG / 2) & (d_hi < _POS_BIG / 2)
        width = d_hi - d_lo

        converged = act & ((jnp.abs(f) < eps) | (bracketed & (width < deps)))

        d_aggr = d + alpha * f
        denom = f_hi - f_lo
        secant = (d_lo * f_hi - d_hi * f_lo) / jnp.where(denom == 0.0, 1.0, denom)
        secant = jnp.clip(secant, d_lo + 0.05 * width, d_hi - 0.05 * width)
        d_back = d + f
        d_next = jnp.where(bracketed, secant, jnp.where(outside, d_aggr, d_back))

        steps = steps + jnp.where(act, 1.0, 0.0)
        exhausted = steps >= float(max_steps)
        escaped = (~bracketed) & ((d_next > far) | (d_next < near - margin))
        missed = act & ~converged & (escaped | exhausted)
        if salvage:
            # final march: accept the bracket midpoint on exhaustion
            salvaged = act & ~converged & exhausted & bracketed
        else:
            # step-capped round: bracketed-but-unconverged rays REQUEUE
            # (midpoint depth at a small cap can be off by width/2)
            salvaged = jnp.zeros_like(act)
        missed = missed & ~salvaged
        converged = converged | salvaged

        still = act & ~converged & ~missed
        d = jnp.where(still, d_next, jnp.where(salvaged, 0.5 * (d_lo + d_hi), d))
        last_f = jnp.where(act, f, last_f)
        hit_f = jnp.maximum(hit_f, jnp.where(converged, 1.0, 0.0))
        open_exh = act & ~converged & exhausted & (
            jnp.ones_like(act) if not salvage else ~bracketed
        )
        unres_f = jnp.maximum(unres_f, jnp.where(open_exh, 1.0, 0.0))
        return (d, jnp.where(still, 1.0, 0.0), hit_f, d_lo, f_lo, d_hi,
                f_hi, min_sdf, d_at_min, last_f, steps, unres_f)

    # Genuine early exit: the while_loop ENDS when the block's rays are
    # all done — a fori_loop + cond still cycles max_steps iterations.
    def loop_cond(kc):
        k, c = kc
        return (k < kmax) & (jnp.max(c[1]) > 0.5)

    def loop_body(kc):
        k, c = kc
        return (k + 1, march_one(c))

    _, outc = jax.lax.while_loop(loop_cond, loop_body, (0, carry0))
    return outc


def march_rows(mlp, o, v, d0, near, far, act0, march, max_steps, salvage):
    """Fresh full march for one ray block, formatted as output rows.

    mlp: p8_bf16 [8, B] -> sdf [1, B] fp32 closure (weights/biases bound
    by the calling kernel). o [3, B], v [3, B]; d0/near/far/act0 [1, B]
    fp32 (act0 is a 0/1 flag). march supplies eps/alpha/margins;
    max_steps the budget; salvage=True accepts the bracket midpoint on
    exhaustion (final round), salvage=False requeues
    bracketed-but-unconverged rays (step-capped rounds).

    Returns [8, B] fp32 rows: depth, hit, min_sdf, depth_at_min, last_f,
    steps, unresolved-at-exit, owns-a-bracket.
    """
    carry0 = make_carry(d0, act0)
    outc = march_loop(mlp, o, v, near, far, march, max_steps, salvage, carry0)
    return rows_from_carry(outc)
