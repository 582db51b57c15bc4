"""Differentiable rendering: march (no grad) + one differentiable recompute.

This is the rebuild of ``SDFRenderer`` in the reference's
``core/sdfrenderer/renderer.py`` (SURVEY.md §3.1-§3.2). The single most
important design fact carries over: the march runs entirely without
gradient tracking, and the returned depth is re-expressed as

    depth = stop_gradient(d*) + f_theta(z, o + stop_gradient(d*) . v)

so gradients w.r.t. the latent code, decoder params, and camera pose flow
only through ONE decoder evaluation at the surface (memory flat in march
steps). An optional "ift" mode divides by the stop-gradient'ed directional
derivative (the exact implicit-function-theorem Jacobian), which is better
conditioned at grazing angles.

`sdf_fn(latent, points) -> sdf` is any latent-conditioned SDF — a bound
neural decoder or an analytic oracle.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, RenderConfig
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.tracer import (
    TraceResult,
    sphere_trace,
    sphere_trace_compact,
)

_sg = jax.lax.stop_gradient


def _trace(march_fn, origins, dirs, cfg: RenderConfig, init_depth=None,
           init_active=None):
    """Dispatch: fused Pallas kernel > compaction > masked tracer."""
    if cfg.use_pallas and hasattr(march_fn, "trace"):
        return march_fn.trace(origins, dirs, cfg.march, init_depth, init_active)
    if cfg.march.use_compaction:
        return sphere_trace_compact(
            march_fn, origins, dirs, cfg.march, init_depth,
            bucket_frac=cfg.march.bucket_frac,
            inner_steps=cfg.march.inner_steps,
            init_active=init_active,
        )
    return sphere_trace(march_fn, origins, dirs, cfg.march, init_depth,
                        init_active)


class C2FPlan(NamedTuple):
    """Per-fine-ray plan from the coarse levels (all [N], stop-gradient)."""

    init_depth: jax.Array   # seed distance (NaN = start at sphere entry)
    init_active: jax.Array  # False = skip class (whole neighborhood missed)
    order: jax.Array        # class-sorted ray permutation (work-homogeneous
                            # Pallas blocks); identity when classify is off


def c2f_plan(march_fn, origins, dirs, cfg: RenderConfig) -> C2FPlan:
    """Coarse-to-fine planning (SURVEY.md §3.1 'coarse-to-fine' / §7 hard
    part 5, rebuilt with static shapes). Marches strided sub-grids of the
    pixel lattice, then classifies every fine ray from its 3x3 coarse
    neighborhood:

      - all neighbors hit  -> INTERIOR: seed at (min neighbor depth -
        backoff) — conservative, a fine ray never starts beyond its true
        surface; converges in a few secant steps.
      - no neighbor hit    -> SKIP: the fine march is skipped entirely;
        the ray's margin anchor (depth) is set to the coarse min-SDF
        depth so the differentiable silhouette recompute samples there.
      - mixed              -> RIM: full march from the sphere entry (the
        only rays that genuinely need the whole schedule).

    Rays are additionally ordered rim -> interior -> skip (stable sort) so
    fixed ray blocks are work-homogeneous: skip blocks die instantly,
    interior blocks exit after a few steps, and only O(perimeter) rim
    blocks run long. This is the TPU rebuild of the reference's dynamic
    ray subdivision + active-set shrinkage, with one sort per frame
    instead of per step.

    Entirely non-differentiable (runs under stop_gradient). The pyramid +
    classification logic is the shared ops/c2f.py implementation (one copy
    for the single-frame, batched, and sharded paths)."""
    import dataclasses as _dc
    import types

    from dist_renderer_tpu.ops.binning import counting_sort_perm
    from dist_renderer_tpu.ops.c2f import classify_pyramid, plan_from_maps

    h_full, w_full = cfg.img_h, cfg.img_w
    n = h_full * w_full

    # coarse levels only inform classification/seeding: cap their march.
    # (Relaxing coarse convergence eps was tried and REGRESSED: block
    # residency is the max over a block's rays, so cheaper per-ray coarse
    # convergence saves no block time, while the looser depth error can
    # exceed the flat-window backoff and poison tight seeds.)
    coarse_cfg = _dc.replace(
        cfg,
        march=_dc.replace(
            cfg.march,
            max_steps=min(cfg.march.max_steps, cfg.march.c2f_coarse_steps),
        ),
    )

    def trace_level(o_l, v_l, seed, active, stride):
        """[1, R] level -> [1, R] trace fields, through this renderer's
        tracer dispatch, with the per-level work-homogeneous ordering
        (skip-last, rim-first) the fused kernel path wants."""
        o1, v1 = o_l[0], v_l[0]
        if seed is None:
            res = _trace(march_fn, o1, v1, coarse_cfg, None, None)
        elif cfg.march.c2f_classify:
            init, act = seed[0], active[0]
            key = jnp.where(act & jnp.isnan(init), 0,
                            jnp.where(act, 1, 2)).astype(jnp.int32)
            order, inv = counting_sort_perm(key, 3)
            res_s = _trace(
                march_fn, o1[order], v1[order], coarse_cfg,
                init[order], act[order],
            )
            res = jax.tree_util.tree_map(
                lambda a: jnp.take(a, inv, axis=0)
                if (a.ndim and a.shape[0] == inv.shape[0]) else a,
                res_s,
            )
        else:
            res = _trace(march_fn, o1, v1, coarse_cfg, seed[0], active[0])
        return types.SimpleNamespace(
            depth=res.depth[None], hit=res.hit[None],
            unresolved=res.unresolved[None],
            depth_at_min=res.depth_at_min[None], min_sdf=res.min_sdf[None],
        )

    maps = classify_pyramid(
        trace_level,
        origins.reshape(1, h_full, w_full, 3),
        dirs.reshape(1, h_full, w_full, 3),
        cfg.c2f_strides_valid(),
        cfg.march.c2f_backoff,
    )
    if maps is None:  # no valid strides: no plan
        return C2FPlan(
            init_depth=jnp.full((n,), jnp.nan),
            init_active=jnp.ones((n,), bool),
            order=jnp.arange(n),
        )

    if not cfg.march.c2f_classify:
        return C2FPlan(
            init_depth=maps.seed.reshape(-1),
            init_active=jnp.ones((n,), bool),
            order=jnp.arange(n),
        )

    key, init_depth, skip = plan_from_maps(maps)
    # rim rays march seeded when a neighbor provides a bound (the
    # reference's subdivision also inherits the parent depth); ordering
    # rim -> interior -> skip keeps fixed ray blocks work-homogeneous
    order, _ = counting_sort_perm(key[0], 3)
    return C2FPlan(init_depth=init_depth[0], init_active=~skip[0], order=order)


def c2f_seed_depth(march_fn, origins, dirs, cfg: RenderConfig) -> jax.Array:
    """Back-compat: seed-only view of c2f_plan."""
    return c2f_plan(march_fn, origins, dirs, cfg).init_depth


class RenderOutput(NamedTuple):
    """Rendered maps. Flat [N] from render_rays; [H,W] from render()."""

    depth: jax.Array       # differentiable depth (background sentinel where miss)
    mask: jax.Array        # bool hit mask (non-differentiable)
    normal: jax.Array      # [*, 3] unit surface normal (0 where miss)
    min_sdf: jax.Array     # differentiable per-ray min-SDF margin (silhouette)
    points: jax.Array      # [*, 3] surface points (differentiable via depth)
    trace: TraceResult     # raw march diagnostics (all stop-gradient)




def render_rays(
    sdf_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    cfg: RenderConfig,
    march_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    init_depth: Optional[jax.Array] = None,
    init_active: Optional[jax.Array] = None,
    trace: Optional[TraceResult] = None,
) -> RenderOutput:
    """Trace + differentiable composition for a flat ray batch [N, 3].

    march_fn: optional fast point function for the non-differentiable hot
    loop (e.g. the latent-folded bf16 decoder, models/folded.py). The
    differentiable recompute always goes through `sdf_fn` in fp32, so a
    low-precision march costs no gradient accuracy — the IFT/last-step
    eval re-anchors the depth on the fp32 surface.

    trace: optional precomputed march result (e.g. from the batched c2f
    pipeline) — only the differentiable composition runs here then."""
    trace_fn = march_fn if march_fn is not None else (
        lambda p: sdf_fn(_sg(latent), p)
    )
    if trace is None:
        trace = _trace(trace_fn, _sg(origins), _sg(dirs), cfg, init_depth,
                       init_active)
    trace = jax.tree_util.tree_map(_sg, trace)

    # Spatial gradient (normals + IFT denominator): precision-insensitive
    # (normalized / stop-gradient'ed) — take it from the cheap march
    # function when one exists instead of the full-precision decoder.
    # The fallback rides sdf_fn's plain `.cheap` sibling when present:
    # make_precise_sdf is a custom_vjp function, and forward-mode (the
    # jvp computing the IFT denominator) cannot differentiate those.
    # EXCEPTION: a distilled-proxy march (march_fn.proxy_march — see
    # make_march_factory) must NOT supply gradients: its spatial gradient
    # carries percent-level model error (bad normals) and its slope at
    # the proxy surface can be arbitrarily shallow where the full field's
    # is not, which poisons the frozen-denominator Newton polish
    # (measured: 0.46 depth excursions on rim rays). The proxy marches;
    # the FULL decoder supplies every derivative.
    _base = getattr(sdf_fn, "cheap", sdf_fn)
    use_march_g = march_fn is not None and not getattr(
        march_fn, "proxy_march", False
    )
    g_fn = march_fn if use_march_g else (
        lambda p: _base(_sg(latent), p)
    )

    use_sdg = (
        cfg.grad.mode == "ift" and cfg.grad.recompute == "pallas"
        and not cfg.grad.fused_dd
        and cfg.normal_eps == 0.0 and hasattr(sdf_fn, "sdg_builder")
    )

    # verify_hits="polish": the proxy trace's confident hits skipped the
    # verify march, so compose() owns their genuineness — the fp32 Newton
    # polish re-anchors depth on the FULL decoder and any ray whose
    # polished |f| stays above the march's own hit criterion
    # (convergence_eps) is a proxy false hit: demote it to a miss. Its
    # min_sdf naturally becomes the polished s (the dip value, WITH the
    # decoder gradient) via the hit-branch scatter below, so silhouette
    # losses see a correct near-zero margin on exactly the rays that
    # matter.
    demote = (
        cfg.march.proxy_verify_hits in ("polish", "polish-all")
        and getattr(march_fn, "proxy_march", False)
    )
    if demote and cfg.grad.polish_iters < 2:
        raise ValueError(
            "proxy_verify_hits='polish' requires GradConfig.polish_iters "
            ">= 2: the demote verdict comes from the safeguarded Newton "
            "iterations (polish_iters=1 runs zero of them, leaving hit "
            "depth at raw proxy error and false hits undetected)"
        )

    def compose(o, v, d0, anchor, hit):
        """Differentiable composition at any ray width.

        ONE differentiable decoder eval serves both outputs: hit rays
        anchor at the converged surface point (depth + near-zero margin),
        miss rays at their recorded min-SDF point (silhouette margin —
        SURVEY.md §3.2: "the silhouette's min-SDF sample is recomputed
        differentiably at its recorded point")."""
        p_surf = o + anchor[:, None] * v           # o/v live (pose grads)
        if use_sdg:
            # ONE fused Pallas launch: precise value + IFT denominator +
            # spatial gradient, VMEM-resident (GradConfig.recompute docs;
            # the XLA equivalents are HBM-bandwidth-bound at this width).
            # dd and g are value-exact, stop-gradient by construction.
            sdg = sdf_fn.sdg_builder(cfg.grad.recompute_block)
            s, dd_raw, g_raw = sdg(latent, p_surf, _sg(v))
            denom = jnp.minimum(_sg(dd_raw), -cfg.grad.ift_min_denom)
            # extra Newton refinements: unlike the XLA path (frozen
            # denominator — a fresh jvp per iteration would double its
            # cost), the kernel returns a fresh directional derivative
            # for free, so these are full Newton steps — SAFEGUARDED:
            # a step is accepted only where the denominator is off the
            # clamp (a real front-facing slope) AND the residual |f|
            # shrank. This makes extra iterations monotone in |f|, so
            # FALSE hits (|f| < eps without a crossing — a loose-eps
            # march produces these on grazing rays) cannot diverge;
            # Newton would otherwise chase a root that does not exist.
            # under demote (polish-verify) the seeds carry proxy-sized
            # error, which exposes two flat-field failure modes the
            # march-mode |s2| <= |s| acceptance tolerates: WANDERING
            # (equal-|f| steps through a flat |f|~eps pocket walk the
            # depth arbitrarily far at zero residual cost) and the final
            # clamped-denominator extrapolation (step = s/ift_min_denom
            # teleports a flat ray by up to e_field/ift_min_denom). So
            # polish-verify demands geometric progress per accepted step
            # and gates the final extrapolation on a real slope; march
            # mode keeps the round-3-measured behavior bit-for-bit.
            rho = 0.7 if demote else 1.0
            acc_any = jnp.zeros_like(hit)
            for _ in range(max(cfg.grad.polish_iters - 1, 0)):
                ok = hit & (_sg(dd_raw) < -cfg.grad.ift_min_denom)
                d_try = jnp.where(ok, d0 - s / denom, d0)
                p_try = o + jnp.where(hit, _sg(d_try), anchor)[:, None] * v
                s2, dd2, g2 = sdg(latent, p_try, _sg(v))
                accept = ok & (jnp.abs(_sg(s2)) <= rho * jnp.abs(_sg(s)))
                acc_any = acc_any | accept
                d0 = _sg(jnp.where(accept, d_try, d0))
                s = jnp.where(accept, s2, s)
                dd_raw = jnp.where(accept, _sg(dd2), _sg(dd_raw))
                g_raw = jnp.where(accept[:, None], g2, g_raw)
                denom = jnp.minimum(_sg(dd_raw), -cfg.grad.ift_min_denom)
            if demote:
                # flat-slope rays keep their seed depth as the VALUE (the
                # proxy march's crossing is the best point estimate there)
                # and carry zero depth-gradient — an IFT gradient through
                # a CLAMPED denominator is amplified noise, not signal
                ok_f = _sg(dd_raw) < -cfg.grad.ift_min_denom
                depth = d0 - jnp.where(ok_f, s, 0.0 * s) / denom
            else:
                depth = d0 - s / denom
            if demote:
                # demote only rays whose Newton WALKED somewhere and
                # bottomed out at a POSITIVE value above eps: an accepted
                # descent ending at s > eps is a genuine full-decoder dip
                # that never crosses — a proxy false hit. s < -eps is the
                # opposite: the point is INSIDE the full-decoder surface,
                # i.e. a true crossing whose depth the polish is still
                # pulling back — keep it (demoting these flipped true
                # hits whose proxy seed overshot the surface). Rays the
                # safeguard never moved (grazing slope under
                # ift_min_denom, or overshoot-rejected from the seed) are
                # fundamentally AMBIGUOUS from point evals alone — any
                # proxy hit satisfies |f_full| <= e_field at its claimed
                # crossing, so a stalled |s| in (eps, e_field] cannot
                # distinguish a displaced true hit from a shallow false
                # dip (measured at the 32^2 toy fixture: demoting stalled
                # rays flipped 12 TRUE rim hits). Stalled rays keep the
                # proxy verdict — the same borderline class as the band
                # contract; users needing exact rim verdicts use
                # verify_hits="march".
                false_dip = acc_any & (_sg(s) > cfg.march.convergence_eps)
                hit = hit & ~false_dip
            depth = jnp.where(hit, depth, cfg.background_depth)
            g = _sg(g_raw)
            normal = g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12
            )
            normal = jnp.where(hit[:, None], normal, 0.0)
            return depth, s, normal, hit
        if (cfg.grad.mode == "ift" and cfg.grad.fused_dd
                and hasattr(sdf_fn, "with_dd")):
            # fused precise VALUE + directional derivative: the tangent
            # chain rides the value forward pass (one extra bf16 matmul
            # per layer, relu-gated by the shared pre-activations)
            # instead of a separate jvp that re-runs the primal
            # (measured 8.0 -> ~1.7 ms per 512^2 bucket)
            s, dd = sdf_fn.with_dd(latent, p_surf, _sg(v))
            dd = _sg(dd)
        else:
            s = sdf_fn(latent, p_surf)             # precise VALUE (depth anchor)
            dd = None
        if cfg.grad.mode == "ift":
            # f(z, o + d(z,o,v) v) == 0  =>  dd = -df / (grad_x f . v).
            # The denominator only needs the DIRECTIONAL derivative along
            # v — forward-mode (fwd + tangent), cheaper than the full
            # vjp and, decoupled from it, XLA prunes the normals vjp
            # below whenever the loss ignores normals.
            if dd is None:
                _, dd = jax.jvp(g_fn, (_sg(p_surf),), (_sg(v),))
            denom = jnp.minimum(dd, -cfg.grad.ift_min_denom)  # front-facing: < 0
            # extra Newton refinements (stop-grad, frozen denominator) let a
            # loose-eps bf16 march still land on the fp32 surface; the LAST
            # step stays differentiable. SAFEGUARDED like the sdg path:
            # step only where the measured slope is off the clamp and
            # accept only monotone-|f| steps — the frozen CLAMPED
            # denominator otherwise turns a near-tangent ray into a
            # runaway (step = s/ift_min_denom each iteration; the round-3
            # "d 1.6 -> 16.1 in 3 iterations" divergence, previously
            # fixed only in the sdg path)
            ok = hit & (_sg(dd) < -cfg.grad.ift_min_denom)
            rho = 0.7 if demote else 1.0  # see the sdg-path comment
            acc_any = jnp.zeros_like(hit)
            for _ in range(max(cfg.grad.polish_iters - 1, 0)):
                d_try = jnp.where(ok, d0 - s / denom, d0)
                p_try = o + jnp.where(hit, _sg(d_try), anchor)[:, None] * v
                s2 = sdf_fn(latent, p_try)
                accept = ok & (jnp.abs(_sg(s2)) <= rho * jnp.abs(_sg(s)))
                acc_any = acc_any | accept
                d0 = _sg(jnp.where(accept, d_try, d0))
                s = jnp.where(accept, s2, s)
                p_surf = jnp.where(accept[:, None], p_try, p_surf)
            if demote:
                # flat-slope guard on the final extrapolation (sdg-path
                # comment; here the slope gate is frozen at the seed)
                ok_f = _sg(dd) < -cfg.grad.ift_min_denom
                depth = d0 - jnp.where(ok_f, s, 0.0 * s) / denom
            else:
                depth = d0 - s / denom
        else:  # "last_step" (DIST default): one unit marching step
            depth = d0 + s
        if demote:
            # positive-dip criterion + walked/grazing guard, as in the
            # sdg path
            false_dip = _sg(s) > cfg.march.convergence_eps
            if cfg.grad.mode == "ift":
                false_dip = false_dip & acc_any
            hit = hit & ~false_dip
        depth = jnp.where(hit, depth, cfg.background_depth)

        # Normals: grad_x f at the surface, normalized. Differentiable
        # w.r.t. latent (normal-map losses); central differences optional.
        if cfg.normal_eps > 0.0:
            eps = cfg.normal_eps
            offs = jnp.array(
                [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
                 [0, 0, -1]],
                p_surf.dtype,
            ) * eps
            probe = (p_surf[:, None, :] + offs[None, :, :]).reshape(-1, 3)
            sv = sdf_fn(latent, probe).reshape(-1, 6)
            g = jnp.stack(
                [sv[:, 0] - sv[:, 1], sv[:, 2] - sv[:, 3], sv[:, 4] - sv[:, 5]],
                axis=-1,
            ) / (2.0 * eps)
        else:
            # spatial gradient from the cheap march function's vjp —
            # precision-insensitive (normalized below); pruned by XLA when
            # the caller never consumes normals
            _, pullback = jax.vjp(g_fn, _sg(p_surf))
            (g,) = pullback(jnp.ones_like(s))
        normal = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        normal = jnp.where(hit[:, None], normal, 0.0)
        return depth, s, normal, hit

    n = origins.shape[0]
    d0 = trace.depth
    anchor = jnp.where(trace.hit, d0, trace.depth_at_min)
    frac = cfg.grad.compact_frac
    bucket = 0
    if frac > 0 and n >= cfg.grad.compact_min:
        bucket = min(((n // frac + 511) // 512) * 512, n)
    if 0 < bucket < n:
        # Hit-compacted recompute: the precise eval + the normals/IFT vjp
        # only matter on HIT rays (~20% of a typical frame); misses only
        # need a cheap differentiable margin. Sort hit-first (stop-grad
        # permutation), run the precise path on a static bucket prefix,
        # scatter back; lax.cond falls back to full width whenever hits
        # overflow the bucket, so correctness never depends on the scene.
        # (A 2-class counting sort — ops/binning.py — was A/B'd here in
        # round 5 and measured SLOWER than the payload lax.sort at 512^2
        # on v5e: 3.78 vs 3.17 ms standalone; the cumsum+scatter passes
        # lose to the fused sort. scripts/diag_compose.py keeps both.)
        key = (~trace.hit).astype(jnp.int32)
        pix = jnp.arange(n, dtype=jnp.int32)
        _, pix_s = jax.lax.sort((key, pix), dimension=0, num_keys=1,
                                is_stable=True)
        idx_b = _sg(pix_s[:bucket])
        n_hit = jnp.sum(trace.hit)

        def bucket_branch():
            take = lambda a: jnp.take(a, idx_b, axis=0)
            d_b, s_b, n_b, h_b = compose(
                take(origins), take(dirs), take(d0), take(anchor),
                take(trace.hit),
            )
            # margins for the remainder: the march ALREADY evaluated the
            # SDF at each ray's min-SDF anchor — reuse that value as the
            # primal (free; the previous full-width bf16 re-eval cost
            # 9.3 ms/frame at 512^2) and attach the decoder vjp at the
            # anchor lazily via custom_vjp, so silhouette losses get the
            # exact same gradients and depth-only losses prune it all.
            # On the pallas-recompute path the margin backward routes
            # through the fused kernels too (VMEM-resident fwd+bwd
            # launches instead of a full-width HBM-bound XLA vjp, and
            # precise-forward gates — same fidelity win as the depth
            # gradient).
            cheap_fn = getattr(sdf_fn, "cheap", sdf_fn)

            # NOTE: every traced value the BACKWARD needs must enter as a
            # custom_vjp ARGUMENT (here: v, for the sdg kernel's dirs
            # operand) and ride the residuals. render() is itself jit'd
            # with static (sdf_fn, cfg, factory), so its jaxpr — including
            # this custom_vjp's bwd PYTHON CLOSURE — is cached across
            # calls; a bwd that closed over `dirs` from the enclosing
            # trace replayed a DEAD tracer when a later jit(grad(...))
            # reused the cached jaxpr ("No constant handler for
            # DynamicJaxprTracer" at cond lowering; hit by any
            # eager-render-then-jit-fit sequence on the pallas path).
            @jax.custom_vjp
            def lazy_margin(z, p, ms, v):
                return ms

            def _lm_fwd(z, p, ms, v):
                return ms, (z, p, v)

            def _lm_bwd(res, ct):
                z, p, v = res
                if use_sdg:
                    sdg_m = sdf_fn.sdg_builder(cfg.grad.recompute_block)
                    _, vjp = jax.vjp(
                        lambda zz, pp: sdg_m(zz, pp, v)[0], z, p
                    )
                else:
                    _, vjp = jax.vjp(cheap_fn, z, p)
                gz, gp = vjp(ct)
                return gz, gp, jnp.zeros_like(ct), jnp.zeros_like(v)

            lazy_margin.defvjp(_lm_fwd, _lm_bwd)
            p_anchor = origins + anchor[:, None] * dirs
            margins = lazy_margin(latent, p_anchor, _sg(trace.min_sdf),
                                  _sg(dirs))
            # min_sdf stays a SEPARATE output: fusing it into the shared
            # scatter forced the custom_vjp to run with zero cotangents
            # under depth-only losses (measured fwd+bwd 43 -> 72 ms);
            # kept apart, XLA prunes the whole margin path when unused
            min_sdf = margins.at[idx_b].set(s_b)

            # one fused scatter for depth + normals (separate .at[].set
            # scatters measured ~2x slower); under demote the final hit
            # mask rides the same scatter as a 5th float channel (rays
            # outside the bucket are misses whenever the cond took this
            # branch, so the zero base is their correct flag)
            mask_ch = 1 if demote else 0
            base = jnp.concatenate([
                jnp.full((1, n), cfg.background_depth, d_b.dtype),
                jnp.zeros((3 + mask_ch, n), n_b.dtype),
            ])
            vals = [d_b[None], n_b.T]
            if demote:
                vals.append(h_b[None].astype(n_b.dtype))
            outp = base.at[:, idx_b].set(jnp.concatenate(vals, axis=0))
            mask = outp[4] > 0.5 if demote else trace.hit
            return outp[0], min_sdf, outp[1:4].T, mask

        def full_branch():
            return compose(origins, dirs, d0, anchor, trace.hit)

        depth, min_sdf, normal, mask = jax.lax.cond(
            n_hit <= bucket, bucket_branch, full_branch
        )
    else:
        depth, min_sdf, normal, mask = compose(
            origins, dirs, d0, anchor, trace.hit)

    # Rays that never enter the bounding sphere: their margin VALUE is
    # the geometric sphere distance the trace recorded (the decoder was
    # never sampled there), but the GRADIENT keeps flowing through the
    # decoder eval at the closest-approach anchor — during optimization
    # a shape can transiently poke past the bounding sphere, and this
    # pull-back force is what recovers it (losing it made a silhouette
    # radius fit overshoot, tests/test_preprocess.py). The sg-trick
    # (value from the trace, tangents from the eval) keeps the compacted
    # and full-width branches agreeing on both value and gradient.
    from dist_renderer_tpu.ops.camera import ray_sphere_entry

    o_sg, v_sg = _sg(origins), _sg(dirs)
    _, _, enters = ray_sphere_entry(o_sg, v_sg, cfg.march.sphere_radius, 0.0)
    # computed locally — the tracers' min_sdf sentinel for non-entering
    # rays varies by path (geo margin on the Pallas wrappers, +inf on the
    # plain masked tracer)
    t_c = jnp.maximum(-jnp.sum(o_sg * v_sg, axis=-1), 0.0)
    geo = (
        jnp.linalg.norm(o_sg + t_c[:, None] * v_sg, axis=-1)
        - cfg.march.sphere_radius
    )
    min_sdf = jnp.where(enters, min_sdf, geo + min_sdf - _sg(min_sdf))

    p_out = origins + depth[:, None] * dirs
    return RenderOutput(
        depth=depth, mask=mask, normal=normal, min_sdf=min_sdf,
        points=p_out, trace=trace,
    )


def warm_from_trace(trace: TraceResult) -> Tuple[jax.Array, ...]:
    """Extract the warm-start state (depth, hitish, anchor, margin) the
    next optimizer iteration's render can classify from — configs #2-#4
    re-render the same camera while latent/pose move slightly, so the
    previous trace replaces the coarse pyramid (ops/c2f.py::warm_maps).
    unresolved counts as hit so step-capped rays are never wrongly
    skipped next iteration."""
    return (
        _sg(trace.depth),
        _sg(trace.hit | trace.unresolved),
        _sg(trace.depth_at_min),
        _sg(trace.min_sdf),
    )


def render_with_warm(sdf_fn, latent, camera, cfg, march_fn_factory,
                     carry, refresh: int):
    """One warm-started render inside an optimization loop.

    carry = (step, warm_state) threaded through utils.optim.fit's
    carry support; every `refresh` steps the full coarse pyramid runs
    (warm_maps' dilation bounds per-STEP silhouette motion, not drift).
    Returns (RenderOutput, next_carry). Differentiable w.r.t. latent and
    camera exactly like render()."""
    k, wstate = carry
    out = jax.lax.cond(
        (k % refresh) == 0,
        lambda w: render(sdf_fn, latent, camera, cfg, march_fn_factory),
        lambda w: render(sdf_fn, latent, camera, cfg, march_fn_factory, w),
        wstate,
    )
    return out, (k + 1, warm_from_trace(out.trace))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def render(
    sdf_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    camera: Camera,
    cfg: RenderConfig = RenderConfig(),
    march_fn_factory: Optional[Callable] = None,
    warm: Optional[Tuple[jax.Array, ...]] = None,
) -> RenderOutput:
    """Full-frame render: camera -> [H, W] maps.

    Mirrors the reference's ``SDFRenderer.render(latent, R, T)`` surface
    (depth + normal + silhouette in one pass).

    march_fn_factory: optional (latent,) -> point_fn builder for the hot
    loop (latent-folded / Pallas decoder).

    warm: optional warm_from_trace(previous out.trace) — inside an
    optimization loop, seeds + classification come from the previous
    iteration instead of the coarse pyramid (only on the Pallas
    trace_frame path; ignored otherwise)."""
    origins, dirs = pixel_rays(camera, cfg.img_h, cfg.img_w)
    march_fn = None
    if march_fn_factory is not None:
        march_fn = march_fn_factory(_sg(latent))
    if (cfg.use_pallas and cfg.march.coarse_to_fine and cfg.march.c2f_classify
            and march_fn is not None and hasattr(march_fn, "trace_frame")):
        # whole plan + march through the batched c2f machinery (F=1):
        # multi-round straggler re-binning, live-prefix launches, one
        # class sort — measurably faster than the plan/trace split below
        trace = jax.tree_util.tree_map(
            _sg,
            march_fn.trace_frame(
                _sg(origins), _sg(dirs), cfg.march, (cfg.img_h, cfg.img_w),
                warm=warm,
            ),
        )
        out = render_rays(sdf_fn, latent, origins, dirs, cfg,
                          march_fn=march_fn, trace=trace)
    elif cfg.march.coarse_to_fine and cfg.c2f_strides_valid():
        mf = march_fn or (lambda p: sdf_fn(_sg(latent), p))
        plan = jax.tree_util.tree_map(
            _sg, c2f_plan(mf, _sg(origins), _sg(dirs), cfg)
        )
        perm = plan.order
        inv = jnp.argsort(perm)
        out_p = render_rays(
            sdf_fn, latent,
            origins[perm], dirs[perm], cfg,
            march_fn=march_fn,
            init_depth=plan.init_depth[perm],
            init_active=plan.init_active[perm],
        )
        unperm = lambda a: None if a is None else jnp.take(a, inv, axis=0)
        out = RenderOutput(
            depth=unperm(out_p.depth),
            mask=unperm(out_p.mask),
            normal=unperm(out_p.normal),
            min_sdf=unperm(out_p.min_sdf),
            points=unperm(out_p.points),
            trace=None,
        )
    else:
        out = render_rays(sdf_fn, latent, origins, dirs, cfg, march_fn=march_fn)
    hw = (cfg.img_h, cfg.img_w)
    return RenderOutput(
        depth=out.depth.reshape(hw),
        mask=out.mask.reshape(hw),
        normal=out.normal.reshape(hw + (3,)),
        min_sdf=out.min_sdf.reshape(hw),
        points=out.points.reshape(hw + (3,)),
        trace=out.trace,
    )


def make_march_factory(params, dcfg: DecoderConfig, cfg: RenderConfig,
                       march_params=None, march_dcfg=None):
    """Build the (latent,) -> march point-fn factory for the hot loop:
    latent-folded bf16/fp32 decoder, wrapped for the fused Pallas kernel
    when cfg.use_pallas.

    march_params/march_dcfg: optional DISTILLED PROXY decoder for the
    march (models/proxy.py — ~8-10x fewer FLOPs/eval). The march is
    stop-gradient by design, so this changes no gradient path; the
    differentiable recompute stays on the caller's full `sdf_fn`. On the
    Pallas trace_frame path the proxy trace is VERIFIED: a second short
    full-decoder march re-derives depth and the hit mask from
    proxy-derived seeds (render_batched_c2f's proxy stage). On the plain
    paths the proxy marches alone — use GradConfig.polish_iters >= 2 so
    the full-decoder Newton in compose() re-anchors depth (grazing rays
    can keep a proxy-sized error tail there; the production path does
    not). Both decoders must share the latent space (the same z folds
    into either's biases)."""
    from dist_renderer_tpu.models.folded import fold_latent, make_point_fn

    dtype = cfg.dtype
    is_proxy = march_params is not None
    mparams = march_params if is_proxy else params
    mdcfg = (march_dcfg if march_dcfg is not None else dcfg) if is_proxy \
        else dcfg

    def factory(z):
        point_fn = make_point_fn(mparams, z, mdcfg, dtype)
        # render_rays reads this: a proxy march must not supply the IFT
        # denominator or normals (see the g_fn selection there)
        point_fn.proxy_march = is_proxy
        if cfg.use_pallas:
            from dist_renderer_tpu.ops.pallas.batched_march import (
                render_batched_c2f,
            )
            from dist_renderer_tpu.ops.pallas.fused_march import PallasMarchFn

            mf = PallasMarchFn(fold_latent(mparams, z, mdcfg), mdcfg,
                               point_fn)
            # trace_frame verifies the proxy trace against the full
            # decoder in-pipeline, so its TraceResult needs no special
            # handling downstream; the spatial-gradient exclusion
            # (proxy_march) still applies to point_fn uses
            mf.proxy_march = is_proxy

            def trace_frame(origins, dirs, march, img_hw, interpret=None,
                            warm=None):
                """Single-frame plan + march through the batched c2f
                pipeline (F=1): multi-round re-binning + live-prefix
                launches beat the split c2f_plan/trace path. Assumes the
                pinhole shared-origin layout render() produces.

                warm: optional (depth, hitish, anchor, margin) flat [N]
                arrays from the previous optimizer iteration's trace
                (warm_from_trace) — skips the coarse pyramid entirely.

                Inputs are stop-gradient'ed here: the march is
                non-differentiable by design, and the persistent kernel's
                input_output_aliases has no JVP rule — a live tangent
                reaching it is an error, not just waste."""
                if interpret is None:
                    # auto-select interpret off-TPU (same rule as the
                    # recompute kernels) so CPU runs/tests exercise the
                    # PRODUCTION trace_frame graph instead of silently
                    # requiring use_pallas=False
                    interpret = jax.default_backend() != "tpu"
                origins = _sg(origins)
                dirs = _sg(dirs)
                if warm is not None:
                    warm = tuple(_sg(a)[None] for a in warm)
                d, hit, msdf, dam, steps, lsdf, unres = render_batched_c2f(
                    params, dcfg, z[None], origins[None], dirs[None],
                    img_hw, march,
                    strides=march.c2f_strides,
                    coarse_steps=march.c2f_coarse_steps,
                    backoff=march.c2f_backoff,
                    shared_origin=True, return_anchor=True,
                    return_steps=True, return_last=True,
                    scheduler=march.scheduler, queue_caps=march.queue_caps,
                    queue_dense_frac=march.queue_dense_frac,
                    warm=warm,
                    proxy=(mparams, mdcfg) if is_proxy else None,
                    proxy_backoff=march.proxy_backoff,
                    proxy_band=march.proxy_band,
                    verify_mode=march.proxy_verify_mode,
                    verify_band=march.proxy_verify_band,
                    # "polish-all" is a BATCHED trace+finalize contract
                    # (weak candidates need finalize_hits_batched's
                    # asymmetric demote); the single-frame render path
                    # maps it to "polish" — band rays keep their genuine
                    # entry-seeded re-march and compose() handles hits
                    verify_hits=("polish"
                                 if march.proxy_verify_hits == "polish-all"
                                 else march.proxy_verify_hits),
                    verify_round_caps=march.proxy_verify_caps,
                    verify_gen_caps=march.proxy_verify_caps_queue,
                    proxy_block=march.proxy_block_width,
                    interpret=interpret,
                )
                from dist_renderer_tpu.ops.tracer import (
                    TraceResult, live_counts_from_steps,
                )

                # per-ray step counts keep the profiling subsystem's
                # live-ray telemetry on the production path; last_sdf and
                # unresolved are the kernel's REAL per-ray values (skip
                # rays carry their coarse min-SDF sample), not fabricated
                # zeros (unused consumers are pruned by XLA)
                steps = steps[0]
                return TraceResult(
                    depth=d[0], hit=hit[0], min_sdf=msdf[0],
                    depth_at_min=dam[0],
                    last_sdf=lsdf[0],
                    steps_used=jnp.max(steps),
                    live_counts=live_counts_from_steps(
                        steps, march.max_steps),
                    unresolved=unres[0],
                    steps_per_ray=steps,
                )

            mf.trace_frame = trace_frame
            return mf
        return point_fn

    return factory


def finalize_hits_batched(
    params,
    dcfg: DecoderConfig,
    latents: jax.Array,            # [F, L]
    origins: jax.Array,            # [F, N, 3]
    dirs: jax.Array,               # [F, N, 3]
    depth: jax.Array,              # [F, N] trace depth (proxy-valued hits)
    hit: jax.Array,                # [F, N] trace hit flags (unverified)
    msdf: jax.Array,               # [F, N] trace min-SDF margins
    *,
    convergence_eps: float,
    background_depth: float = 10.0,
    ift_min_denom: float = 1e-2,
    polish_iters: int = 2,
    compact_frac: int = 4,
    weak: Optional[jax.Array] = None,  # [F, N] verify_hits="polish-all"
                                   # weak-candidate mask (band rays seeded
                                   # at the proxy dip anchor): these keep
                                   # the hit ONLY if their polished full-
                                   # decoder s ends <= convergence_eps —
                                   # a stalled weak ray defaults to MISS
                                   # (a band ray is presumptively a near
                                   # miss), unlike confident proxy hits
                                   # whose stall keeps the proxy verdict
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full-decoder hit finalize for trace-only polish-verify consumers.

    `render_batched_c2f(verify_hits="polish")` returns confident proxy
    hits with PROXY-valued depth and an unverified hit flag (only band /
    unresolved rays were re-marched). This applies the same safeguarded
    full-decoder Newton treatment compose() gives the single-frame
    render path, batched over frames — making batched depth maps genuine
    at a fraction of the seeded verify march's cost (measured 11.3 of
    17.5 ms/frame at F=64, scripts/diag_proxy.py round 5; each finalize
    eval is one fused value+tangent pass, decoder_apply_with_dd):

      - per-frame hit-first compaction to an n//compact_frac bucket,
        with ONE whole-batch `lax.cond` full-width fallback if any frame
        overflows (the cond sits OUTSIDE the frame vmap, so only the
        taken branch executes);
      - `polish_iters - 1` safeguarded Newton steps on the precise
        split_x value + bf16 directional derivative: step only on a real
        front-facing slope, accept only geometric |f| descent (rho=0.7 —
        flat-pocket wandering rejected), final extrapolation slope-gated
        (see compose()'s polish-verify comments for the failure modes);
      - demote walked positive dips (polished s > convergence_eps with
        at least one accepted descent step): proxy false hits. Stalled /
        flat rays keep the proxy verdict — the borderline contract class.

    Returns (depth, hit, msdf): finalized bucket rays carry re-anchored
    fp32 depth and their polished full-decoder s as the margin; demoted
    rays read background depth and a genuine positive dip margin.
    """
    from dist_renderer_tpu.models.decoder import decoder_apply_with_dd

    f, n = depth.shape
    bucket = max(n // compact_frac, 1)
    rho = 0.7

    if weak is None:
        weak = jnp.zeros_like(hit)

    def polish(z, o_b, v_b, d_b, h_b, w_b):
        fdd = lambda p: decoder_apply_with_dd(params, z, p, v_b, dcfg)
        p0 = o_b + d_b[:, None] * v_b
        s, dd = fdd(p0)
        denom = jnp.minimum(dd, -ift_min_denom)
        acc_any = jnp.zeros_like(h_b)
        for _ in range(max(polish_iters - 1, 0)):
            ok = h_b & (dd < -ift_min_denom)
            d_try = jnp.where(ok, d_b - s / denom, d_b)
            s2, dd2 = fdd(o_b + d_try[:, None] * v_b)
            accept = ok & (jnp.abs(s2) <= rho * jnp.abs(s))
            acc_any = acc_any | accept
            d_b = jnp.where(accept, d_try, d_b)
            s = jnp.where(accept, s2, s)
            dd = jnp.where(accept, dd2, dd)
            denom = jnp.minimum(dd, -ift_min_denom)
        ok_f = dd < -ift_min_denom
        d_fin = d_b - jnp.where(ok_f, s, 0.0) / denom
        # confident hits demote only on a WALKED positive dip; weak
        # candidates demote whenever their final s stays above eps
        # (stalled weak ray -> miss: see the `weak` parameter docs)
        false_dip = (acc_any | w_b) & (s > convergence_eps)
        h_new = h_b & ~false_dip
        d_fin = jnp.where(h_new, d_fin, background_depth)
        return d_fin, h_new, s

    def frame_bucketed(z, o, v, d, h, m, w):
        idx = jnp.argsort(~h)[:bucket]  # hit-first, stable
        take = lambda a: jnp.take(a, idx, axis=0)
        d_f, h_f, s_f = polish(z, take(o), take(v), take(d), take(h),
                               take(w))
        # rays outside the bucket are misses whenever this branch runs
        # (n_hit <= bucket), so base flags/backgrounds are correct
        d_out = jnp.full((n,), background_depth, d.dtype).at[idx].set(d_f)
        h_out = jnp.zeros((n,), bool).at[idx].set(h_f)
        m_out = m.at[idx].set(s_f)
        return d_out, h_out, m_out

    def frame_full(z, o, v, d, h, m, w):
        d_f, h_f, s_f = polish(z, o, v, d, h, w)
        return (jnp.where(h, d_f, d), jnp.where(h, h_f, h),
                jnp.where(h, s_f, m))

    # BOTH branches run frames SEQUENTIALLY (lax.map, not vmap). This is
    # a remote-compile constraint, not a preference: the F=64-vmapped
    # finalize module reproducibly kills the compile helper (HTTP 500)
    # at 512^2 even standalone, while every single-frame-scale module
    # compiles (r5 scripts/diag_finalize_compile.py). Per-frame work is
    # unchanged and the bucket dots ([n/4, 259] x [259, 512]) are full
    # MXU tiles, so sequencing costs only the map's loop overhead; the
    # vmapped full-width fallback would additionally materialize
    # [F*N, 259] fp32 activations (~17 GB at F=64/512^2, past HBM).
    n_hit_max = jnp.max(jnp.sum(hit, axis=1))
    return jax.lax.cond(
        n_hit_max <= bucket,
        lambda: jax.lax.map(
            lambda t: frame_bucketed(*t),
            (latents, origins, dirs, depth, hit, msdf, weak)),
        lambda: jax.lax.map(
            lambda t: frame_full(*t),
            (latents, origins, dirs, depth, hit, msdf, weak)),
    )


def render_color_rays(
    sdf_fn: Callable,
    color_fn: Callable,
    latent: jax.Array,
    latent_color: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    cfg: RenderConfig,
    march_fn: Optional[Callable] = None,
    init_depth: Optional[jax.Array] = None,
) -> Tuple[RenderOutput, jax.Array]:
    """Textured render: trace + evaluate the color decoder at surface
    points (rebuild of SDFRenderer_color.render_color,
    core/sdfrenderer/renderer_color.py — SURVEY.md §3.1 'color variant').

    Differentiable w.r.t. both latents and pose: the surface points carry
    the depth gradient, so photometric losses reach the geometry."""
    out = render_rays(sdf_fn, latent, origins, dirs, cfg, march_fn, init_depth)
    rgb = color_fn(latent_color, out.points)
    rgb = jnp.where(out.mask[:, None], rgb, 0.0)
    return out, rgb


class SDFRendererColor:
    """OO wrapper mirroring the reference's ``SDFRenderer_color``."""

    def __init__(self, sdf_renderer: "SDFRenderer", color_fn: Callable):
        self.base = sdf_renderer
        self.color_fn = color_fn

    def render_color(self, latent, latent_color, R, T):
        cam = self.base._camera(R, T)
        cfg = self.base.cfg
        origins, dirs = pixel_rays(cam, cfg.img_h, cfg.img_w)
        march_fn = None
        if self.base.march_fn_factory is not None:
            march_fn = self.base.march_fn_factory(_sg(latent))
        out, rgb = render_color_rays(
            self.base.sdf_fn, self.color_fn, latent, latent_color,
            origins, dirs, cfg, march_fn,
        )
        hw = (cfg.img_h, cfg.img_w)
        return out, rgb.reshape(hw + (3,))


class SDFRenderer:
    """OO wrapper mirroring the reference's ``SDFRenderer`` class API
    (core/sdfrenderer/renderer.py): constructed from a decoder + intrinsics
    + image size; exposes render / render_depth / render_normal /
    render_silhouette taking (latent, R, T)."""

    def __init__(
        self,
        decoder_params,
        intrinsic: jax.Array,
        img_hw: Tuple[int, int] = (256, 256),
        decoder_cfg: DecoderConfig = DecoderConfig(),
        cfg: Optional[RenderConfig] = None,
        sdf_fn: Optional[Callable] = None,
    ):
        import dataclasses

        self.K = jnp.asarray(intrinsic, jnp.float32)
        base = cfg or RenderConfig()
        self.cfg = dataclasses.replace(base, img_h=img_hw[0], img_w=img_hw[1])
        self.march_fn_factory = None
        if sdf_fn is None:
            from dist_renderer_tpu.models.decoder import make_precise_sdf

            params = decoder_params
            dcfg = decoder_cfg
            dtype = self.cfg.dtype
            # differentiable path: HIGH-precision value, default-precision
            # gradients (see make_precise_sdf); hot loop: folded bf16
            sdf_fn = make_precise_sdf(params, dcfg)
            self.march_fn_factory = make_march_factory(params, dcfg, self.cfg)
        self.sdf_fn = sdf_fn

    def _camera(self, R, T) -> Camera:
        return Camera(K=self.K, R=jnp.asarray(R, jnp.float32), T=jnp.asarray(T, jnp.float32))

    def render(self, latent, R, T, warm=None) -> RenderOutput:
        return render(
            self.sdf_fn, latent, self._camera(R, T), self.cfg,
            self.march_fn_factory, warm,
        )

    def render_depth(self, latent, R, T) -> jax.Array:
        return self.render(latent, R, T).depth

    def render_normal(self, latent, R, T) -> jax.Array:
        return self.render(latent, R, T).normal

    def render_silhouette(self, latent, R, T) -> jax.Array:
        return self.render(latent, R, T).min_sdf
