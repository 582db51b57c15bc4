"""Work-queue fine march: the WHOLE multi-round schedule in ONE launch.

Replaces fine_march_rounds' XLA orchestration (class sort + per-round
repack sorts + final unsort — measured 15-20 ms of lax.sort glue per
512^2 frame, the dominant single-frame cost after round 2) with ONE
persistent Mosaic kernel that does its own dynamic work compaction:

  - generation 0 walks the live original chunks in PIXEL ORDER (no class
    sort): each chunk marches its active rays for the generation's step
    cap; finished rays' results DMA straight to their pixel slots;
    still-active rays' FULL march carries (depth, bracket, min-SDF
    accumulators, step count — march_body.make_carry) are compacted
    lane-dense via an exact bf16x3 one-hot matmul into a staging buffer
    and flushed to an HBM work queue in 512-ray blocks.
  - generations 1..G walk the queue ranges appended by the previous
    generation with growing caps; the final generation runs to the full
    budget. Because the march step is Markov in the carry, a paused and
    resumed ray follows the BIT-IDENTICAL trajectory of an uninterrupted
    march — the generations are pure scheduling, and the whole kernel is
    semantically ONE full-budget march (the parity test asserts exact
    equality against pallas_sphere_trace_persistent).
  - queue results land slot-aligned in a result buffer carrying each
    ray's pixel index; ONE XLA scatter (~2 ms, vs ~10 ms per sort)
    merges them back. Queue blocks stay frame-pure (bias-bank frames)
    via pad-flushes at frame transitions; a frame-of-queue-chunk SMEM
    array drives the bias tile selection.

Compaction primitive: target positions via an inclusive-cumsum matmul
against a lower-triangular bf16 matrix (integer counts <= 512 are exact
in the fp32 accumulator), then one one-hot [2B, B] matrix applied to the
bf16x3 split of the fp32 carry rows — exact to the last mantissa bit
(scripts/diag_launch4.py). Queue overflow sets a flag and the host
lax.cond-falls back to a plain full-width march, so correctness never
depends on the straggler fraction.

Reference analog: this is the TPU-native realization of the paper's
"dynamic synchronized inference" (SURVEY.md §3.1) — the reference
re-indexes the live set every step on the host; here the live set is
re-packed on-chip with MXU one-hots, and dead rays never reach a block.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dist_renderer_tpu.config import MarchConfig
from dist_renderer_tpu.ops.camera import ray_sphere_entry
from dist_renderer_tpu.ops.pallas.fused_march import _POS_BIG, _round_up
from dist_renderer_tpu.ops.pallas.batched_march import (
    FRAME_TILE,
    SharedDecoder,
    _kinds,
    _select_bank_biases,
    batched_trace_padded,
)
from dist_renderer_tpu.ops.pallas.march_body import (
    make_carry,
    march_loop,
    mlp_apply,
    rows_from_carry,
)

# rays/queue row layout (fp32). Rows 0-9 match the classic kernels;
# 10-19 carry the march state a paused ray resumes from.
R_O, R_V, R_D, R_NEAR, R_FAR, R_ACT = 0, 3, 6, 7, 8, 9
R_MSDF, R_DAM, R_STEPS, R_LASTF, R_PIX, R_HIT = 10, 11, 12, 13, 14, 15
R_DLO, R_FLO, R_DHI, R_FHI = 16, 17, 18, 19
N_ROWS = 24           # padded to a sublane multiple
N_RES = 16            # queue-result rows: 8 out + pix + valid + pad


def _make_queue_kernel(shared: SharedDecoder, march: MarchConfig,
                       n_caps: int, block: int,
                       qcap_rays: int, cpf: int, dense_thresh: float):
    """n_caps: length of the caps_smem schedule array (generation caps,
    runtime values); its LAST entry must be >= march.max_steps (full
    budget) so no ray survives the final generation.

    dense_thresh (in active rays per chunk): generation-0 chunks at or
    above it march in place with the gen-0 cap (their lanes are mostly
    live — marching now avoids a queue round-trip); chunks below it are
    PACKED without marching (zero MLP evals — a mostly-dead block would
    burn full block-steps for a few live lanes) and march lane-dense from
    the queue. Both are pure scheduling: the march carry is Markov, so
    the result stays bit-identical either way."""
    kinds = _kinds(shared)
    offsets = shared.offsets
    B = block
    max_steps = march.max_steps
    S_CUR, S_CNT, S_FRAME, S_OVF, S_TILE, S_ONUM, S_RNUM = range(7)

    def kernel(live_idx, n_live, frame_of_chunk, caps_smem, rays_hbm,
               bias_hbm, tri_ref, *rest):
        n_w = len([w for w in (list(shared.whT) + list(shared.wxT))
                   if w is not None])
        w_refs = rest[:n_w]
        (_defaults, out_hbm, q_hbm, qres_hbm, scal_out,
         rays_v2, out_v, res_v, stage_v, bias_v, q_frame_s, state,
         sem_in0, sem_in1, sem_out0, sem_out1, sem_bias, sem_q,
         sem_res0, sem_res1) = rest[n_w:]

        f32 = jnp.float32
        state[S_CUR] = 0
        state[S_CNT] = 0
        state[S_FRAME] = -1
        state[S_OVF] = 0
        state[S_TILE] = -1
        state[S_ONUM] = 0
        state[S_RNUM] = 0
        res_v[0, 10:16, :] = jnp.zeros((6, B), f32)
        res_v[1, 10:16, :] = jnp.zeros((6, B), f32)
        stage_v[:, :] = jnp.zeros((N_ROWS, 2 * B), f32)
        # scal_out is a plain VMEM output: initialize (overwritten at end)
        scal_out[:, :] = jnp.zeros((1, 128), f32)

        def flush():
            """Write staging[:, :B] to the queue as one (possibly padded)
            block; shift the upper half down. Caller guarantees CNT>0.
            The cursor counts CHUNKS so the HBM slice offset is provably
            512-aligned (a raw ray cursor fails Mosaic's tile-divisibility
            proof on hardware, though interpret mode accepts it)."""
            cur_c = state[S_CUR]

            @pl.when(cur_c >= qcap_rays // B)
            def _ovf():
                state[S_OVF] = 1

            @pl.when(cur_c < qcap_rays // B)
            def _write():
                cp = pltpu.make_async_copy(
                    stage_v.at[:, pl.ds(0, B)],
                    q_hbm.at[:, pl.ds(cur_c * B, B)], sem_q,
                )
                cp.start()
                cp.wait()
                q_frame_s[cur_c] = state[S_FRAME]
                state[S_CUR] = cur_c + 1

            tail = stage_v[:, B:2 * B]
            stage_v[:, 0:B] = tail
            stage_v[:, B:2 * B] = jnp.zeros((N_ROWS, B), f32)
            state[S_CNT] = jnp.maximum(state[S_CNT] - B, 0)

        def append(rays, outc, surv, frame):
            """Compact this chunk's surviving rays' carries into staging."""
            @pl.when((state[S_FRAME] != frame) & (state[S_CNT] > 0))
            def _frame_pad_flush():
                flush()

            state[S_FRAME] = frame
            (d, act_f, hit_f, d_lo, f_lo, d_hi, f_hi, min_sdf, d_at_min,
             last_f, steps, _unres) = outc
            rq = jnp.concatenate([
                rays[R_O:R_O + 3, :], rays[R_V:R_V + 3, :],
                d, rays[R_NEAR:R_NEAR + 1, :], rays[R_FAR:R_FAR + 1, :],
                surv, min_sdf, d_at_min, steps, last_f,
                rays[R_PIX:R_PIX + 1, :], hit_f,
                d_lo, f_lo, d_hi, f_hi,
                jnp.zeros((N_ROWS - 20, B), f32),
            ], axis=0)

            # inclusive-cumsum positions via the triangular matmul
            # (integer counts <= B are exact in the fp32 accumulator)
            pos = jax.lax.dot_general(
                surv.astype(jnp.bfloat16), tri_ref[:, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) - 1.0
            tgt = pos.astype(jnp.int32) + state[S_CNT]
            jj = jax.lax.broadcasted_iota(jnp.int32, (2 * B, B), 0)
            m = jnp.where((tgt == jj) & (surv > 0.5), 1.0, 0.0).astype(
                jnp.bfloat16
            )
            # exact fp32 transport: bf16x3 split, fp32 accumulation
            hi = rq.astype(jnp.bfloat16)
            r1 = rq - hi.astype(f32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(f32)).astype(jnp.bfloat16)
            acc = stage_v[:, :]
            for part in (hi, mid, lo):
                acc = acc + jax.lax.dot_general(
                    part, m, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
            stage_v[:, :] = acc
            state[S_CNT] = state[S_CNT] + jnp.sum(surv).astype(jnp.int32)

            @pl.when(state[S_CNT] >= B)
            def _full_flush():
                flush()

        def fetch(src_hbm, slot, ci):
            """Async copy descriptor for chunk ci into ray slot `slot`
            (static slot -> its own semaphore, so two fetches can be in
            flight and waits are precise)."""
            return pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(ci * B, B)],
                rays_v2.at[slot],
                sem_in0 if slot == 0 else sem_in1,
            )

        def out_desc(slot: int, ci):
            """Output-DMA descriptor for out_v slot `slot` -> chunk ci.
            Waits reconstruct the descriptor with the CURRENT ci — Mosaic's
            dma_wait accounts by semaphore + transfer size, and all out
            copies are the same size, so waiting an earlier copy through a
            different-dst descriptor is sound (same pattern the input
            fetches already rely on)."""
            return pltpu.make_async_copy(
                out_v.at[slot], out_hbm.at[:, pl.ds(ci * B, B)],
                sem_out0 if slot == 0 else sem_out1,
            )

        def res_desc(slot: int, ci):
            return pltpu.make_async_copy(
                res_v.at[slot], qres_hbm.at[:, pl.ds(ci * B, B)],
                sem_res0 if slot == 0 else sem_res1,
            )

        def carry_from_rays(rays):
            return make_carry(
                rays[R_D:R_D + 1, :], rays[R_ACT:R_ACT + 1, :],
                hit=rays[R_HIT:R_HIT + 1, :],
                d_lo=rays[R_DLO:R_DLO + 1, :],
                f_lo=rays[R_FLO:R_FLO + 1, :],
                d_hi=rays[R_DHI:R_DHI + 1, :],
                f_hi=rays[R_FHI:R_FHI + 1, :],
                min_sdf=rays[R_MSDF:R_MSDF + 1, :],
                d_at_min=rays[R_DAM:R_DAM + 1, :],
                last_f=rays[R_LASTF:R_LASTF + 1, :],
                steps=rays[R_STEPS:R_STEPS + 1, :],
            )

        def march_chunk(s, ci, to_out: bool, kmax, frame):
            """March the chunk resident in ray slot s; write its rows to
            the double-buffered output (wait only when REUSING a slot, two
            chunks later — the synchronous wait serialized ~3-5 us of
            store-DMA latency into every chunk visit); requeue survivors."""
            tile = frame // FRAME_TILE

            @pl.when(tile != state[S_TILE])
            def _fetch_tile():
                cp = pltpu.make_async_copy(
                    bias_hbm.at[:, pl.ds(tile * FRAME_TILE, FRAME_TILE)],
                    bias_v, sem_bias,
                )
                cp.start()
                cp.wait()
                state[S_TILE] = tile

            rays = rays_v2[s]
            o = rays[R_O:R_O + 3, :]
            v = rays[R_V:R_V + 3, :]
            near = rays[R_NEAR:R_NEAR + 1, :]
            far = rays[R_FAR:R_FAR + 1, :]

            biases = _select_bank_biases(bias_v, offsets,
                                         frame % FRAME_TILE)
            mlp = lambda p8: mlp_apply(kinds, w_refs, biases,
                                       shared.final_tanh, p8)
            outc = march_loop(mlp, o, v, near, far, march, max_steps,
                              True, carry_from_rays(rays), kmax=kmax)
            rows8 = rows_from_carry(outc)
            act_end = outc[1]

            if to_out:
                n = state[S_ONUM]
                slot = jax.lax.rem(n, 2)

                @pl.when(slot == 0)
                def _o0():
                    @pl.when(n >= 2)
                    def _w():
                        out_desc(0, ci).wait()

                    out_v[0, :, :] = rows8
                    out_desc(0, ci).start()

                @pl.when(slot == 1)
                def _o1():
                    @pl.when(n >= 2)
                    def _w():
                        out_desc(1, ci).wait()

                    out_v[1, :, :] = rows8
                    out_desc(1, ci).start()

                state[S_ONUM] = n + 1
            else:
                n = state[S_RNUM]
                slot = jax.lax.rem(n, 2)
                pix = rays[R_PIX:R_PIX + 1, :]

                @pl.when(slot == 0)
                def _r0():
                    @pl.when(n >= 2)
                    def _w():
                        res_desc(0, ci).wait()

                    res_v[0, 0:8, :] = rows8
                    res_v[0, 8:9, :] = pix
                    res_v[0, 9:10, :] = 1.0 - act_end
                    res_desc(0, ci).start()

                @pl.when(slot == 1)
                def _r1():
                    @pl.when(n >= 2)
                    def _w():
                        res_desc(1, ci).wait()

                    res_v[1, 0:8, :] = rows8
                    res_v[1, 8:9, :] = pix
                    res_v[1, 9:10, :] = 1.0 - act_end
                    res_desc(1, ci).start()

                state[S_RNUM] = n + 1

            @pl.when(jnp.sum(act_end) > 0.5)
            def _requeue():
                append(rays, outc, act_end, frame)

        def process_fetched(s, ci, to_out: bool, kmax):
            """Dispatch the chunk resident in ray slot s: queue chunks
            always march (they arrive lane-dense); generation-0 chunks
            march only at dense occupancy, else they are packed to the
            queue without touching the MLP (their out rows are the init
            state the output is already aliased with, and every live
            lane's final rows arrive via the queue-result scatter)."""
            if not to_out:
                march_chunk(s, ci, False, kmax, q_frame_s[ci])
                return

            frame = frame_of_chunk[ci]
            rays = rays_v2[s]
            occ = jnp.sum(rays[R_ACT:R_ACT + 1, :])

            @pl.when(occ >= dense_thresh)
            def _dense():
                march_chunk(s, ci, True, kmax, frame)

            @pl.when(occ < dense_thresh)
            def _pack_only():
                append(rays, carry_from_rays(rays),
                       rays[R_ACT:R_ACT + 1, :], frame)

        def walk(src_hbm, to_out: bool, idx_of, start, end, kmax):
            """Double-buffered chunk walk over [start, end): chunk k+1's
            HBM->VMEM copy is in flight while chunk k marches (the
            synchronous fetch-wait serialized ~5-10 us of DMA latency
            into every chunk visit)."""

            @pl.when(start < end)
            def _first():
                @pl.when(jax.lax.rem(start, 2) == 0)
                def _f0():
                    fetch(src_hbm, 0, idx_of(start)).start()

                @pl.when(jax.lax.rem(start, 2) == 1)
                def _f1():
                    fetch(src_hbm, 1, idx_of(start)).start()

            def body(k):
                s = jax.lax.rem(k, 2)
                ci = idx_of(k)

                @pl.when(k + 1 < end)
                def _prefetch():
                    nci = idx_of(k + 1)

                    @pl.when(s == 0)
                    def _p1():
                        fetch(src_hbm, 1, nci).start()

                    @pl.when(s == 1)
                    def _p0():
                        fetch(src_hbm, 0, nci).start()

                @pl.when(s == 0)
                def _w0():
                    fetch(src_hbm, 0, ci).wait()

                @pl.when(s == 1)
                def _w1():
                    fetch(src_hbm, 1, ci).wait()

                process_fetched(s, ci, to_out, kmax)
                return k + 1

            jax.lax.while_loop(lambda k: k < end, body, start)

        # ---- generation 0: original live chunks, pixel order ----
        walk(rays_hbm, True, lambda k: live_idx[k], 0, n_live[0],
             caps_smem[0])

        @pl.when(state[S_CNT] > 0)
        def _tail0():
            flush()

        # ---- queue generations: ONE generic walker, runtime caps ----
        # The queue cursor is threaded through the while CARRY (read from
        # SMEM at the END of each body) instead of reading state[S_CUR]
        # inside the cond: a ref read in a while_loop COND observed the
        # PRE-body value in interpret mode at small chunk counts (nc==1
        # bands returned with their queued stragglers never marched —
        # caught by the sharded-queue plan-exactness test), and carry
        # threading is the unambiguous formulation for Mosaic too.
        def outer_cond(c):
            g, start, cur = c
            return start < cur

        def outer_body(c):
            g, start, end_g = c        # end_g: cursor snapshot (carry)
            cap = caps_smem[jnp.minimum(g, n_caps - 1)]
            walk(q_hbm, False, lambda k: k, start, end_g, cap)

            @pl.when(state[S_CNT] > 0)
            def _tailg():
                flush()

            return (g + 1, end_g, state[S_CUR])

        jax.lax.while_loop(outer_cond, outer_body, (1, 0, state[S_CUR]))

        # drain outstanding output DMAs (each slot waits before REUSE, so
        # at most one copy per slot is in flight; with n copies started,
        # the unwaited ones are copies n-1 and n-2 — both slots when
        # n >= 2, slot 0 alone when n == 1)
        @pl.when(state[S_ONUM] >= 2)
        def _drain_out_both():
            out_desc(0, 0).wait()
            out_desc(1, 0).wait()

        @pl.when(state[S_ONUM] == 1)
        def _drain_out_one():
            out_desc(0, 0).wait()

        @pl.when(state[S_RNUM] >= 2)
        def _drain_res_both():
            res_desc(0, 0).wait()
            res_desc(1, 0).wait()

        @pl.when(state[S_RNUM] == 1)
        def _drain_res_one():
            res_desc(0, 0).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        ones = jnp.ones((1, 128), f32)
        scal_out[:, :] = (
            jnp.where(lane == 0, ones * state[S_CUR], 0.0)
            + jnp.where(lane == 1, ones * state[S_OVF], 0.0)
            + jnp.where(lane == 2, ones * state[S_RNUM], 0.0)
            + jnp.where(lane == 3, ones * state[S_ONUM], 0.0)
        )

    return kernel


def queue_march(
    shared: SharedDecoder,
    bank: jax.Array,               # [total, F_pad]
    origins: jax.Array,            # [F, N, 3] or [F, 1, 3] (shared origin)
    dirs: jax.Array,               # [F, N, 3]
    key: jax.Array,                # [F, N] int32: 0 rim / 1 interior / 2 skip
    init_depth: jax.Array,         # [F, N] seed (NaN = sphere entry)
    march: MarchConfig,
    block: int = 512,
    gen_caps: Tuple[int, ...] = (6, 16),
    qcap_frac: int = 2,
    dense_frac: float = 0.5,
    interpret: bool = False,
    debug_raw: bool = False,
) -> Tuple[jax.Array, ...]:
    """One-launch work-queue fine march; outputs in PIXEL order.

    Returns (depth, hit, msdf, depth_at_min, last_sdf, steps, unresolved),
    each [F, N] — every telemetry field comes free (no sort payloads).
    Semantically identical to one full-budget bracket-secant march of
    march.max_steps over the active rays.

    dense_frac: generation-0 chunks with at least dense_frac * block
    active rays march in place with gen_caps[0]; sparser chunks are
    packed to the queue WITHOUT marching (zero MLP evals for mostly-dead
    pixel-order blocks) and march lane-dense from the queue. 0.0 marches
    every gen-0 chunk (the pre-round-3 behavior); > 1.0 packs every
    chunk. Pure scheduling either way — results stay bit-identical."""
    f, n = key.shape
    f32 = jnp.float32
    B = block
    r_pad = _round_up(max(n, B), B)
    ntot = f * r_pad
    assert ntot < (1 << 24), "pixel indices must stay fp32-exact"
    cpf = r_pad // B
    nc = ntot // B

    o_full = jnp.broadcast_to(origins, (f, n, 3))
    pad = r_pad - n
    o_p = jnp.pad(o_full, ((0, 0), (0, pad), (0, 0))).reshape(-1, 3)
    v_p = jnp.pad(dirs, ((0, 0), (0, pad), (0, 0)),
                  constant_values=1.0).reshape(-1, 3)
    seed_p = jnp.pad(init_depth, ((0, 0), (0, pad)),
                     constant_values=jnp.nan).reshape(-1)
    act_in = jnp.pad(key != 2, ((0, 0), (0, pad))).reshape(-1)

    t_near, t_far, enters = ray_sphere_entry(o_p, v_p, march.sphere_radius, 0.0)
    far_bound = t_far + march.far_margin
    t_closest = jnp.maximum(-jnp.sum(o_p * v_p, axis=-1), 0.0)
    d0 = jnp.where(enters, t_near, t_closest).astype(f32)
    seeded = jnp.isfinite(seed_p) & enters
    d0 = jnp.where(seeded, jnp.maximum(seed_p, t_near), d0)
    act0 = (enters & act_in).astype(f32)

    rays = jnp.zeros((N_ROWS, ntot), f32)
    rays = rays.at[R_O:R_O + 3, :].set(o_p.T)
    rays = rays.at[R_V:R_V + 3, :].set(v_p.T)
    rays = rays.at[R_D, :].set(d0)
    rays = rays.at[R_NEAR, :].set(t_near)
    rays = rays.at[R_FAR, :].set(far_bound)
    rays = rays.at[R_ACT, :].set(act0)
    rays = rays.at[R_MSDF, :].set(_POS_BIG)
    rays = rays.at[R_DAM, :].set(d0)
    rays = rays.at[R_LASTF, :].set(_POS_BIG)
    rays = rays.at[R_PIX, :].set(jnp.arange(1, ntot + 1, dtype=f32))
    rays = rays.at[R_DLO, :].set(-_POS_BIG)
    rays = rays.at[R_FLO, :].set(_POS_BIG)
    rays = rays.at[R_DHI, :].set(_POS_BIG)
    rays = rays.at[R_FHI, :].set(-_POS_BIG)

    zeros_n = jnp.zeros((ntot,), f32)
    defaults = jnp.stack([
        d0, zeros_n, jnp.full((ntot,), _POS_BIG, f32), d0,
        jnp.full((ntot,), _POS_BIG, f32), zeros_n, zeros_n, zeros_n,
    ])

    alive = (act0 > 0.5).reshape(nc, B).any(axis=1)
    live_idx = jnp.where(alive, size=nc, fill_value=0)[0].astype(jnp.int32)
    n_live = jnp.sum(alive).astype(jnp.int32).reshape(1)
    frame_of_chunk = (jnp.arange(nc, dtype=jnp.int32) // cpf)

    tri = (jnp.arange(B)[:, None] <= jnp.arange(B)[None, :]).astype(
        jnp.bfloat16
    )

    qcap_rays = _round_up(max(ntot // max(qcap_frac, 1), 2 * B), B)
    qcap_chunks = qcap_rays // B

    weights = []
    for wh, wx in zip(shared.whT, shared.wxT):
        if wh is not None:
            weights.append(wh)
        if wx is not None:
            weights.append(wx)

    caps = tuple(max(int(c), 1) for c in gen_caps) + (march.max_steps,)
    caps_arr = jnp.asarray(caps, jnp.int32)
    kernel = _make_queue_kernel(shared, march, len(caps), B, qcap_rays, cpf,
                                float(dense_frac) * B)

    out8, q_buf, qres, scal = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # live_idx
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_live
            pl.BlockSpec(memory_space=pltpu.SMEM),   # frame_of_chunk
            pl.BlockSpec(memory_space=pltpu.SMEM),   # generation caps
            pl.BlockSpec(memory_space=pl.ANY),       # rays
            pl.BlockSpec(memory_space=pl.ANY),       # bias bank
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
            pl.BlockSpec(memory_space=pl.ANY),       # defaults -> out8
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),       # out8
            pl.BlockSpec(memory_space=pl.ANY),       # queue (internal)
            pl.BlockSpec(memory_space=pl.ANY),       # queue results
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scalars
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, ntot), f32),
            jax.ShapeDtypeStruct((N_ROWS, qcap_rays), f32),
            jax.ShapeDtypeStruct((N_RES, qcap_rays), f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ),
        input_output_aliases={7 + len(weights): 0},
        scratch_shapes=[
            pltpu.VMEM((2, N_ROWS, B), f32),         # rays (double-buffered)
            pltpu.VMEM((2, 8, B), f32),              # out_v (double-buffered)
            pltpu.VMEM((2, N_RES, B), f32),          # res_v (double-buffered)
            pltpu.VMEM((N_ROWS, 2 * B), f32),        # stage_v
            pltpu.VMEM((shared.total, FRAME_TILE), f32),
            pltpu.SMEM((qcap_chunks,), jnp.int32),   # q_frame
            pltpu.SMEM((8,), jnp.int32),             # state
            pltpu.SemaphoreType.DMA(()),             # sem_in0
            pltpu.SemaphoreType.DMA(()),             # sem_in1
            pltpu.SemaphoreType.DMA(()),             # sem_out0
            pltpu.SemaphoreType.DMA(()),             # sem_out1
            pltpu.SemaphoreType.DMA(()),             # sem_bias
            pltpu.SemaphoreType.DMA(()),             # sem_q
            pltpu.SemaphoreType.DMA(()),             # sem_res0
            pltpu.SemaphoreType.DMA(()),             # sem_res1
        ],
        interpret=interpret,
    )(live_idx, n_live, frame_of_chunk, caps_arr, rays, bank, tri,
      *weights, defaults)

    n_q = scal[0, 0].astype(jnp.int32) * B   # kernel cursor is in chunks
    overflow = scal[0, 1] > 0.5
    if debug_raw:
        return out8, q_buf, qres, scal

    # merge queue results back to pixel slots: one scatter, no sorts
    slot = jnp.arange(qcap_rays, dtype=jnp.int32)
    valid = (qres[9] > 0.5) & (slot < n_q) & (qres[8] > 0.5)
    tgt = jnp.where(valid, qres[8].astype(jnp.int32) - 1, ntot)
    merged = out8.at[:, tgt].set(qres[:8], mode="drop")

    def finish(src8):
        unflat = lambda x: x.reshape(f, r_pad)[:, :n]
        d = unflat(src8[0])
        hit = unflat(src8[1]) > 0.5
        msdf = unflat(src8[2])
        dam = unflat(src8[3])
        lastf = unflat(src8[4])
        steps = unflat(src8[5])
        unres = unflat(src8[6]) > 0.5
        return d, hit, msdf, dam, lastf, steps, unres

    def fallback(_):
        # queue overflow (or pathological straggler fraction): plain
        # full-width full-budget march — correctness never depends on
        # the queue capacity
        res = batched_trace_padded(
            shared, bank, o_full, dirs, march,
            init_depth, key != 2, B, interpret, True,
        )
        r_pad2 = res.steps_per_ray.shape[0] // f
        steps = res.steps_per_ray.reshape(f, r_pad2)[:, :n].astype(f32)
        return (res.depth, res.hit, res.min_sdf, res.depth_at_min,
                res.last_sdf, steps, res.unresolved)

    def ok(_):
        return finish(merged)

    d, hit, msdf, dam, lastf, steps, unres = jax.lax.cond(
        overflow, fallback, ok, 0
    )

    # geometric sphere margin for rays whose march never sampled the SDF
    o_u = o_full.reshape(-1, 3)
    v_u = dirs.reshape(-1, 3)
    t_c = jnp.maximum(-jnp.sum(o_u * v_u, axis=-1), 0.0)
    p_c = o_u + t_c[:, None] * v_u
    geo = (jnp.linalg.norm(p_c, axis=-1) - march.sphere_radius).reshape(f, n)
    msdf = jnp.where(msdf > _POS_BIG / 2, geo, msdf)
    return d, hit, msdf, dam, lastf, steps, unres
