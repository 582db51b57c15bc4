"""Fused differentiable-recompute kernel: precise SDF value + spatial
gradient + directional derivative in ONE Pallas launch.

Why this kernel exists (round-3/4 latency work, docs/PERFORMANCE.md):
the renderer's differentiable recompute (SURVEY.md §3.2 — the one
decoder evaluation gradients flow through) was three separate XLA
computations per frame at the hit-compacted bucket:

  - precise value  (bf16x3 split dots)            ~5.6 ms at 512^2/4
  - IFT-denominator jvp (primal + tangent chain)  ~8.0 ms
  - normals vjp (when consumed)                   ~5-10 ms

Each XLA MLP pass materializes [bucket, 512] fp32 activations in HBM
(~134 MB per layer at the n/4 bucket) — the recompute is
BANDWIDTH-bound, not FLOPs-bound. This kernel keeps everything in VMEM:
one forward pass (bf16x3-split input layers, single-bf16 hidden layers,
matching ``decoder_apply(precision="split_x")``) storing the ReLU gates,
then one reverse sweep that yields the full spatial gradient ``g`` —
from which the IFT denominator is just ``<g, v>`` and surface normals
are ``g/|g|``. Weights (both orientations) + gates fit VMEM at 512
lanes (~13 MB).

Gradient story (the custom_vjp in ``make_precise_sdg``):
  - d f / d points = g  (already computed)  =>  gp = ct * g, free.
  - d f / d latent: z enters only through the folded per-layer biases,
    so gz = sum_l Wz_l^T u_l with u_l = delta_l @ ct (delta_l = the
    ct-seeded reverse chain at layer l's preactivation). The backward
    kernel recomputes forward+reverse with the cotangent as the seed and
    accumulates the tiny u_l row-sums across blocks; the host finishes
    with two [256, 512] matvecs.
  - ``dd`` and ``g`` outputs carry NO gradient (the renderer
    stop-gradients the IFT denominator anyway, and normals on this path
    are value-exact but non-differentiable — GradConfig.recompute docs).

Reference analog: the last-step differentiable evaluation of
core/sdfrenderer/renderer.py [R] (SURVEY.md §3.2); the reference runs it
as a full-width autograd decoder call — no TPU analog exists there.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import Params


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_pair(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """bf16 hi/lo split of an fp32 array (w == hi + lo to ~2^-16 rel)."""
    hi = w.astype(jnp.bfloat16)
    lo = (w.astype(jnp.float32) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


class LayerMeta(NamedTuple):
    """Static per-layer shape/flag info shared by packer and kernels."""

    has_wh: bool
    has_wx: bool
    split: bool      # bf16x3-split h-matmul (layers consuming the raw input)
    takes_z: bool    # latent enters this layer's bias (layer 0 / latent_in)
    out_p: int
    in_p: int        # padded h-input dim (0 when has_wh is False)


class PackedPrecise(NamedTuple):
    """Weights for the fused recompute kernels, both orientations.

    Per layer (padded to multiples of 8, [feature, lane]-friendly):
      whT    [out_p, in_p] bf16 — forward h-matmul (hi part)
      whT_lo [out_p, in_p] bf16 — low part, split layers only
      wxT    [out_p, 8]  bf16 — forward x-matmul (hi part)
      wxT_lo [out_p, 8]  bf16 — low part
      whN    [in_p, out_p] bf16 — reverse chain (original orientation)
      wxN    [8, out_p]  bf16 — reverse to the xyz input rows
    wz: per-z-layer [L, out_dim] fp32 (host-side, for gz = wz @ u).
    """

    meta: Tuple[LayerMeta, ...]
    ops: Tuple[jax.Array, ...]        # flat kernel operands, layer-major
    wz: Tuple[Tuple[int, jax.Array], ...]   # (layer index, wz fp32)
    use_tanh: bool
    final_tanh: bool


def pack_precise(params: Params, cfg: DecoderConfig) -> PackedPrecise:
    """Pack decoder weights for the recompute kernels (latent-free)."""
    L = cfg.latent_size
    meta: List[LayerMeta] = []
    ops: List[jax.Array] = []
    wz_list: List[Tuple[int, jax.Array]] = []
    n_layers = len(params["layers"])
    prev_out_p = 0
    for i, layer in enumerate(params["layers"]):
        w = layer["w"].astype(jnp.float32)
        out_dim = layer["b"].shape[0]
        out_p = _round_up(out_dim, 8)
        takes_z = i == 0 or i in cfg.latent_in
        split = takes_z
        if i == 0:
            wz, wx, wh = w[:L], w[L:L + 3], None
        elif i in cfg.latent_in:
            dh = w.shape[0] - L - 3
            wh, wz, wx = w[:dh], w[dh:dh + L], w[dh + L:]
        elif cfg.xyz_in_all and i < n_layers - 1:
            wh, wz, wx = w[:-3], None, w[-3:]
        else:
            wh, wz, wx = w, None, None
        if wz is not None:
            wz_list.append((i, wz))

        in_p = 0
        if wh is not None:
            in_dim = wh.shape[0]
            in_p = prev_out_p if prev_out_p else _round_up(in_dim, 8)
            whT = jnp.zeros((out_p, in_p), jnp.float32)
            whT = whT.at[:out_dim, :in_dim].set(wh.T)
            hi, lo = _split_pair(whT)
            ops.append(hi)
            if split:
                ops.append(lo)
            whN = jnp.zeros((in_p, out_p), jnp.float32)
            whN = whN.at[:in_dim, :out_dim].set(wh)
            ops.append(whN.astype(jnp.bfloat16))
        if wx is not None:
            wxT = jnp.zeros((out_p, 8), jnp.float32)
            wxT = wxT.at[:out_dim, :3].set(wx.T)
            hi, lo = _split_pair(wxT)
            ops.extend([hi, lo])
            wxN = jnp.zeros((8, out_p), jnp.float32)
            wxN = wxN.at[:3, :out_dim].set(wx)
            ops.append(wxN.astype(jnp.bfloat16))
        meta.append(LayerMeta(wh is not None, wx is not None, split,
                              takes_z, out_p, in_p))
        prev_out_p = out_p
    return PackedPrecise(tuple(meta), tuple(ops), tuple(wz_list),
                         cfg.use_tanh, cfg.final_tanh)


def fold_bias_precise(
    params: Params, latent: jax.Array, cfg: DecoderConfig,
    packed: PackedPrecise,
) -> Tuple[jax.Array, ...]:
    """Per-layer [out_p, 1] fp32 biases with z @ Wz folded in at FULL
    precision via the bf16x3 split (a default-precision fp32 matmul on
    TPU is a single bf16 pass — ~1e-3 relative error would poison the
    precise value this kernel anchors depth parity on)."""
    from dist_renderer_tpu.models.decoder import _matmul_split

    z = latent.reshape(1, -1)
    wz = dict(packed.wz)
    cols = []
    for i, (layer, m) in enumerate(zip(params["layers"], packed.meta)):
        b = layer["b"].astype(jnp.float32)
        if i in wz:
            b = _matmul_split(z, wz[i].astype(jnp.float32), b)[0]
        col = jnp.zeros((m.out_p, 1), jnp.float32)
        cols.append(col.at[:b.shape[0], 0].set(b))
    return tuple(cols)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_f32(a, b):
    """Interpret-mode dot: the CPU backend's DotThunk rejects
    bf16 x bf16 -> f32 at some shapes (ADVICE r3). bf16 values embed
    exactly in f32, so casting first is numerically identical to the
    MXU's bf16-input/f32-accumulate dot."""
    return jax.lax.dot_general(
        a.astype(jnp.float32), b.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _consume(meta: LayerMeta, refs, idx):
    """Pull one layer's operand refs in pack order."""
    d = {}
    if meta.has_wh:
        d["whT"] = refs[idx]; idx += 1
        if meta.split:
            d["whT_lo"] = refs[idx]; idx += 1
        d["whN"] = refs[idx]; idx += 1
    if meta.has_wx:
        d["wxT"] = refs[idx]; idx += 1
        d["wxT_lo"] = refs[idx]; idx += 1
        d["wxN"] = refs[idx]; idx += 1
    return d, idx


def _forward(meta, refs, biases, x8, use_tanh, final_tanh, dot=_dot):
    """Precise forward pass. Returns (s [1,B] fp32, gates list, pre_last,
    per-layer operand dicts). Matches decoder_apply(precision='split_x'):
    bf16x3 on input-consuming matmuls, single bf16 pass on hidden ones,
    fp32 accumulation throughout."""
    xi = x8.astype(jnp.bfloat16)
    xl = (x8 - xi.astype(jnp.float32)).astype(jnp.bfloat16)
    h = None
    gates = []
    layer_ops = []
    idx = 0
    n_layers = len(meta)
    for i, m in enumerate(meta):
        d, idx = _consume(m, refs, idx)
        layer_ops.append(d)
        acc = biases[i][:, :]
        if m.has_wh:
            if m.split:
                hi = h.astype(jnp.bfloat16)
                lo = (h - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + dot(d["whT"][:, :], hi)
                acc = acc + dot(d["whT_lo"][:, :], hi)
                acc = acc + dot(d["whT"][:, :], lo)
            else:
                acc = acc + dot(d["whT"][:, :], h.astype(jnp.bfloat16))
        if m.has_wx:
            acc = acc + dot(d["wxT"][:, :], xi)
            acc = acc + dot(d["wxT_lo"][:, :], xi)
            acc = acc + dot(d["wxT"][:, :], xl)
        if i < n_layers - 1:
            gates.append((acc > 0.0).astype(jnp.bfloat16))
            h = jnp.maximum(acc, 0.0)
        else:
            h = acc
    pre_last = h
    s = pre_last[0:1, :]
    if use_tanh:
        s = jnp.tanh(s)
    if final_tanh:
        s = jnp.tanh(s)
    return s, gates, pre_last, layer_ops


def _seed_last(meta, pre_last, s, use_tanh, final_tanh, ct):
    """Reverse seed at the last layer's preactivation: d sdf / d pre_last
    confined to row 0, scaled by the tanh chain and the cotangent."""
    B = pre_last.shape[1]
    dchain = ct
    if use_tanh:
        t1 = jnp.tanh(pre_last[0:1, :])
        dchain = dchain * (1.0 - t1 * t1)
    if final_tanh:
        dchain = dchain * (1.0 - s * s)
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, (meta[-1].out_p, B), 0) == 0
    )
    return jnp.where(row0, dchain, 0.0)


def _reverse(meta, layer_ops, gates, delta, want_gx: bool,
             want_u: bool, dot=_dot):
    """Reverse sweep from the last layer's preactivation gradient.
    Returns (gx [8,B] fp32 or None, u list of [out_p,1] per z-layer)."""
    gx = None
    us = []
    for i in range(len(meta) - 1, -1, -1):
        m = meta[i]
        d = layer_ops[i]
        if want_u and m.takes_z:
            us.append(jnp.sum(delta, axis=1, keepdims=True))
        if want_gx and m.has_wx:
            c = dot(d["wxN"][:, :], delta.astype(jnp.bfloat16))
            gx = c if gx is None else gx + c
        if m.has_wh:
            dh = dot(d["whN"][:, :], delta.astype(jnp.bfloat16))
            delta = dh * gates[i - 1].astype(jnp.float32)
        else:
            break
    us.reverse()  # back to ascending layer order
    return gx, us


def _make_fwd_kernel(packed: PackedPrecise, n_bias: int,
                     interpret: bool = False):
    meta = packed.meta
    dot = _dot_f32 if interpret else _dot

    def kernel(pts_ref, dirs_ref, *refs):
        out_ref = refs[-1]
        biases = refs[:n_bias]
        w_refs = refs[n_bias:-1]
        x8 = pts_ref[:, :]
        v8 = dirs_ref[:, :]
        s, gates, pre_last, layer_ops = _forward(
            meta, w_refs, biases, x8, packed.use_tanh, packed.final_tanh,
            dot=dot,
        )
        ones = jnp.ones_like(s)
        delta = _seed_last(meta, pre_last, s, packed.use_tanh,
                           packed.final_tanh, ones)
        gx, _ = _reverse(meta, layer_ops, gates, delta, True, False,
                         dot=dot)
        dd = jnp.sum(gx[0:3, :] * v8[0:3, :], axis=0, keepdims=True)
        B = s.shape[1]
        out_ref[:, :] = jnp.concatenate(
            [s, dd, gx[0:3, :], jnp.zeros((3, B), jnp.float32)], axis=0
        )

    return kernel


def _make_bwd_kernel(packed: PackedPrecise, n_bias: int, u_rows: int,
                     seed_rows: int = 1, scalar_chain: bool = True,
                     want_gx: bool = False, interpret: bool = False):
    """Cotangent-seeded reverse kernel. seed_rows: how many leading ct
    rows seed the last layer's preactivation gradient. scalar_chain=True
    applies the sdf tanh chain to a 1-row seed (the sdg path);
    scalar_chain=False takes the rows as PREACTIVATION cotangents
    verbatim (multi-channel heads pre-multiply their own output-
    activation derivative host-side). want_gx additionally emits the
    ct-weighted input-xyz gradient per ray as a second output."""
    meta = packed.meta
    dot = _dot_f32 if interpret else _dot

    def kernel(pts_ref, ct_ref, *refs):
        if want_gx:
            u_ref, gx_ref = refs[-2], refs[-1]
            tail = 2
        else:
            u_ref = refs[-1]
            tail = 1
        biases = refs[:n_bias]
        w_refs = refs[n_bias:-tail]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            u_ref[:, :] = jnp.zeros_like(u_ref)

        x8 = pts_ref[:, :]
        s, gates, pre_last, layer_ops = _forward(
            meta, w_refs, biases, x8, packed.use_tanh, packed.final_tanh,
            dot=dot,
        )
        if scalar_chain:
            delta = _seed_last(meta, pre_last, s, packed.use_tanh,
                               packed.final_tanh, ct_ref[0:1, :])
        else:
            B = pre_last.shape[1]
            rowmask = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (meta[-1].out_p, B), 0) < seed_rows
            )
            ct8 = ct_ref[:, :]
            delta = jnp.where(
                rowmask, ct8[:meta[-1].out_p, :]
                if ct8.shape[0] >= meta[-1].out_p
                else jnp.pad(ct8, ((0, meta[-1].out_p - ct8.shape[0]), (0, 0))),
                0.0,
            )
        gx, us = _reverse(meta, layer_ops, gates, delta, want_gx, True,
                          dot=dot)
        u = jnp.concatenate(us, axis=0)          # [u_rows, 1]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == (i % 128)
        )
        u_ref[:, :] = u_ref[:, :] + jnp.where(onehot, u, 0.0)
        if want_gx:
            B = gx.shape[1]
            gx_ref[:, :] = jnp.concatenate(
                [gx[0:3, :], jnp.zeros((5, B), jnp.float32)], axis=0
            )

    return kernel


def _full_specs(arrs):
    return [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in arrs
    ]


def precise_sdg_call(
    packed: PackedPrecise,
    biases: Tuple[jax.Array, ...],
    points: jax.Array,       # [N, 3] fp32
    dirs: jax.Array,         # [N, 3] fp32
    block: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(s, dd, g): precise value, directional derivative <g, dirs>, and
    spatial gradient, each fp32, one fused launch."""
    n = points.shape[0]
    n_pad = _round_up(max(n, block), block)
    pts = jnp.zeros((8, n_pad), jnp.float32)
    pts = pts.at[0:3, :n].set(points.T)
    vs = jnp.zeros((8, n_pad), jnp.float32)
    vs = vs.at[0:3, :n].set(dirs.T)

    kernel = _make_fwd_kernel(packed, len(biases), interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            *_full_specs(biases),
            *_full_specs(packed.ops),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(pts, vs, *biases, *packed.ops)
    return out[0, :n], out[1, :n], out[2:5, :n].T


def precise_bias_grads_call(
    packed: PackedPrecise,
    biases: Tuple[jax.Array, ...],
    points: jax.Array,       # [N, 3] fp32
    ct: jax.Array,           # [N] or [N, seed_rows] fp32 cotangents
    block: int = 512,
    interpret: bool = False,
    scalar_chain: bool = True,
    want_gx: bool = False,
):
    """Cotangent-weighted bias gradients u_l = delta_l @ ct for each
    z-consuming layer (ascending layer order), each [out_p]. With
    scalar_chain=False, ct is [N, seed_rows] PREACTIVATION cotangents
    for the last layer's leading rows (multi-channel heads). want_gx
    additionally returns the ct-weighted input-xyz gradient [N, 3]."""
    n = points.shape[0]
    n_pad = _round_up(max(n, block), block)
    pts = jnp.zeros((8, n_pad), jnp.float32)
    pts = pts.at[0:3, :n].set(points.T)
    cts = jnp.zeros((8, n_pad), jnp.float32)
    if ct.ndim == 1:
        seed_rows = 1
        cts = cts.at[0, :n].set(ct)
    else:
        seed_rows = ct.shape[1]
        cts = cts.at[0:seed_rows, :n].set(ct.T)

    u_rows = sum(m.out_p for m in packed.meta if m.takes_z)
    kernel = _make_bwd_kernel(packed, len(biases), u_rows,
                              seed_rows=seed_rows,
                              scalar_chain=scalar_chain, want_gx=want_gx,
                              interpret=interpret)
    out_specs = [pl.BlockSpec((u_rows, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((u_rows, 128), jnp.float32)]
    if want_gx:
        out_specs.append(pl.BlockSpec((8, block), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((8, n_pad), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            *_full_specs(biases),
            *_full_specs(packed.ops),
        ],
        out_specs=out_specs if want_gx else out_specs[0],
        out_shape=out_shapes if want_gx else out_shapes[0],
        interpret=interpret,
    )(pts, cts, *biases, *packed.ops)
    u = res[0] if want_gx else res
    u = jnp.sum(u, axis=1)
    out = []
    off = 0
    for m in packed.meta:
        if m.takes_z:
            out.append(u[off:off + m.out_p])
            off += m.out_p
    if want_gx:
        return out, res[1][0:3, :n].T
    return out


def make_precise_sdg(
    params: Params,
    cfg: DecoderConfig = DecoderConfig(),
    block: int = 512,
    interpret: Optional[bool] = None,
):
    """(latent, points, dirs) -> (s, dd, g) with a custom VJP.

    s is differentiable w.r.t. latent and points (gradients computed by
    the backward kernel + two tiny host matvecs); dd and g are
    VALUE-EXACT but carry no gradient — callers must treat them as
    stop-gradient (the renderer does: IFT denominator and normals).

    interpret=None auto-selects interpret mode off-TPU so CPU tests run
    the same code path.

    The weight packing runs INSIDE the custom_vjp'd functions (primal and
    backward separately): this builder may itself be invoked at trace
    time (the renderer does), and a custom_vjp closing over arrays staged
    in an outer trace leaks tracers across the cond/grad boundary. Only
    the concrete ``params`` pytree is closed over."""

    def _interp():
        if interpret is not None:
            return interpret
        return jax.default_backend() != "tpu"

    @jax.custom_vjp
    def sdg(latent, points, dirs):
        if latent.ndim != 1:
            raise ValueError(
                "precise_sdg folds ONE latent per call (got shape "
                f"{latent.shape}); per-point latents need the XLA path"
            )
        packed = pack_precise(params, cfg)
        biases = fold_bias_precise(params, latent, cfg, packed)
        return precise_sdg_call(packed, biases, points, dirs, block, _interp())

    def sdg_fwd(latent, points, dirs):
        out = sdg(latent, points, dirs)
        return out, (latent, points, out[2])

    def sdg_bwd(res, cts):
        latent, points, g = res
        ct_s = cts[0]
        # dd/g cotangents are structurally zero on the renderer path
        # (stop-gradient'ed); any nonzero cotangent there is silently
        # dropped — documented in GradConfig.recompute.
        packed = pack_precise(params, cfg)
        biases = fold_bias_precise(params, latent, cfg, packed)
        us = precise_bias_grads_call(
            packed, biases, points, ct_s, block, _interp()
        )
        gz = jnp.zeros_like(latent)
        for (li, wz_l), u in zip(packed.wz, us):
            gz = gz + wz_l @ u[:wz_l.shape[1]]
        gp = ct_s[:, None] * g
        return gz, gp, jnp.zeros_like(points)

    sdg.defvjp(sdg_fwd, sdg_bwd)
    return sdg


def make_color_vjp(
    params: Params,
    cfg: DecoderConfig,
    block: int = 512,
    interpret: Optional[bool] = None,
):
    """(latent, points) -> RGB [N, 3] with a custom VJP — the
    differentiable color-decoder path (photometric losses reach both the
    texture latent and, through surface points, geometry/pose).

    Primal: the bf16 fused eval kernel (color tolerances are loose — the
    reference evaluates color decoders in eval mode only). Backward: the
    seeded reverse kernel with sigmoid-preactivation cotangents
    (scalar_chain=False), emitting bias-path gz and per-ray gp in ONE
    launch. Requires cfg.final_tanh=False and cfg.use_tanh=False (the
    color-decoder convention, models/color_decoder.py)."""
    if cfg.final_tanh or cfg.use_tanh:
        raise ValueError("make_color_vjp expects a sigmoid-output head "
                         "(final_tanh=False, use_tanh=False)")

    def _interp():
        if interpret is not None:
            return interpret
        return jax.default_backend() != "tpu"

    @jax.custom_vjp
    def rgb_fn(latent, points):
        from dist_renderer_tpu.models.folded import fold_latent
        from dist_renderer_tpu.ops.pallas.mlp_eval import pallas_point_eval
        from dist_renderer_tpu.ops.pallas.fused_march import pack_folded

        if latent.ndim != 1:
            raise ValueError("one latent per call")
        packed_e = pack_folded(fold_latent(params, latent, cfg), cfg)
        logits = pallas_point_eval(
            packed_e, points, block, _interp(), out_rows=3
        )
        return jax.nn.sigmoid(logits)

    def rgb_fwd(latent, points):
        out = rgb_fn(latent, points)
        return out, (latent, points, out)

    def rgb_bwd(res, ct):
        latent, points, rgb = res
        ct_pre = ct * rgb * (1.0 - rgb)          # sigmoid derivative
        packed = pack_precise(params, cfg)
        biases = fold_bias_precise(params, latent, cfg, packed)
        us, gp = precise_bias_grads_call(
            packed, biases, points, ct_pre, block, _interp(),
            scalar_chain=False, want_gx=True,
        )
        gz = jnp.zeros_like(latent)
        for (li, wz_l), u in zip(packed.wz, us):
            gz = gz + wz_l @ u[:wz_l.shape[1]]
        return gz, gp

    rgb_fn.defvjp(rgb_fwd, rgb_bwd)
    return rgb_fn
