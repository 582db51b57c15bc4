"""DeepSDF latent-conditioned MLP decoder as a pure JAX function.

Reference analog: ``core/net/deep_sdf_decoder.py`` (vendored DeepSDF decoder,
Park et al. CVPR 2019) and ``core/utils/decoder_utils.py`` (``decode_sdf``
chunked evaluation) in B1ueber2y/DIST-Renderer — see SURVEY.md §2 rows 1-2.

Architecture (defaults): f_theta(z, x) -> sdf with z in R^256, x in R^3;
8 FC layers x 512 units, ReLU, skip-concat of the full input at layer 4
(the layer before the skip shrinks its output so the concat lands back on
512), final tanh. Weight-norm is folded into plain weights at checkpoint
load time (correct for frozen inference decoders — SURVEY.md §5
"Checkpoint / resume").

TPU-first differences from the reference:
  - params are a pytree of plain (W, b); the forward is a pure function,
    trivially vmap/pjit-able and traceable into Pallas kernels;
  - matmuls run in a configurable compute dtype (bf16 on TPU) with fp32
    accumulation via ``preferred_element_type``;
  - chunked evaluation uses ``lax.map`` over static-shape chunks instead of
    a Python loop, so it stays inside one XLA computation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dist_renderer_tpu.config import DecoderConfig

Params = Dict[str, Any]


def init_decoder_params(
    key: jax.Array, cfg: DecoderConfig, dtype=jnp.float32
) -> Params:
    """He-style init mirroring weight-norm'd linear layers at eval time."""
    layers = []
    for (d_in, d_out) in cfg.layer_dims:
        key, wk = jax.random.split(key)
        scale = jnp.sqrt(2.0 / d_in)
        w = jax.random.normal(wk, (d_in, d_out), dtype) * scale
        b = jnp.zeros((d_out,), dtype)
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def _matmul(h: jax.Array, w: jax.Array, b: jax.Array, dtype,
            precision=None) -> jax.Array:
    """Matmul in the compute dtype with fp32 accumulation (MXU-friendly).

    precision: jax.lax.Precision for fp32 inputs. On TPU the DEFAULT
    precision runs fp32 matmuls as single bf16 passes (~1e-3 relative
    error) — callers needing true fp32 (the differentiable recompute that
    anchors 1e-3 depth parity) must pass HIGH/HIGHEST explicitly."""
    out = jax.lax.dot_general(
        h.astype(dtype),
        w.astype(dtype),
        (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out + b.astype(jnp.float32)


def _matmul_split(h: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """fp32-accurate matmul from THREE default-precision bf16 dots
    (hand-rolled bf16x3): y = xh@Wh + xh@Wl + xl@Wh with x = xh + xl,
    W = Wh + Wl split at bf16 boundaries; the dropped xl@Wl term is
    O(2^-16) relative. Used for the precise VALUE path because explicit
    Precision.HIGH/HIGHEST dots crash the remote XLA fusion pass on this
    deployment (docs/PERFORMANCE.md infra notes)."""
    xh = h.astype(jnp.bfloat16)
    xl = (h - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((h.ndim - 1,), (0,)), ((), ()))
    dot = lambda a, bb: jax.lax.dot_general(
        a, bb, dims, preferred_element_type=jnp.float32
    )
    return dot(xh, wh) + dot(xh, wl) + dot(xl, wh) + b.astype(jnp.float32)


def decoder_apply(
    params: Params,
    latent: jax.Array,
    points: jax.Array,
    cfg: DecoderConfig = DecoderConfig(),
    compute_dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """Evaluate f_theta(z, x) -> sdf.

    Args:
      params: {"layers": [{"w": [in,out], "b": [out]}, ...]}
      latent: [latent_size] or [N, latent_size]
      points: [..., 3]
    Returns:
      sdf: [...] (points shape minus the last axis), fp32.
    """
    pts_shape = points.shape[:-1]
    x = points.reshape(-1, 3)
    n = x.shape[0]
    if latent.ndim == 1:
        z = jnp.broadcast_to(latent[None, :], (n, latent.shape[-1]))
    else:
        z = latent.reshape(-1, latent.shape[-1])
        z = jnp.broadcast_to(z, (n, latent.shape[-1]))
    inp = jnp.concatenate([z, x], axis=-1).astype(jnp.float32)

    h = inp
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if i in cfg.latent_in:
            h = jnp.concatenate([h, inp], axis=-1)
        elif cfg.xyz_in_all and 0 < i < n_layers - 1:
            h = jnp.concatenate([h, x], axis=-1)
        takes_input = i == 0 or i in cfg.latent_in
        if precision == "split" or (precision == "split_x" and takes_input):
            h = _matmul_split(h, layer["w"], layer["b"])
        elif precision == "split_x":
            # hidden layers: one bf16 pass (their activations are already
            # bf16-rounded; splitting buys nothing measurable — see
            # scripts/diag_precision.py)
            h = _matmul(h, layer["w"], layer["b"], jnp.bfloat16, None)
        else:
            h = _matmul(h, layer["w"], layer["b"], compute_dtype, precision)
        if i == n_layers - 1:
            # DeepSDF "use_tanh": extra tanh on the final linear output
            # (DeepSDF's `layer == num_layers - 2` with num_layers = len(dims))
            if cfg.use_tanh:
                h = jnp.tanh(h)
        else:
            h = jax.nn.relu(h)
    sdf = h[..., 0]
    if cfg.final_tanh:
        sdf = jnp.tanh(sdf)
    return sdf.reshape(pts_shape)


def decoder_apply_with_dd(
    params: Params,
    latent: jax.Array,
    points: jax.Array,
    dirs: jax.Array,
    cfg: DecoderConfig = DecoderConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """One fused pass computing (sdf, directional derivative along dirs).

    The IFT denominator <grad_x f, v> previously came from a separate
    jax.jvp over the folded decoder — a full primal+tangent evaluation
    (measured 8.0 ms per 512^2 bucket) DUPLICATING the primal work the
    precise value eval had just done. Here the tangent chain rides the
    value forward pass: one extra bf16 matmul per layer, gated by the
    shared pre-activations (+~1.7 ms instead of +8). Value precision is
    split_x exactly like make_precise_sdf; the tangent is bf16 (the
    denominator is clamped and stop-gradient'ed by the renderer, so ~1e-2
    relative error is harmless)."""
    pts_shape = points.shape[:-1]
    x = points.reshape(-1, 3)
    v = dirs.reshape(-1, 3)
    n = x.shape[0]
    if latent.ndim == 1:
        z = jnp.broadcast_to(latent[None, :], (n, latent.shape[-1]))
    else:
        z = jnp.broadcast_to(
            latent.reshape(-1, latent.shape[-1]), (n, latent.shape[-1])
        )
    inp = jnp.concatenate([z, x], axis=-1).astype(jnp.float32)
    # d(inp)/dd along the ray: latent rows are constant, xyz rows move by v
    t_inp = jnp.concatenate(
        [jnp.zeros((n, latent.shape[-1]), jnp.float32), v.astype(jnp.float32)],
        axis=-1,
    )

    def tmul(t, w):
        return jax.lax.dot_general(
            t.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    h = inp
    t = t_inp
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if i in cfg.latent_in:
            h = jnp.concatenate([h, inp], axis=-1)
            t = jnp.concatenate([t, t_inp], axis=-1)
        elif cfg.xyz_in_all and 0 < i < n_layers - 1:
            h = jnp.concatenate([h, x], axis=-1)
            t = jnp.concatenate([t, v.astype(jnp.float32)], axis=-1)
        takes_input = i == 0 or i in cfg.latent_in
        if takes_input:
            pre = _matmul_split(h, layer["w"], layer["b"])
        else:
            pre = _matmul(h, layer["w"], layer["b"], jnp.bfloat16, None)
        t = tmul(t, layer["w"])
        if i == n_layers - 1:
            if cfg.use_tanh:
                t = t * (1.0 - jnp.tanh(pre) ** 2)
                pre = jnp.tanh(pre)
            h = pre
        else:
            gate = pre > 0
            h = jnp.where(gate, pre, 0.0)
            t = jnp.where(gate, t, 0.0)
    s = h[..., 0]
    dd = t[..., 0]
    if cfg.final_tanh:
        dd = dd * (1.0 - jnp.tanh(s) ** 2)
        s = jnp.tanh(s)
    return s.reshape(pts_shape), dd.reshape(pts_shape)


def make_precise_sdf(params: Params, cfg: DecoderConfig = DecoderConfig()):
    """(latent, points) -> sdf with HIGH-precision VALUE and
    default-precision GRADIENTS.

    Rationale: on TPU, default matmul precision is a single bf16 pass
    (~1e-3 relative error) — not enough for the depth-anchoring value that
    carries the 1e-3 parity bar — but gradients feeding Adam tolerate it
    fine. Keeping the backward at default precision also sidesteps a
    remote-XLA fusion-pass crash observed with HIGH-precision transposed
    dots (docs/PERFORMANCE.md, infra notes)."""

    @jax.custom_vjp
    def f(latent, points):
        # split_x: bf16x3 split on the layers that consume the raw (z, x)
        # input; single bf16 dots on the hidden layers. Measured against a
        # CPU fp32 reference (scripts/diag_precision.py): near-surface
        # value error p95 1.22e-3 vs 1.21e-3 for split-everywhere, at 2.4x
        # lower cost (22.8 vs 55.8 ms per 512^2 frame) — the error tail is
        # ReLU-flip sensitivity of the learned net, not matmul precision.
        return decoder_apply(params, latent, points, cfg, precision="split_x")

    def f_fwd(latent, points):
        return f(latent, points), (latent, points)

    def f_bwd(res, ct):
        latent, points = res
        # bf16 compute in the backward: gradient consumers (Adam, unit-
        # normalized normals) tolerate ~1e-3 relative error, and bf16-input
        # dots are the only ones this deployment's compiler never rejects
        _, vjp = jax.vjp(
            lambda z, p: decoder_apply(params, z, p, cfg, jnp.bfloat16),
            latent, points,
        )
        return vjp(ct)

    f.defvjp(f_fwd, f_bwd)
    # cheap single-bf16-pass sibling: miss rays' silhouette MARGINS tolerate
    # ~1e-3 relative error (they feed a loss margin, not the depth-parity
    # anchor) — the renderer's hit-compacted recompute uses this for the
    # non-hit remainder (GradConfig.compact_frac)
    f.cheap = lambda latent, points: decoder_apply(
        params, latent, points, cfg, jnp.bfloat16
    )

    # fused (value, directional-derivative) sibling for the IFT path:
    # same precise value + its custom_vjp; the dd output carries NO
    # gradient (the renderer stop-gradients the denominator anyway)
    @jax.custom_vjp
    def f_dd(latent, points, dirs):
        return decoder_apply_with_dd(params, latent, points, dirs, cfg)

    def fdd_fwd(latent, points, dirs):
        return f_dd(latent, points, dirs), (latent, points, dirs)

    def fdd_bwd(res, ct):
        latent, points, dirs = res
        ct_s, _ct_dd = ct
        _, vjp = jax.vjp(
            lambda z, p: decoder_apply(params, z, p, cfg, jnp.bfloat16),
            latent, points,
        )
        gz, gp = vjp(ct_s)
        return gz, gp, jnp.zeros_like(dirs)

    f_dd.defvjp(fdd_fwd, fdd_bwd)
    f.with_dd = f_dd

    # fused Pallas recompute sibling (GradConfig.recompute="pallas"):
    # built AT TRACE TIME, uncached — the weight packing stages into the
    # caller's trace as constant subgraphs (XLA folds them at compile
    # time; zero eager tunnel ops), and caching staged values across
    # traces would leak tracers (omnistaging stages jnp ops on concrete
    # inputs too) — ops/pallas/recompute.py
    def sdg_builder(block: int = 512):
        from dist_renderer_tpu.ops.pallas.recompute import make_precise_sdg

        return make_precise_sdg(params, cfg, block)

    f.sdg_builder = sdg_builder
    return f


def decode_sdf(
    params: Params,
    latent: jax.Array,
    points: jax.Array,
    cfg: DecoderConfig = DecoderConfig(),
    compute_dtype=jnp.float32,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Chunked decoder evaluation, the rebuild of the reference's
    ``decode_sdf`` (core/utils/decoder_utils.py): broadcasts one latent over
    N points, evaluating in memory-bounded chunks.

    With ``chunk=None`` evaluates in one shot (the common tracer path —
    XLA pipelines it). With a chunk size, pads N up to a multiple and runs
    ``lax.map`` over static-shape chunks (for huge grids, e.g. mesh
    extraction at 256^3)."""
    if chunk is None:
        return decoder_apply(params, latent, points, cfg, compute_dtype)
    pts = points.reshape(-1, 3)
    n = pts.shape[0]
    n_pad = (-n) % chunk
    pts_p = jnp.pad(pts, ((0, n_pad), (0, 0)))
    chunks = pts_p.reshape(-1, chunk, 3)
    f = lambda c: decoder_apply(params, latent, c, cfg, compute_dtype)
    out = jax.lax.map(f, chunks).reshape(-1)[:n]
    return out.reshape(points.shape[:-1])


def sdf_gradient(
    params: Params,
    latent: jax.Array,
    points: jax.Array,
    cfg: DecoderConfig = DecoderConfig(),
    eps: float = 0.0,
) -> jax.Array:
    """Spatial gradient d f / d x at each point — used for surface normals.

    eps == 0: exact reverse-mode gradient (sum trick: since each output sdf_i
    depends only on x_i, grad of sum(sdf) w.r.t. points gives per-point
    gradients in ONE backward pass — no vmap-of-grad N^2 blowup).
    eps > 0: central finite differences (6 extra decoder evals), matching the
    reference's finite-difference normal option (SURVEY.md §3.1 NORMAL)."""
    if eps > 0.0:
        offs = jnp.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            dtype=points.dtype,
        ) * eps  # [6,3]
        probe = points[..., None, :] + offs  # [..., 6, 3]
        s = decoder_apply(params, latent, probe.reshape(-1, 3), cfg)
        s = s.reshape(points.shape[:-1] + (6,))
        grad = jnp.stack(
            [s[..., 0] - s[..., 1], s[..., 2] - s[..., 3], s[..., 4] - s[..., 5]],
            axis=-1,
        ) / (2.0 * eps)
        return grad

    def total(p):
        return jnp.sum(decoder_apply(params, latent, p, cfg))

    return jax.grad(total)(points)


class DeepSDFDecoder:
    """Thin OO convenience wrapper (functional core above is the real API).

    Mirrors the role of the reference's ``Decoder(nn.Module)`` +
    ``load_decoder`` pair for users porting scripts across."""

    def __init__(self, cfg: DecoderConfig = DecoderConfig(), params: Optional[Params] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg
        if params is None:
            params = init_decoder_params(key or jax.random.PRNGKey(0), cfg)
        self.params = params

    def __call__(self, latent: jax.Array, points: jax.Array, **kw) -> jax.Array:
        return decode_sdf(self.params, latent, points, self.cfg, **kw)

    def gradient(self, latent: jax.Array, points: jax.Array, eps: float = 0.0) -> jax.Array:
        return sdf_gradient(self.params, latent, points, self.cfg, eps)
