"""Does int8 MXU double the march's block-step rate on this v5e?

The march is eval-bound at bf16 MXU peak (~9.8 us/block-step for the
8x512 MLP at 512 lanes — scripts/diag_kernel.py). v5e datasheet int8
throughput is 2x bf16 (394 TOPS vs 197 TFLOPS). This measures an
apples-to-apples Mosaic kernel: STEPS chained evaluations of an
8-layer 512-wide MLP per block, (a) bf16 dots + fp32 accum (the
production march math), (b) int8 dots + int32 accum with per-layer
requantization (scale + clamp + round on the VPU, relu folded into the
clamp). The carry feeds each step's output back into the next step's
input so no iteration can be hoisted.

  python scripts/diag_int8.py [--steps 32] [--layers 8] [--width 512]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync_fetch(out):
    """Pull one scalar to the host — the only reliable sync here."""
    import jax.numpy as _jnp

    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(_jnp.sum(x))


def timeit(fn, *a, n=5):
    # hard host-fetch syncs: block_until_ready is a silent no-op until
    # the process's first device->host fetch (docs/PERFORMANCE.md)
    out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    return (time.perf_counter() - t0) / n


def make_bf16_kernel(n_layers, steps):
    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        o_ref = refs[n_layers]

        def body(_, h0):
            h = h0
            for li in range(n_layers):
                acc = jax.lax.dot_general(
                    w_refs[li][:, :], h.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
            # feed back (prevents hoisting); rescale to keep magnitudes sane
            return (h0 + 0.125 * h.astype(jnp.float32) / (1.0 + jnp.abs(h.astype(jnp.float32))))

        h = jax.lax.fori_loop(0, steps, body, x_ref[:, :])
        o_ref[:, :] = h

    return kernel


def make_int8_kernel(n_layers, steps):
    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        o_ref = refs[n_layers]

        def body(_, h0):
            # quantize the carry once per step (the real march would
            # quantize the 3 xyz rows of p8)
            q = jnp.clip(jnp.round(h0 * 16.0), -127.0, 127.0).astype(jnp.int8)
            h = q
            for li in range(n_layers):
                acc = jax.lax.dot_general(
                    w_refs[li][:, :], h,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # requant: scale, relu folded into the [0, 127] clamp
                f = acc.astype(jnp.float32) * (1.0 / 512.0)
                h = jnp.clip(jnp.round(f), 0.0, 127.0).astype(jnp.int8)
            return (h0 + 0.125 * h.astype(jnp.float32) / (1.0 + jnp.abs(h.astype(jnp.float32))))

        h = jax.lax.fori_loop(0, steps, body, x_ref[:, :])
        o_ref[:, :] = h

    return kernel


def run(kind, n_layers, width, block, steps, nblocks):
    key = jax.random.PRNGKey(0)
    if kind == "bf16":
        ws = [
            (0.05 * jax.random.normal(jax.random.fold_in(key, i),
                                      (width, width))).astype(jnp.bfloat16)
            for i in range(n_layers)
        ]
        kern = make_bf16_kernel(n_layers, steps)
    else:
        ws = [
            jax.random.randint(jax.random.fold_in(key, i), (width, width),
                               -127, 128, jnp.int8)
            for i in range(n_layers)
        ]
        kern = make_int8_kernel(n_layers, steps)

    x = jax.random.normal(jax.random.fold_in(key, 99), (width, nblocks * block),
                          jnp.float32)

    f = jax.jit(lambda x, *ws: pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((width, block), lambda i: (0, i)),
            *[pl.BlockSpec((width, width), lambda i: (0, 0)) for _ in ws],
        ],
        out_specs=pl.BlockSpec((width, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((width, nblocks * block), jnp.float32),
    )(x, *ws))

    t = timeit(f, x, *ws)
    us = t * 1e6 / (nblocks * steps)
    flops = 2 * n_layers * width * width * block
    eff = flops / (us * 1e-6) / 1e12
    print(f"{kind:5s} width={width} block={block}: {t*1e3:7.2f} ms for "
          f"{nblocks}x{steps} block-steps -> {us:6.2f} us/block-step "
          f"({eff:6.1f} T{'OP' if kind=='int8' else 'FLOP'}s eff)", flush=True)
    return us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--nblocks", type=int, default=64)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    us_b = run("bf16", args.layers, args.width, args.block, args.steps,
               args.nblocks)
    us_i = run("int8", args.layers, args.width, args.block, args.steps,
               args.nblocks)
    print(f"int8 speedup: {us_b / us_i:.2f}x", flush=True)


if __name__ == "__main__":
    main()
