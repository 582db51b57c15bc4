"""Debug-mode helpers (SURVEY.md §5 'Race detection / sanitizers').

JAX's functional purity removes data races by construction; what remains
is numerical debugging: NaN tracking, bounds checking via checkify, and
interpret-mode Pallas execution."""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False) -> Iterator[None]:
    """Enable jax_debug_nans (and optionally eager mode) within a scope."""
    prev_nans = jax.config.jax_debug_nans
    prev_jit = jax.config.jax_disable_jit
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_disable_jit", disable_jit)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_disable_jit", prev_jit)


def checkify_render(render_fn):
    """Wrap a render function with checkify: returns (err, out); call
    err.throw() to surface device-side assertion failures (index bounds,
    NaN) as Python exceptions."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        render_fn, errors=checkify.float_checks | checkify.index_checks
    )
    return checked


@contextlib.contextmanager
def pallas_interpret() -> Iterator[None]:
    """Force Pallas kernels into interpreter mode (CPU-debuggable)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
