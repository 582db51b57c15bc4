"""Device-mesh construction for multi-chip rendering.

The reference has no distributed layer (SURVEY.md §2 'Parallelism
strategies'); this is the rebuild's first-class scale-out axis set:

  - "latents": shards independent shapes/frames (pure data parallel; DCN-
    friendly — no collectives during the march).
  - "rays":    shards pixels of a frame across chips (ICI; the march is
    communication-free per ray, grads over the shared latent psum over
    this axis).

Views are handled by vmap inside a shard (8-16 views fit on-chip) or by
folding them into the latents axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("latents", "rays"),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over available devices. With shape=None, puts all
    devices on the LAST axis (rays) — the right default for single-frame
    rendering — and 1 on the others."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [1] * (len(axes) - 1) + [n]
    shape = tuple(shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def ray_sharding(mesh: Mesh, axis: str = "rays") -> NamedSharding:
    """Sharding for a flat ray-major array [N, ...]: N split over `axis`."""
    return NamedSharding(mesh, P(axis))


def latent_sharding(mesh: Mesh, axis: str = "latents") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
