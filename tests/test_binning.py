"""Counting-sort permutation == stable argsort (the glue-cost replacement
for ray-class binning)."""

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.ops.binning import counting_sort_perm


def test_counting_sort_matches_stable_argsort():
    key = jax.random.randint(jax.random.PRNGKey(0), (3, 1000), 0, 5)
    order, inv = counting_sort_perm(key, 5)
    ref = jnp.argsort(key, axis=-1, stable=True)
    np.testing.assert_array_equal(np.asarray(order), np.asarray(ref))
    # inv unsorts: sorted[inv] == x
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 1000))
    s = jnp.take_along_axis(x, order, axis=-1)
    np.testing.assert_array_equal(
        np.asarray(jnp.take_along_axis(s, inv, axis=-1)), np.asarray(x)
    )


def test_counting_sort_one_dim_and_degenerate():
    key = jnp.zeros((64,), jnp.int32)  # all one class
    order, inv = counting_sort_perm(key, 3)
    np.testing.assert_array_equal(np.asarray(order), np.arange(64))
    np.testing.assert_array_equal(np.asarray(inv), np.arange(64))
