"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pantomatrix_tpu.nn.vq import nearest_code
from pantomatrix_tpu.ops.vq_pallas import nearest_code_pallas


@pytest.mark.parametrize("n,d,k", [(512, 256, 256), (37, 16, 24), (640, 106, 256)])
def test_vq_argmin_matches_reference(n, d, k):
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.normal(0, 1, (n, d)).astype(np.float32))
    cb = jnp.asarray(rng.normal(0, 1, (k, d)).astype(np.float32))
    ref = np.asarray(nearest_code(z, cb))
    got = np.asarray(nearest_code_pallas(z, cb, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_vq_argmin_batched_shape():
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.normal(0, 1, (2, 8, 16)).astype(np.float32))
    cb = jnp.asarray(rng.normal(0, 1, (16, 16)).astype(np.float32))
    got = nearest_code_pallas(z, cb, interpret=True)
    assert got.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(nearest_code(z, cb)))
