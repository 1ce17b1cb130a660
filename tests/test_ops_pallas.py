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


@pytest.mark.parametrize("t,b,h", [(12, 8, 128), (9, 5, 96), (20, 16, 512)])
def test_lstm_sequence_pallas_matches_scan(t, b, h):
    """Fused sequence kernel == lax.scan direction, incl. non-aligned B/H padding."""
    from pantomatrix_tpu.nn.lstm import _lstm_direction
    from pantomatrix_tpu.ops.lstm_pallas import lstm_sequence_pallas

    rng = np.random.RandomState(2)
    x_proj = jnp.asarray(rng.normal(0, 1, (t, b, 4 * h)).astype(np.float32))
    w_hh = jnp.asarray(rng.normal(0, 0.2, (4 * h, h)).astype(np.float32))
    ref = np.asarray(_lstm_direction(x_proj, w_hh, h))
    got = np.asarray(lstm_sequence_pallas(x_proj, w_hh, h, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_lstm_pallas_custom_vjp_grad_is_scan_grad():
    """The fused path's backward recomputes via the scan: gradients must be exactly
    the scan path's gradients (custom_vjp bwd wiring)."""
    from pantomatrix_tpu.nn.lstm import (
        _lstm_direction,
        _lstm_direction_pallas_bwd,
    )

    t, b, h = 6, 4, 32
    rng = np.random.RandomState(3)
    x_proj = jnp.asarray(rng.normal(0, 1, (t, b, 4 * h)).astype(np.float32))
    w_hh = jnp.asarray(rng.normal(0, 0.2, (4 * h, h)).astype(np.float32))

    loss = lambda xp, w: jnp.sum(_lstm_direction(xp, w, h) ** 2)
    gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh)

    # cotangent of sum(y^2) is 2y
    y = _lstm_direction(x_proj, w_hh, h)
    gx, gw = _lstm_direction_pallas_bwd(h, (x_proj, w_hh), 2.0 * y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-6)
