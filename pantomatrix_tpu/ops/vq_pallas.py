"""Pallas TPU kernel: fused VQ nearest-codebook search.

The VQ hot op (nn/vq.py ``nearest_code``; reference Quantizer.map2index,
processing_emage_audio.py:158-164) is a (N, D) x (D, K) distance matmul + argmin.
XLA already runs this well at EMAGE's sizes (D = K = 256); this kernel removes the
intermediate (N, K) distance materialization in HBM by fusing the MXU matmul with the
row argmin in VMEM — the serving path for large batched-window decodes.

Since ||z||^2 is constant per row it cannot change the argmin and is dropped; the
distance kernel computes ||e||^2 - 2 z.e. Ties resolve to the lowest index, matching
jnp.argmin / torch.argmin.

``nearest_code_fast`` dispatches: Pallas on TPU, the jnp path elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.vq import nearest_code as nearest_code_jnp


def _vq_argmin_kernel(z_ref, cbt_ref, csq_ref, out_ref):
    # z (TN, D); cbt (D, K); csq (1, K) codebook squared norms
    cross = jnp.dot(z_ref[:], cbt_ref[:], preferred_element_type=jnp.float32)
    dist = csq_ref[:] - 2.0 * cross  # (TN, K)
    out_ref[:] = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_code_pallas_flat(z_flat, codebook, interpret=False):
    n, d = z_flat.shape
    k = codebook.shape[0]
    TN = 256
    n_pad = ((n + TN - 1) // TN) * TN
    d_pad = ((d + 127) // 128) * 128
    k_pad = ((k + 127) // 128) * 128

    z_p = _pad_to(_pad_to(z_flat, n_pad, 0), d_pad, 1)
    cbt = _pad_to(_pad_to(codebook, k_pad, 0), d_pad, 1).T  # (Dp, Kp)
    csq = jnp.sum(cbt * cbt, axis=0, keepdims=True)  # (1, Kp)
    # padded codebook rows are all-zero -> csq 0, which would win argmin; push them out
    valid = (jnp.arange(k_pad) < k)[None, :]
    csq = jnp.where(valid, csq, jnp.inf)

    out = pl.pallas_call(
        _vq_argmin_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        grid=(n_pad // TN,),
        in_specs=[
            pl.BlockSpec((TN, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z_p, cbt, csq)
    return out[:n, 0]


def nearest_code_pallas(z: jnp.ndarray, codebook: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """z (..., D), codebook (K, D) -> (...,) int32 nearest indices."""
    flat = z.reshape(-1, z.shape[-1])
    idx = _nearest_code_pallas_flat(flat, codebook, interpret=interpret)
    return idx.reshape(z.shape[:-1])


def nearest_code_fast(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Pallas on TPU, jnp expansion elsewhere (identical indices)."""
    if jax.default_backend() == "tpu":
        return nearest_code_pallas(z, codebook)
    return nearest_code_jnp(z, codebook)


__all__ = ["nearest_code_fast", "nearest_code_pallas"]
