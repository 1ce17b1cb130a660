"""Mixed-precision helpers for TPU serving.

The reference runs everything in float32 (torch default). On TPU the MXU computes
matmuls in bfloat16 natively, so the remaining float32 cost is HBM traffic and VPU
work on fp32 activations. ``cast_floating`` converts a parameter tree (or any pytree
of arrays) to a compute dtype while leaving integer leaves — BatchNorm
``num_batches_tracked`` counters, codebook indices — untouched.

Numerical safety is handled inside the primitives, not here: ``layer_norm``,
``batch_norm1d``, softmax-attention, and ``velocity2position`` accumulate in float32
regardless of the activation dtype (see nn/layers.py, nn/attention.py,
core/integrate.py), so bfloat16 activations only affect element-wise storage
precision, not reduction accuracy.

bfloat16 inference is an opt-in serving mode (serve.py generators, ``BENCH_DTYPE``);
the parity-critical default stays float32 to remain bit-comparable with the
reference checkpoints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast every floating-point leaf of ``tree`` to ``dtype``; keep ints/bools."""
    dtype = jnp.dtype(dtype)

    def cast(x):
        if isinstance(x, (jax.Array,)) or hasattr(x, "dtype"):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


__all__ = ["cast_floating"]
