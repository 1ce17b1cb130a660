"""Functional neural-net primitives over torch-layout parameter pytrees.

Design: parameters live in nested dicts whose keys mirror PyTorch ``state_dict`` paths
(e.g. ``params["conv1"]["weight"]`` with torch tensor layouts). This makes importing the
reference checkpoints (``H-Liu1997/{disco,camn,emage}_audio``) a pure tree-map, while the
apply functions are plain JAX: everything jits, vmaps, grads, and shards with ``pjit``.

Numerics match PyTorch CPU float32 (same conv padding, BatchNorm eps/momentum, LeakyReLU
slopes, LayerNorm eps), verified by golden tests against torch modules in
``tests/test_nn_blocks.py``.

Tensor layout convention: activations are channels-last ``(batch, length, channels)`` —
the TPU-friendly layout — while weights keep torch layout (transposed at use; XLA folds
the transpose into the conv/matmul).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Context: threads train-mode, rng, and BatchNorm running-stat updates
# ---------------------------------------------------------------------------

@dataclass
class Ctx:
    """Per-apply context.

    train:      enables dropout and batch-stat BatchNorm.
    rng:        PRNG key for dropout (split per call in trace order).
    axis_name:  mesh axis for cross-replica BatchNorm stat sync (SyncBatchNorm parity
                with train_emage_audio.py:248) — ``pmean`` over this axis when set.
    bn_updates: mutable dict collecting new running stats keyed by param-tree path.
    """

    train: bool = False
    rng: Optional[Array] = None
    axis_name: Optional[str] = None
    bn_updates: Optional[Dict[tuple, Dict[str, Array]]] = None
    _rng_count: int = field(default=0, repr=False)

    def next_rng(self) -> Array:
        if self.rng is None:
            raise ValueError("Ctx.rng required for dropout in train mode")
        self._rng_count += 1
        return jax.random.fold_in(self.rng, self._rng_count)


EVAL = Ctx(train=False)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def linear(p: Params, x: Array) -> Array:
    """torch nn.Linear: weight (out, in), optional bias."""
    y = x @ p["weight"].T
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def embedding(p: Params, ids: Array) -> Array:
    """torch nn.Embedding lookup: weight (num, dim)."""
    return jnp.take(p["weight"], ids, axis=0)


def conv1d(
    p: Params,
    x: Array,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> Array:
    """torch nn.Conv1d on channels-last input.

    x: (B, L, Cin); weight: torch layout (Cout, Cin, K); returns (B, Lout, Cout).
    Symmetric zero padding, exactly torch's ``padding`` semantics.
    """
    w = jnp.transpose(p["weight"], (2, 1, 0))  # (K, Cin, Cout)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y


def batch_norm1d(
    p: Params,
    x: Array,
    ctx: Ctx = EVAL,
    path: tuple = (),
    eps: float = 1e-5,
    momentum: float = 0.1,
) -> Array:
    """torch nn.BatchNorm1d over channels-last (B, L, C) (or (B, C)).

    Eval mode normalizes with running stats. Train mode normalizes with (biased) batch
    stats and records running-stat updates (unbiased var, torch convention) in
    ``ctx.bn_updates``; with ``ctx.axis_name`` set, batch stats are ``pmean``-ed across
    the mesh axis (SyncBatchNorm parity).
    """
    if ctx.train:
        reduce_axes = tuple(range(x.ndim - 1))
        # batch stats always accumulate in float32: a bf16 sum over B*L elements
        # loses ~log2(B*L) mantissa bits, which corrupts both normalization and
        # the running-stat trajectory under compute_dtype="bfloat16" training
        xf = x.astype(jnp.float32) if x.dtype in (jnp.bfloat16, jnp.float16) else x
        mean = jnp.mean(xf, axis=reduce_axes)
        if ctx.axis_name is not None:
            mean = jax.lax.pmean(mean, ctx.axis_name)
        # two-pass (x - mean)^2 variance: the E[x^2]-E[x]^2 form loses ~mean^2/var
        # relative precision in fp32, which is visible after the WavEncoder's
        # large-activation conv stages
        var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
        if ctx.axis_name is not None:
            var = jax.lax.pmean(var, ctx.axis_name)
        if ctx.bn_updates is not None:
            n = x.size // x.shape[-1]
            if ctx.axis_name is not None:
                n = n * jax.lax.psum(1, ctx.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            new_count = p.get("num_batches_tracked", jnp.zeros((), jnp.int32))
            # accumulate running stats in the batch-stat dtype (float32 under
            # bf16/f16 compute, float64 under x64 golden tests) — never lower
            rm = p["running_mean"].astype(mean.dtype)
            rv = p["running_var"].astype(mean.dtype)
            ctx.bn_updates[path] = {
                "running_mean": (1 - momentum) * rm + momentum * mean,
                "running_var": (1 - momentum) * rv + momentum * unbiased,
                "num_batches_tracked": new_count + 1,
            }
    else:
        mean = p["running_mean"]
        var = p["running_var"]
    if x.dtype in (jnp.bfloat16, jnp.float16):
        # per-channel scale/shift in float32 (free: C-sized vectors) so low-precision
        # running stats don't lose normalization accuracy; the elementwise apply
        # stays in the activation dtype
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
        scale = inv * p["weight"].astype(jnp.float32)
        shift = p["bias"].astype(jnp.float32) - mean.astype(jnp.float32) * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * (inv * p["weight"]) + p["bias"]


def layer_norm(p: Params, x: Array, eps: float = 1e-5) -> Array:
    """torch nn.LayerNorm over the last dim.

    Under bfloat16/float16 activations the mean/variance reduction runs in float32
    (8-bit mantissas lose the variance of near-constant rows entirely); the result
    is cast back to the activation dtype.
    """
    if x.dtype in (jnp.bfloat16, jnp.float16):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (y * p["weight"] + p["bias"]).astype(x.dtype)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def leaky_relu(x: Array, negative_slope: float = 0.01) -> Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def dropout(x: Array, rate: float, ctx: Ctx) -> Array:
    """torch nn.Dropout: train-only, inverted scaling."""
    if not ctx.train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.softmax(x, axis=axis)


def log_softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.log_softmax(x, axis=axis)


# ---------------------------------------------------------------------------
# torch-default initializers (for from-scratch training parity)
# ---------------------------------------------------------------------------

def init_linear(key: Array, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"weight": jax.random.uniform(k1, (out_dim, in_dim), minval=-bound, maxval=bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound)
    return p


def init_conv1d(
    key: Array, in_ch: int, out_ch: int, kernel: int, bias: bool = True
) -> Params:
    """torch nn.Conv1d default init."""
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            k1, (out_ch, in_ch, kernel), minval=-bound, maxval=bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), minval=-bound, maxval=bound)
    return p


def init_linear_xavier_normal(
    key: Array, in_dim: int, out_dim: int, bias: bool = True
) -> Params:
    """xavier_normal weight + zero bias (reference init_weight, processing_emage_audio.py:172-176)."""
    std = math.sqrt(2.0 / (in_dim + out_dim))
    p = {"weight": jax.random.normal(key, (out_dim, in_dim)) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def init_conv1d_xavier_normal(
    key: Array, in_ch: int, out_ch: int, kernel: int, bias: bool = True
) -> Params:
    """xavier_normal for conv (fan_in/out include receptive field, torch semantics)."""
    fan_in = in_ch * kernel
    fan_out = out_ch * kernel
    std = math.sqrt(2.0 / (fan_in + fan_out))
    p = {"weight": jax.random.normal(key, (out_ch, in_ch, kernel)) * std}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def init_batch_norm1d(num_features: int) -> Params:
    return {
        "weight": jnp.ones((num_features,)),
        "bias": jnp.zeros((num_features,)),
        "running_mean": jnp.zeros((num_features,)),
        "running_var": jnp.ones((num_features,)),
        "num_batches_tracked": jnp.zeros((), jnp.int32),
    }


def init_layer_norm(num_features: int) -> Params:
    return {"weight": jnp.ones((num_features,)), "bias": jnp.zeros((num_features,))}


def init_embedding(key: Array, num: int, dim: int) -> Params:
    """torch nn.Embedding default init: N(0, 1)."""
    return {"weight": jax.random.normal(key, (num, dim))}


def apply_bn_updates(params: Params, bn_updates: Dict[tuple, Dict[str, Array]]) -> Params:
    """Merge collected BatchNorm running-stat updates back into a param tree."""
    out = jax.tree_util.tree_map(lambda v: v, params)  # fresh dicts, shared leaves

    def set_path(tree, path, leaf_updates):
        node = tree
        for k in path:
            node = node[k]
        node.update(leaf_updates)

    for path, leaf_updates in bn_updates.items():
        set_path(out, path, leaf_updates)
    return out


__all__ = [
    "Ctx",
    "EVAL",
    "Params",
    "apply_bn_updates",
    "batch_norm1d",
    "conv1d",
    "dropout",
    "embedding",
    "init_batch_norm1d",
    "init_conv1d",
    "init_conv1d_xavier_normal",
    "init_embedding",
    "init_layer_norm",
    "init_linear",
    "init_linear_xavier_normal",
    "layer_norm",
    "leaky_relu",
    "linear",
    "log_softmax",
    "softmax",
]
