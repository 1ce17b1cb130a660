"""AESKConv — the FGD feature extractor: a skeleton-aware convolutional encoder.

The reference computes FGD through a pretrained skeleton autoencoder shipped as
``AESKConv_240_100.bin`` by the external ``emage_evaltools`` package
(/root/reference/README.md:92, driven at /root/reference/train_emage_audio.py:421-428).
That model is the BEAT codebase's ``VAESKConv``: a ``LocalEncoder`` built from
skeleton-aware convolutions and pools ("Skeleton-Aware Networks for Deep Motion
Retargeting", Aberman et al. 2020) over the SMPL-X kinematic tree, plus a conv
decoder. FGD only needs the ENCODER (``map2latent``).

Architecture (validated against the weight file's own naming): 55-joint SMPL-X
kintree -> 54 edges + 1 "global part" = 55 parts x 6 rot6d channels = 330 input
channels; 4 layers of [SkeletonConv(k=3, stride=2, zero-pad 1, neighbor distance 2)
-> SkeletonPool(mean over degree-2 edge chains) -> LeakyReLU(0.2)] with channel
growth [1,1,2,1] from a base of 6 -> final layout 20 parts x 12 channels = the
**240**-wide latent in ``AESKConv_240_100``; time is downsampled 2x per layer (64
frames -> 4 latent frames).

Everything topological (edge lists, neighbor masks, pooling matrices) is computed
host-side as numpy constants; the hot conv path is pure JAX. State-dict import maps
torch key paths (``encoder.layers.{i}.0.weight``) directly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# SMPL-X 2020 kinematic-tree parents (55 joints; kintree_table[0] of
# SMPLX_NEUTRAL_2020.npz). Embedded so FGD works without the model archive.
SMPLX_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 15, 15, 15, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,
    20, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
)


def build_edge_topology(parents: Sequence[int]) -> List[Tuple[int, int]]:
    """(parent, child) bone list — one edge per non-root joint."""
    return [(int(parents[i]), i) for i in range(1, len(parents))]


def calc_edge_mat(edges: Sequence[Tuple[int, int]]) -> np.ndarray:
    """All-pairs edge distance (edges sharing a joint are at distance 1; Floyd)."""
    n = len(edges)
    mat = np.full((n, n), 1_000_000, np.int64)
    np.fill_diagonal(mat, 0)
    for i, a in enumerate(edges):
        for j, b in enumerate(edges):
            if a[0] in b or a[1] in b:
                mat[i, j] = min(mat[i, j], 1)
    for k in range(n):
        mat = np.minimum(mat, mat[:, k : k + 1] + mat[k : k + 1, :])
    return mat


def find_neighbor(edges: Sequence[Tuple[int, int]], d: int) -> List[List[int]]:
    """Per-part neighbor lists within edge distance d, plus the appended "global
    part" (index len(edges)) that is mutually connected with edge 0's neighbors."""
    mat = calc_edge_mat(edges)
    n = len(edges)
    neighbors = [list(np.flatnonzero(mat[i] <= d)) for i in range(n)]
    global_neighbors = list(neighbors[0])
    for i in global_neighbors:
        neighbors[i].append(n)
    global_neighbors.append(n)
    neighbors.append(global_neighbors)
    return neighbors


def pool_edges(edges: Sequence[Tuple[int, int]], last_pool: bool
               ) -> Tuple[List[List[int]], List[Tuple[int, int]]]:
    """SkeletonPool's merge plan: walk degree-2 chains from the root, merge edge
    pairs (mean), keep the global part as its own pool; last_pool collapses each
    chain entirely."""
    edge_num = len(edges) + 1
    degree = np.zeros(max(max(max(e) for e in edges) + 2, 1), np.int64)
    for e in edges:
        degree[e[0]] += 1
        degree[e[1]] += 1

    seq_list: List[List[int]] = []

    def find_seq(j: int, seq: List[int]) -> None:
        if degree[j] > 2 and j != 0:
            seq_list.append(seq)
            seq = []
        if degree[j] == 1:
            seq_list.append(seq)
            return
        for idx, e in enumerate(edges):
            if e[0] == j:
                find_seq(e[1], seq + [idx])

    find_seq(0, [])
    pooling_list: List[List[int]] = []
    new_edges: List[Tuple[int, int]] = []
    for seq in seq_list:
        if last_pool:
            pooling_list.append(seq)
            continue
        if len(seq) % 2 == 1:
            pooling_list.append([seq[0]])
            new_edges.append(edges[seq[0]])
            seq = seq[1:]
        for i in range(0, len(seq), 2):
            pooling_list.append([seq[i], seq[i + 1]])
            new_edges.append((edges[seq[i]][0], edges[seq[i + 1]][1]))
    pooling_list.append([edge_num - 1])  # global part pools to itself
    return pooling_list, new_edges


@dataclass(eq=False)
class _LayerPlan:
    joint_num: int          # parts entering the conv
    in_per_joint: int
    out_per_joint: int
    mask: np.ndarray        # (out_ch, in_ch, k) skeleton-locality weight mask
    pool_weight: np.ndarray  # (pooled_ch, out_ch) mean-pool matrix


@dataclass(eq=False)
class AESKConvPlan:
    layers: List[_LayerPlan]
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1


def make_plan(parents: Sequence[int] = SMPLX_PARENTS, n_layers: int = 4,
              grow: Sequence[int] = (1, 1, 2, 1), channel_base: int = 6,
              skeleton_dist: int = 2) -> AESKConvPlan:
    """Precompute every topological constant of the LocalEncoder."""
    bases = [channel_base]
    for g in grow[:n_layers]:
        bases.append(bases[-1] * g)
    edges = build_edge_topology(parents)
    layers: List[_LayerPlan] = []
    in_channels = bases[0] * (len(edges) + 1)
    for i in range(n_layers):
        neighbors = find_neighbor(edges, skeleton_dist)
        joint_num = len(neighbors)
        cin, cout = bases[i], bases[i + 1]
        mask = np.zeros((cout * joint_num, cin * joint_num, 3), np.float32)
        for p, nb in enumerate(neighbors):
            cols = np.asarray([k * cin + c for k in nb for c in range(cin)])
            mask[p * cout : (p + 1) * cout, cols, :] = 1.0
        pooling_list, new_edges = pool_edges(edges, last_pool=(i == n_layers - 1))
        cpe = cout  # channels per part after the conv
        pool_w = np.zeros((len(pooling_list) * cpe, joint_num * cpe), np.float32)
        for r, pool in enumerate(pooling_list):
            for j in pool:
                for c in range(cpe):
                    pool_w[r * cpe + c, j * cpe + c] = 1.0 / len(pool)
        layers.append(_LayerPlan(joint_num, cin, cout, mask, pool_w))
        edges = new_edges
    return AESKConvPlan(layers, in_channels, layers[-1].pool_weight.shape[0])


def init_aeskconv_encoder(key, plan: AESKConvPlan) -> Dict:
    """Random init with the torch state-dict layout: layers.{i}.0.{weight,bias}
    (SkeletonConv is element 0 of each nn.Sequential; pool and activation carry no
    parameters)."""
    import jax

    params: Dict = {"layers": {}}
    keys = jax.random.split(key, len(plan.layers))
    for i, layer in enumerate(plan.layers):
        out_ch, in_ch, k = layer.mask.shape
        fan_in = layer.in_per_joint * max(len(np.flatnonzero(layer.mask[0, :, 0])), 1) * k
        bound = float(1.0 / np.sqrt(fan_in))
        kw, kb = jax.random.split(keys[i])
        w = jax.random.uniform(kw, (out_ch, in_ch, k), minval=-bound, maxval=bound)
        b = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound)
        params["layers"][str(i)] = {"0": {"weight": w * layer.mask, "bias": b}}
    return params


def aeskconv_encode(params: Dict, plan: AESKConvPlan, x):
    """(bs, t, 330) rot6d -> (bs, t // 2^L, 240) latent frames (LocalEncoder.forward:
    permute to channels-first, [SkeletonConv s2 -> SkeletonPool -> LeakyReLU(0.2)]*L,
    permute back)."""
    import jax
    import jax.numpy as jnp

    h = jnp.transpose(x, (0, 2, 1))
    for i, layer in enumerate(plan.layers):
        p = params["layers"][str(i)]["0"]
        w = jnp.asarray(p["weight"]) * jnp.asarray(layer.mask)
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(plan.stride,),
            padding=[(plan.padding, plan.padding)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        h = h + jnp.asarray(p["bias"])[None, :, None]
        h = jnp.einsum("pc,bct->bpt", jnp.asarray(layer.pool_weight), h)
        h = jnp.where(h >= 0, h, 0.2 * h)
    return jnp.transpose(h, (0, 2, 1))


class AESKConvEmbedder:
    """FGD feature extractor: windows (n, w, 330) -> features (n * w//16, 240)."""

    def __init__(self, params: Dict, plan: Optional[AESKConvPlan] = None):
        import jax

        self.plan = plan or make_plan()
        self.params = params
        self._encode = jax.jit(
            lambda p, x: aeskconv_encode(p, self.plan, x)
        )

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        lat = np.asarray(self._encode(self.params, jnp.asarray(windows, jnp.float32)))
        return lat.reshape(-1, lat.shape[-1])


def params_from_state_dict(state_dict: Dict[str, np.ndarray],
                           plan: Optional[AESKConvPlan] = None) -> Dict:
    """Map a VAESKConv torch state_dict to the encoder param tree. Accepts raw
    state dicts, {"model_state": sd} wrappers, and DDP "module." prefixes; only
    ``encoder.layers.{i}.0.{weight,bias}`` are consumed (FGD needs map2latent's
    encoder only — decoder/fc_mu/fc_logvar are ignored)."""
    plan = plan or make_plan()
    if "model_state" in state_dict and isinstance(state_dict["model_state"], dict):
        state_dict = state_dict["model_state"]
    clean = {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in state_dict.items()}
    params: Dict = {"layers": {}}
    for i, layer in enumerate(plan.layers):
        w = clean.get(f"encoder.layers.{i}.0.weight")
        b = clean.get(f"encoder.layers.{i}.0.bias")
        if w is None or b is None:
            raise KeyError(
                f"encoder.layers.{i}.0.weight/bias missing from state dict "
                f"(got keys like {sorted(clean)[:4]})"
            )
        w = np.asarray(w, np.float32)
        b = np.asarray(b, np.float32)
        if w.shape != layer.mask.shape:
            raise ValueError(
                f"layer {i} weight shape {w.shape} != expected {layer.mask.shape} — "
                "the checkpoint was trained on a different skeleton topology"
            )
        params["layers"][str(i)] = {"0": {"weight": w, "bias": b}}
    return params


def load_aeskconv(path: str) -> AESKConvEmbedder:
    """Import AESKConv_240_100.bin (torch pickle) and build the FGD embedder."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model_state" in raw:
        raw = raw["model_state"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in raw.items()}
    plan = make_plan()
    return AESKConvEmbedder(params_from_state_dict(sd, plan), plan)


__all__ = [
    "AESKConvEmbedder",
    "AESKConvPlan",
    "SMPLX_PARENTS",
    "aeskconv_encode",
    "build_edge_topology",
    "find_neighbor",
    "init_aeskconv_encoder",
    "load_aeskconv",
    "make_plan",
    "params_from_state_dict",
    "pool_edges",
]
