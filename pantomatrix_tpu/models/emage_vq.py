"""EMAGE motion tokenizers: per-part conv VQ-VAEs, the global-translation VAE, and the
composite part-split/decode wrapper.

Behavioral parity with /root/reference/models/emage_audio/modeling_emage_audio.py:
EmageVAEConv (:19-32), EmageVQVAEConv (:34-70, forward/map2index/map2latent/decode/
decode_from_latent), EmageVQModel (:72-205, spilt_inputs/map2index/map2latent/decode/
get_global_motion). Part widths: face 6+100=106, upper 13x6=78, hands 30x6=180,
lower 9x6+3+4=61 (:100-107).

TPU design: every part model is a stack of stride-1 conv1d + ResBlocks (length
preserving, per-frame codebook) — pure MXU work under jit. The codebook search is one
(N, D) x (D, K) matmul + argmin (nn/vq.py). All four parts decode concurrently inside a
single jit; XLA schedules them in parallel streams.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.integrate import velocity2position
from ..core.masking import (
    JOINT_MASK_HANDS,
    JOINT_MASK_LOWER,
    JOINT_MASK_UPPER,
    recover_from_mask_ts,
)
from ..core.rotations import axis_angle_to_rotation_6d, rotation_6d_to_axis_angle
from ..nn.blocks import init_vq_decoder, init_vq_encoder, vq_decoder, vq_encoder
from ..nn.layers import Params
from ..nn.vq import get_codebook_entry, init_quantizer, map2index, quantize
from .configs import EmageVAEConvConfig, EmageVQVAEConvConfig


# ---------------------------------------------------------------------------
# EmageVAEConv: plain conv encoder-decoder (global translation model)
# ---------------------------------------------------------------------------

def vae_forward(p: Params, cfg: EmageVAEConvConfig, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    latent = vq_encoder(p["encoder"], x, cfg.vae_layer)
    return {"rec_pose": vq_decoder(p["decoder"], latent, cfg.vae_layer)}


def init_emage_vae(key: jax.Array, cfg: EmageVAEConvConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_vq_encoder(k1, cfg.vae_test_dim, cfg.vae_length, cfg.vae_layer),
        "decoder": init_vq_decoder(k2, cfg.vae_test_dim, cfg.vae_length, cfg.vae_layer),
    }


# ---------------------------------------------------------------------------
# EmageVQVAEConv: encoder -> quantizer -> decoder
# ---------------------------------------------------------------------------

def vqvae_forward(p: Params, cfg: EmageVQVAEConvConfig, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    pre_latent = vq_encoder(p["encoder"], x, cfg.vae_layer)
    loss, z_q, idx, perplexity = quantize(p["quantizer"], pre_latent, cfg.vae_quantizer_lambda)
    rec = vq_decoder(p["decoder"], z_q, cfg.vae_layer)
    return {
        "poses_feat": z_q,
        "embedding_loss": loss,
        "perplexity": perplexity,
        "rec_pose": rec,
        # extra keys beyond the reference VQVAEConv.forward return (codebook
        # health diagnostics for the pretraining stage, train/steps.py)
        "indices": idx,
        "pre_latent": pre_latent,
    }


def vqvae_map2index(p: Params, cfg: EmageVQVAEConvConfig, x: jnp.ndarray) -> jnp.ndarray:
    return map2index(p["quantizer"], vq_encoder(p["encoder"], x, cfg.vae_layer))


def vqvae_map2latent(p: Params, cfg: EmageVQVAEConvConfig, x: jnp.ndarray) -> jnp.ndarray:
    idx = vqvae_map2index(p, cfg, x)
    return get_codebook_entry(p["quantizer"], idx)


def vqvae_decode_index(p: Params, cfg: EmageVQVAEConvConfig, indices: jnp.ndarray) -> jnp.ndarray:
    z_q = get_codebook_entry(p["quantizer"], indices)
    return vq_decoder(p["decoder"], z_q, cfg.vae_layer)


def vqvae_decode_latent(p: Params, cfg: EmageVQVAEConvConfig, latent: jnp.ndarray) -> jnp.ndarray:
    """Re-quantize a continuous latent to its nearest codes, then decode
    (modeling_emage_audio.py:61-70). Uses the fused Pallas codebook search on TPU
    (ops/vq_pallas.py; identical indices to the jnp expansion)."""
    from ..ops.vq_pallas import nearest_code_fast

    idx = nearest_code_fast(latent, p["quantizer"]["embedding"]["weight"])
    return vqvae_decode_index(p, cfg, idx)


def init_emage_vqvae(key: jax.Array, cfg: EmageVQVAEConvConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": init_vq_encoder(k1, cfg.vae_test_dim, cfg.vae_length, cfg.vae_layer),
        "quantizer": init_quantizer(k2, cfg.vae_codebook_size, cfg.vae_length),
        "decoder": init_vq_decoder(k3, cfg.vae_test_dim, cfg.vae_length, cfg.vae_layer),
    }


# ---------------------------------------------------------------------------
# Composite wrapper over the 5 part models
# ---------------------------------------------------------------------------

@dataclass(eq=False)
class EmageVQSuite:
    """The five frozen tokenizer models EMAGE composes (test_emage_audio.py:82-91).

    Registered as a jax pytree: params are children (traced), configs are static aux
    data — an EmageVQSuite passes straight through ``jit`` boundaries.
    """

    face: Tuple[Params, EmageVQVAEConvConfig]
    upper: Tuple[Params, EmageVQVAEConvConfig]
    hands: Tuple[Params, EmageVQVAEConvConfig]
    lower: Tuple[Params, EmageVQVAEConvConfig]
    global_motion: Tuple[Params, EmageVAEConvConfig]


jax.tree_util.register_pytree_node(
    EmageVQSuite,
    lambda s: (
        (s.face[0], s.upper[0], s.hands[0], s.lower[0], s.global_motion[0]),
        (s.face[1], s.upper[1], s.hands[1], s.lower[1], s.global_motion[1]),
    ),
    lambda aux, children: EmageVQSuite(
        face=(children[0], aux[0]),
        upper=(children[1], aux[1]),
        hands=(children[2], aux[2]),
        lower=(children[3], aux[3]),
        global_motion=(children[4], aux[4]),
    ),
)


def init_vq_suite(key: jax.Array) -> EmageVQSuite:
    """Random-init suite with the reference part widths."""
    ks = jax.random.split(key, 5)
    mk = lambda k, dim, layer=2: (
        init_emage_vqvae(k, EmageVQVAEConvConfig(vae_test_dim=dim, vae_layer=layer)),
        EmageVQVAEConvConfig(vae_test_dim=dim, vae_layer=layer),
    )
    g_cfg = EmageVAEConvConfig()
    return EmageVQSuite(
        face=mk(ks[0], 106),
        upper=mk(ks[1], 78),
        hands=mk(ks[2], 180),
        lower=mk(ks[3], 61),
        global_motion=(init_emage_vae(ks[4], g_cfg), g_cfg),
    )


def vq_split_inputs(
    smplx_body_rot6d: jnp.ndarray,
    expression: jnp.ndarray,
    tar_contact: Optional[jnp.ndarray] = None,
    tar_trans: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """(bs, t, 330) rot6d + (bs, t, 100) expression -> part streams
    (modeling_emage_audio.py:97-108)."""
    bs, t, j6 = smplx_body_rot6d.shape
    r = smplx_body_rot6d.reshape(bs, t, j6 // 6, 6)
    jaw = r[:, :, 22:23].reshape(bs, t, 6)
    face = jnp.concatenate([jaw, expression], axis=2)
    upper_idx = np.nonzero(np.asarray(JOINT_MASK_UPPER))[0]
    lower_idx = np.nonzero(np.asarray(JOINT_MASK_LOWER))[0]
    upper = r[:, :, upper_idx].reshape(bs, t, 78)
    hands = r[:, :, 25:55].reshape(bs, t, 180)
    lower_rot = r[:, :, lower_idx].reshape(bs, t, 54)
    if tar_contact is None:
        tar_contact = jnp.zeros((bs, t, 4), smplx_body_rot6d.dtype)
    if tar_trans is None:
        tar_trans = jnp.zeros((bs, t, 3), smplx_body_rot6d.dtype)
    lower = jnp.concatenate([lower_rot, tar_trans, tar_contact], axis=2)
    return {"face": face, "upper": upper, "hands": hands, "lower": lower}


def vq_map2index(suite: EmageVQSuite, rot6d, expression, tar_contact=None, tar_trans=None):
    x = vq_split_inputs(rot6d, expression, tar_contact, tar_trans)
    return {
        part: vqvae_map2index(*getattr(suite, part), x[part])
        for part in ("face", "upper", "hands", "lower")
    }


def vq_map2latent(suite: EmageVQSuite, rot6d, expression, tar_contact=None, tar_trans=None):
    x = vq_split_inputs(rot6d, expression, tar_contact, tar_trans)
    return {
        part: vqvae_map2latent(*getattr(suite, part), x[part])
        for part in ("face", "upper", "hands", "lower")
    }


def vq_get_global_motion(
    suite: EmageVQSuite, lower_body: jnp.ndarray, ref_trans: jnp.ndarray
) -> jnp.ndarray:
    """Global VAE -> velocity channels [54:57] -> integrate x/z, y direct
    (modeling_emage_audio.py:195-205)."""
    p, cfg = suite.global_motion
    rec = vae_forward(p, cfg, lower_body)["rec_pose"]
    vel = rec[:, :, 54:57]
    if ref_trans.ndim == 2:
        ref_trans = jnp.broadcast_to(ref_trans[None], (vel.shape[0],) + ref_trans.shape)
    x = velocity2position(vel[:, :, 0:1], 1.0 / 30, ref_trans[:, 0, 0:1])
    z = velocity2position(vel[:, :, 2:3], 1.0 / 30, ref_trans[:, 0, 2:3])
    y = vel[:, :, 1:2]
    return jnp.concatenate([x, y, z], axis=-1)


def vq_decode(
    suite: EmageVQSuite,
    face_index=None,
    upper_index=None,
    hands_index=None,
    lower_index=None,
    face_latent=None,
    upper_latent=None,
    hands_latent=None,
    lower_latent=None,
    get_global_motion: bool = False,
    ref_trans: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Decode any mix of code indices / continuous latents back to a full-body
    165-d axis-angle stream + expression (+ optional global translation)
    (modeling_emage_audio.py:126-193)."""
    for t_in in (face_index, upper_index, hands_index, lower_index,
                 face_latent, upper_latent, hands_latent, lower_latent):
        if t_in is not None:
            bs, t = t_in.shape[:2]
            dtype = jnp.float32
            break
    else:
        raise ValueError("vq_decode needs at least one index/latent input")

    if face_index is not None:
        face_mix = vqvae_decode_index(*suite.face, face_index)
    elif face_latent is not None:
        face_mix = vqvae_decode_latent(*suite.face, face_latent)
    else:
        face_mix = None
    if face_mix is not None:
        face_jaw = rotation_6d_to_axis_angle(face_mix[:, :, :6])
        expression = face_mix[:, :, 6:]
    else:
        face_jaw = jnp.zeros((bs, t, 3), dtype)
        expression = jnp.zeros((bs, t, 100), dtype)

    def _part(index, latent, model, n_joints):
        if index is not None:
            six_d = vqvae_decode_index(*model, index)
        elif latent is not None:
            six_d = vqvae_decode_latent(*model, latent)
        else:
            return None
        return six_d

    upper_6d = _part(upper_index, upper_latent, suite.upper, 13)
    hands_6d = _part(hands_index, hands_latent, suite.hands, 30)
    lower_mix = _part(lower_index, lower_latent, suite.lower, 9)

    if upper_6d is not None:
        upper = rotation_6d_to_axis_angle(upper_6d.reshape(bs, t, -1, 6)).reshape(bs, t, -1)
    else:
        upper = jnp.zeros((bs, t, 39), dtype)
    if hands_6d is not None:
        hands = rotation_6d_to_axis_angle(hands_6d.reshape(bs, t, -1, 6)).reshape(bs, t, -1)
    else:
        hands = jnp.zeros((bs, t, 90), dtype)
    if lower_mix is not None:
        lower_6d, transfoot = lower_mix[:, :, :-7], lower_mix[:, :, -7:]
        lower = rotation_6d_to_axis_angle(lower_6d.reshape(bs, t, -1, 6)).reshape(bs, t, -1)
    else:
        lower = jnp.zeros((bs, t, 27), dtype)
        transfoot = jnp.zeros((bs, t, 7), dtype)
        lower_mix = jnp.concatenate(
            [jnp.tile(jnp.asarray([1., 0., 0., 0., 1., 0.], dtype), (bs, t, 9)), transfoot],
            axis=-1,
        )

    upper2all = recover_from_mask_ts(upper, JOINT_MASK_UPPER)
    hands2all = recover_from_mask_ts(hands, JOINT_MASK_HANDS)
    lower2all = recover_from_mask_ts(lower, JOINT_MASK_LOWER)
    all_aa = upper2all + hands2all + lower2all
    all_aa = all_aa.at[:, :, 66:69].set(face_jaw)
    all_rot6d = axis_angle_to_rotation_6d(all_aa.reshape(bs, t, 55, 3)).reshape(bs, t, 330)
    all_motion4inference = jnp.concatenate([all_rot6d, transfoot], axis=2)  # 337

    global_motion = None
    if get_global_motion:
        global_motion = vq_get_global_motion(suite, lower_mix, ref_trans)
    return {
        "expression": expression,
        "all_motion4inference": all_motion4inference,
        "motion_axis_angle": all_aa,
        "trans": global_motion,
    }


__all__ = [
    "EmageVQSuite",
    "init_emage_vae",
    "init_emage_vqvae",
    "init_vq_suite",
    "vae_forward",
    "vq_decode",
    "vq_get_global_motion",
    "vq_map2index",
    "vq_map2latent",
    "vq_split_inputs",
    "vqvae_decode_index",
    "vqvae_decode_latent",
    "vqvae_forward",
    "vqvae_map2index",
    "vqvae_map2latent",
]
