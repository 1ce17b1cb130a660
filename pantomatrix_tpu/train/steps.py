"""Jittable, mesh-sharded train steps for the three model families.

TPU-native replacement for the reference DDP trainers' inner loops
(/root/reference/train_emage_audio.py:130-204, train_camn_audio.py:91-124,
train_disco_audio.py:129-182): each step is a pure function
(params, opt_state, batch, rng, iteration) -> (params, opt_state, metrics), sharded
over a Mesh("data") so that

- the batch axis is sharded across devices (DistributedSampler parity),
- gradients equal the global-batch gradient (DDP all-reduce parity): in the default
  pjit mode the loss is a global mean and GSPMD inserts the reductions; in shard_map
  mode they are explicit ``pmean``s,
- BatchNorm batch stats are global-batch stats (SyncBatchNorm parity,
  train_emage_audio.py:248): automatic under pjit, explicit ``pmean`` under shard_map.

Param trees keep the full torch state_dict layout (weights + BN buffers); the step
partitions them into trainable leaves and BN buffers internally, so checkpoints stay
import/export-compatible.

Documented reference-bug policy (SURVEY.md §7):
- grad clip before backward (= no clipping) -> see train/optim.py clip_parity;
- EMAGE mask-ratio schedule ``(iter/135*400)*0.95+0.05`` saturates >1 within the first
  iteration (everything masked). ``mask_schedule="reference"`` keeps it;
  ``"corrected"`` uses iter/(135*400), capped at 1.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.rotations import axis_angle_to_rotation_6d, rotation_6d_to_matrix
from ..models.camn import camn_forward
from ..models.configs import CamnAudioConfig, DiscoAudioConfig, EmageAudioConfig
from ..models.disco import disco_forward
from ..models.emage import emage_forward
from ..models.emage_vq import EmageVQSuite, vq_map2index, vq_map2latent
from ..nn.layers import Ctx, apply_bn_updates
from .losses import cls_loss, contrastive_loss, geodesic_loss, rec_loss

BN_BUFFER_KEYS = ("running_mean", "running_var", "num_batches_tracked")


def partition_params(params) -> Tuple[Dict, Dict]:
    """Split a torch-layout param tree into (trainable, bn_buffers) by leaf name."""
    trainable: Dict = {}
    buffers: Dict = {}

    def walk(src, t_dst, b_dst):
        for k, v in src.items():
            if isinstance(v, dict):
                t_sub, b_sub = {}, {}
                walk(v, t_sub, b_sub)
                if t_sub:
                    t_dst[k] = t_sub
                if b_sub:
                    b_dst[k] = b_sub
            elif k in BN_BUFFER_KEYS:
                b_dst[k] = v
            else:
                t_dst[k] = v

    walk(params, trainable, buffers)
    return trainable, buffers


def combine_params(trainable, buffers):
    """Inverse of partition_params."""
    out: Dict = {}

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    merge(out, trainable)
    merge(out, buffers)
    return out


def mask_ratio_schedule(iteration, mode: str = "reference"):
    """EMAGE random-mask ratio (train_emage_audio.py:163)."""
    if mode == "reference":
        return (iteration / 135 * 400) * 0.95 + 0.05
    if mode == "corrected":
        return jnp.minimum(iteration / (135 * 400) * 0.95 + 0.05, 1.0)
    raise ValueError(mode)


def _train_ctx(rng, axis_name):
    return Ctx(train=True, rng=rng, axis_name=axis_name, bn_updates={})


def _cast_mode(compute_dtype):
    """Validate/normalize a training compute dtype: None (f32 parity) or bf16."""
    if compute_dtype in (None, "float32"):
        return None
    if compute_dtype == "bfloat16":
        return jnp.bfloat16
    raise ValueError(f"unsupported compute_dtype {compute_dtype!r} "
                     "(float32|bfloat16)")


def _cast_inputs(dt, *trees):
    """Cast float leaves of each tree to the compute dtype (no-op when dt None).

    Used INSIDE loss functions, so autodiff flows cotangents back through the
    cast: master params stay float32, the network runs in bf16, and grads
    arrive float32 (standard mixed-precision). Reductions (LayerNorm/softmax/
    BN batch stats/velocity integration) stay float32 inside the primitives
    (utils/precision.py), and BN running-stat updates are emitted float32
    (nn/layers.py), so only elementwise storage precision drops.
    """
    if dt is None:
        return trees if len(trees) > 1 else trees[0]
    from ..utils.precision import cast_floating

    out = tuple(cast_floating(t, dt) for t in trees)
    return out if len(out) > 1 else out[0]


def _to_f32(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _leaf_at(params, path):
    node = params
    for key in path:
        node = node[key]
    return node


def _amplify_bn_updates(params, updates, k: int, momentum: float = 0.1):
    """Turn one same-batch BN running-stat update into the state after ``k``
    identical updates: r_k = r_0 + (r_1 - r_0) * (1 - (1-m)^k) / m.

    The reference's k-pass objective re-runs the audio encoders on IDENTICAL input
    every pass, so their batch stats are identical and the k sequential lerps
    collapse to this closed form — computing the encoder once reproduces the
    reference's exact buffer trajectory (momentum 0.1 = nn/layers.py
    batch_norm1d default, the torch default the reference uses)."""
    factor = (1.0 - (1.0 - momentum) ** k) / momentum
    out = {}
    for path, u in updates.items():
        p0 = _leaf_at(params, path)
        out[path] = {
            "running_mean": p0["running_mean"]
            + factor * (u["running_mean"] - p0["running_mean"]),
            "running_var": p0["running_var"]
            + factor * (u["running_var"] - p0["running_var"]),
            "num_batches_tracked": u["num_batches_tracked"] + (k - 1),
        }
    return out


def make_emage_train_step(
    cfg: EmageAudioConfig,
    suite: EmageVQSuite,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    mask_schedule: str = "reference",
    spmd: str = "pjit",
    param_placement: str = "replicated",
    gradient_checkpointing: bool = False,
    share_audio_encoder: bool = True,
    compute_dtype: Optional[str] = None,
) -> Callable:
    """EMAGE 3-pass masked objective against frozen VQ targets
    (train_emage_audio.py:130-183). ``gradient_checkpointing`` remats each forward
    pass (solver.gradient_checkpointing parity) — trades ~1/3 more FLOPs for
    activation memory, raising the max batch per chip.

    compute_dtype="bfloat16" (solver.compute_dtype) runs the audio-model forward/
    backward in bf16 with f32 master params, f32 losses, f32 VQ targets (the
    frozen suite stays f32), and f32 reductions — see ``_cast_inputs``. Loss
    trajectory equivalence vs f32 is bounded in tests/test_train_steps.py.

    share_audio_encoder: run the two WavEncoders ONCE per step instead of once per
    pass. Their input (raw audio) is identical in all three passes — even pass 3's
    use_audio=False still runs them in the reference (only the body cross-attn
    output is zeroed, modeling_emage_audio.py:308-310) — so the shared features +
    summed cotangents equal the reference's per-pass recompute exactly, and the BN
    running stats follow the reference's 3-update trajectory via the closed form
    in ``_amplify_bn_updates`` (equivalence test: tests/test_train_steps.py)."""

    ctx_axis = axis_name if spmd == "shard_map" else None
    cdt = _cast_mode(compute_dtype)

    def _fwd_with_bn(params, audio, speaker_id, masked_motion, mask, use_audio, rng,
                     audio_features=None):
        # returns BN updates as outputs (a side-channel dict would leak tracers out
        # of the remat scope when gradient_checkpointing is on)
        ctx = _train_ctx(rng, ctx_axis)
        out = emage_forward(params, cfg, audio, speaker_id, masked_motion, mask,
                            use_audio, ctx, audio_features=audio_features)
        return out, ctx.bn_updates

    fwd = (
        jax.checkpoint(_fwd_with_bn, static_argnums=(5,))
        if gradient_checkpointing
        else _fwd_with_bn
    )

    def loss_fn(trainable, buffers, batch, rng, iteration):
        motion_gt = batch["motion"]  # (bs, t, 165) axis-angle
        bs, t, jc = motion_gt.shape
        j = jc // 3
        rot6d = axis_angle_to_rotation_6d(motion_gt.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        speaker_id = jnp.zeros((bs, 1), jnp.int32)

        # targets stay float32: rot6d conversion and the frozen VQ suite
        target_idx = vq_map2index(suite, rot6d, batch["expressions"],
                                  batch["foot_contact"], batch["trans"])
        target_lat = vq_map2latent(suite, rot6d, batch["expressions"],
                                   batch["foot_contact"], batch["trans"])
        target_idx = jax.tree_util.tree_map(jax.lax.stop_gradient, target_idx)
        target_lat = jax.tree_util.tree_map(jax.lax.stop_gradient, target_lat)

        masked_motion = jnp.concatenate(
            [rot6d, batch["trans"], batch["foot_contact"]], axis=-1
        )  # (bs, t, 337)

        # compute-dtype boundary: network inputs + trainable leaves cast here
        # (inside the differentiated function, so grads come back float32)
        params = combine_params(_cast_inputs(cdt, trainable), buffers)
        audio_in, masked_motion = _cast_inputs(cdt, batch["audio"], masked_motion)

        r_mask, r_drop = jax.random.split(rng)
        w = dict(lu=cfg.lu, ll=cfg.ll, lh=cfg.lh, lf=cfg.lf)
        c = dict(cu=cfg.cu, cl=cfg.cl, ch=cfg.ch, cf=cfg.cf)
        losses = {}

        audio_features = None
        bn_audio = None
        if share_audio_encoder:
            from ..nn.blocks import wav_encoder

            actx = _train_ctx(jax.random.fold_in(r_drop, 0), ctx_axis)
            audio_features = (
                wav_encoder(params["audio_encoder_face"], audio_in,
                            cfg.audio_f, "emage", actx, ("audio_encoder_face",)),
                wav_encoder(params["audio_encoder_body"], audio_in,
                            cfg.audio_f, "emage", actx, ("audio_encoder_body",)),
            )
            bn_audio = _amplify_bn_updates(combine_params(trainable, buffers),
                                           actx.bn_updates, 3)

        # pass 1: seed mask (first seed_frames unmasked), audio on
        mask1 = jnp.ones_like(masked_motion).at[:, : cfg.seed_frames].set(0.0)
        pred1, bn1 = fwd(params, audio_in, speaker_id, masked_motion, mask1,
                         True, jax.random.fold_in(r_drop, 1), audio_features)
        pred1 = _to_f32(pred1)
        losses["rec_seed"] = rec_loss(pred1, target_lat, **w)
        losses["cls_seed"] = cls_loss(pred1, target_idx, **c)

        # pass 2: random element mask, audio on (BN running stats thread pass->pass;
        # normalization uses batch stats so outputs are unaffected)
        ratio = mask_ratio_schedule(iteration, mask_schedule)
        mask2 = (jax.random.uniform(r_mask, masked_motion.shape) < ratio).astype(
            masked_motion.dtype
        )
        params2 = apply_bn_updates(params, bn1)
        pred2, bn2 = fwd(params2, audio_in, speaker_id, masked_motion, mask2,
                         True, jax.random.fold_in(r_drop, 2), audio_features)
        pred2 = _to_f32(pred2)
        losses["rec_audio"] = rec_loss(pred2, target_lat, **w)
        losses["cls_audio"] = cls_loss(pred2, target_idx, **c)

        # pass 3: same mask, audio off
        params3 = apply_bn_updates(params2, bn2)
        pred3, bn3 = fwd(params3, audio_in, speaker_id, masked_motion, mask2,
                         False, jax.random.fold_in(r_drop, 3), audio_features)
        pred3 = _to_f32(pred3)
        losses["rec_mask"] = rec_loss(pred3, target_lat, **w)
        losses["cls_mask"] = cls_loss(pred3, target_idx, **c)

        all_loss = sum(losses.values())
        losses["all"] = all_loss
        final = apply_bn_updates(params3, bn3)
        if bn_audio is not None:
            final = apply_bn_updates(final, bn_audio)
        # BN updates are emitted float32 (nn/layers.py); keep master buffers f32
        _, new_buffers = partition_params(final)
        return all_loss, (losses, _to_f32(new_buffers))

    return _make_step(loss_fn, optimizer, mesh, axis_name, with_iteration=True, spmd=spmd,
                      param_placement=param_placement)


def make_camn_train_step(
    cfg: CamnAudioConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    spmd: str = "pjit",
    param_placement: str = "replicated",
    compute_dtype: Optional[str] = None,
) -> Callable:
    """CaMN geodesic objective (train_camn_audio.py:91-116). compute_dtype: see
    make_emage_train_step (rotation math + geodesic loss stay float32)."""

    ctx_axis = axis_name if spmd == "shard_map" else None
    cdt = _cast_mode(compute_dtype)

    def loss_fn(trainable, buffers, batch, rng):
        motion_gt = batch["motion"]
        bs, t, jc = motion_gt.shape
        j = jc // 3
        rot6d = axis_angle_to_rotation_6d(motion_gt.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        speaker_id = jnp.zeros((bs, 1), jnp.int32)
        ctx = _train_ctx(rng, ctx_axis)
        params = combine_params(_cast_inputs(cdt, trainable), buffers)
        audio_in, seed_in = _cast_inputs(cdt, batch["audio"], rot6d)
        pred = camn_forward(params, cfg, audio_in, speaker_id, cfg.seed_frames,
                            seed_motion=seed_in, return_axis_angle=False, ctx=ctx)
        m_pred = rotation_6d_to_matrix(
            pred["motion"].astype(jnp.float32).reshape(bs, t, j, 6))
        m_gt = rotation_6d_to_matrix(rot6d.reshape(bs, t, j, 6))
        loss = geodesic_loss(m_pred, m_gt)
        _, new_buffers = partition_params(apply_bn_updates(params, ctx.bn_updates))
        return loss, ({"loss": loss, "all_loss": loss}, _to_f32(new_buffers))

    return _make_step(loss_fn, optimizer, mesh, axis_name, with_iteration=False, spmd=spmd,
                      param_placement=param_placement)


def make_disco_train_step(
    cfg: DiscoAudioConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    spmd: str = "pjit",
    param_placement: str = "replicated",
    compute_dtype: Optional[str] = None,
) -> Callable:
    """DisCo geodesic + rhythm/content contrastive disentanglement
    (train_disco_audio.py:129-170). Features are L2-normalized along TIME (dim=1),
    reproducing the reference's F.normalize(fea, dim=1). compute_dtype: see
    make_emage_train_step (rotation/contrastive math stays float32).

    Note on DP semantics: the contrastive loss is all-pairs within a batch. Under
    spmd="shard_map" each shard contrasts only its local batch — exactly what the
    reference's DDP does. Under the default pjit mode pairs span the GLOBAL batch
    (more negatives; a strict superset of the reference objective)."""

    ctx_axis = axis_name if spmd == "shard_map" else None
    cdt = _cast_mode(compute_dtype)

    def loss_fn(trainable, buffers, batch, rng):
        motion_gt = batch["motion"]
        bs, t, jc = motion_gt.shape
        j = jc // 3
        rot6d = axis_angle_to_rotation_6d(motion_gt.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        speaker_id = jnp.zeros((bs, 1), jnp.int32)
        ctx = _train_ctx(rng, ctx_axis)
        params = combine_params(_cast_inputs(cdt, trainable), buffers)
        audio_in, seed_in = _cast_inputs(cdt, batch["audio"], rot6d)
        pred = disco_forward(params, cfg, audio_in, speaker_id, cfg.seed_frames,
                             seed_motion=seed_in, return_axis_angle=False, ctx=ctx)
        m_pred = rotation_6d_to_matrix(
            pred["motion"].astype(jnp.float32).reshape(bs, t, j, 6))
        m_gt = rotation_6d_to_matrix(rot6d.reshape(bs, t, j, 6))
        losses = {"loss": geodesic_loss(m_pred, m_gt)}

        normalize_t = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        losses["rhythm"] = contrastive_loss(
            normalize_t(pred["audio_fea_r"].astype(jnp.float32)),
            batch["rhythm_label"]
        )
        losses["content"] = contrastive_loss(
            normalize_t(pred["audio_fea_c"].astype(jnp.float32)),
            batch["content_label"]
        )
        all_loss = sum(losses.values())
        losses["all_loss"] = all_loss
        _, new_buffers = partition_params(apply_bn_updates(params, ctx.bn_updates))
        return all_loss, (losses, _to_f32(new_buffers))

    return _make_step(loss_fn, optimizer, mesh, axis_name, with_iteration=False, spmd=spmd,
                      param_placement=param_placement)


def vq_global_vae_target(lower_stream: jnp.ndarray) -> jnp.ndarray:
    """Training target for the global-translation VAE.

    The pretrained upstream VAE maps a 61-d lower stream (54 rot6d + 3 absolute
    trans + 4 contact) to a 61-d reconstruction whose channels [54:57] the
    composite decode interprets as (x-VELOCITY, y-height, z-VELOCITY)
    (/root/reference/models/emage_audio/modeling_emage_audio.py:195-205, the
    velocity2position integration). The PantoMatrix snapshot ships no trainer for
    it (the checkpoint comes from the hub), so this stage defines the target the
    inference contract implies: identical stream with the trans slots replaced by
    the forward-difference velocity that velocity2position inverts exactly —
    v[t] = (pos[t+1] - pos[t]) * fps, last frame repeated (its velocity is never
    integrated). tests/test_train_steps.py pins the round trip
    velocity2position(target_v) == abs_trans.
    """
    pos = lower_stream[:, :, 54:57]
    vel = (pos[:, 1:] - pos[:, :-1]) * 30.0
    vel = jnp.concatenate([vel, vel[:, -1:]], axis=1)
    y = pos[:, :, 1:2]
    v_xz = jnp.concatenate([vel[:, :, 0:1], y, vel[:, :, 2:3]], axis=2)
    return jnp.concatenate([lower_stream[:, :, :54], v_xz,
                            lower_stream[:, :, 57:]], axis=2)


def make_vq_train_step(
    suite: EmageVQSuite,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    param_placement: str = "replicated",
    compute_dtype: Optional[str] = None,
    vel_weight: float = 1.0,
    restart_dead_codes: bool = False,
    restart_decay: float = 0.99,
    restart_thresh: float = 0.03,
) -> Callable:
    """Pretrain the five EMAGE motion tokenizers jointly in ONE device program.

    The reference repo USES five frozen pretrained VQ/VAE models
    (/root/reference/train_emage_audio.py:230-241) but ships no trainer for them
    (they download from the hub, test_emage_audio.py:82-93) — without this stage an
    offline full-budget EMAGE run can only train against random tokenizers, whose
    decode is noise regardless of how well the audio model predicts their codes
    (the round-4 flat-val-FGD failure). Objective per part VQ-VAE: reconstruction
    MSE on the part stream + first-difference velocity MSE (weight ``vel_weight``)
    + the Quantizer's codebook/commitment loss (nn/vq.py, straight-through). The
    global VAE trains on the velocity-target stream (vq_global_vae_target).

    The five models are independent; summing their losses into one jit gives XLA
    five parallel subgraphs per step — one dispatch, one optimizer, one params
    tree {"face","upper","hands","lower","global_motion"}.

    restart_dead_codes=True returns a step whose state argument is
    ``(opt_state, usage)`` where ``usage`` is ``{part: (K,) f32}`` EMA of the
    per-code selection frequency (decay ``restart_decay``), built with
    ``vq_usage_init(suite)``. After each optimizer update, codes whose EMA
    usage fell below ``restart_thresh / K`` are re-seeded from random encoder
    outputs of the current batch (the standard dead-code restart; the reference
    ships no tokenizer trainer so there is no parity surface here — measured on
    the synthetic corpus, the U(-1/K,1/K) init collapses upper/hands/lower to
    1-5 live codes of 256 and data-init alone still loses face/hands to drift).
    Restarted codes get a fresh grace window (usage reset to 1/K ~= 350 steps
    at decay 0.99). Everything stays inside the one jitted device program, so
    ``make_multi_step`` fusion keeps working.
    """
    from ..models.emage_vq import vae_forward, vq_split_inputs, vqvae_forward

    cdt = _cast_mode(compute_dtype)
    cfgs = {part: getattr(suite, part)[1]
            for part in ("face", "upper", "hands", "lower", "global_motion")}

    def loss_fn(trainable, buffers, batch, rng):
        del rng
        motion_gt = batch["motion"]
        bs, t, jc = motion_gt.shape
        j = jc // 3
        rot6d = axis_angle_to_rotation_6d(
            motion_gt.reshape(bs, t, j, 3)).reshape(bs, t, j * 6)
        streams = vq_split_inputs(rot6d, batch["expressions"],
                                  batch["foot_contact"], batch["trans"])
        params = combine_params(_cast_inputs(cdt, trainable), buffers)
        losses: Dict[str, jnp.ndarray] = {}

        def rec_terms(rec, target, name):
            rec = rec.astype(jnp.float32)
            r = jnp.mean((rec - target) ** 2)
            v = jnp.mean(((rec[:, 1:] - rec[:, :-1])
                          - (target[:, 1:] - target[:, :-1])) ** 2)
            losses[f"rec_{name}"] = r
            losses[f"vel_{name}"] = v
            return r + vel_weight * v

        total = jnp.zeros((), jnp.float32)
        for part in ("face", "upper", "hands", "lower"):
            x = streams[part]
            x_in = _cast_inputs(cdt, x)
            out = vqvae_forward(params[part], cfgs[part], x_in)
            emb = out["embedding_loss"].astype(jnp.float32)
            losses[f"emb_{part}"] = emb
            losses[f"ppl_{part}"] = out["perplexity"].astype(jnp.float32)
            total = total + rec_terms(out["rec_pose"], x, part) + emb
            if restart_dead_codes:
                # non-scalar aux consumed (and popped) by the restart wrapper
                # below — never leaves the device program
                z = jax.lax.stop_gradient(out["pre_latent"]).astype(jnp.float32)
                losses[f"_counts_{part}"] = jnp.sum(jax.nn.one_hot(
                    out["indices"].reshape(-1), cfgs[part].vae_codebook_size,
                    dtype=jnp.float32), axis=0)
                losses[f"_zpool_{part}"] = z.reshape(-1, z.shape[-1])
        g_target = vq_global_vae_target(streams["lower"])
        g_in = _cast_inputs(cdt, streams["lower"])
        g_rec = vae_forward(params["global_motion"], cfgs["global_motion"], g_in)
        total = total + rec_terms(g_rec["rec_pose"], g_target, "global")
        losses["all_loss"] = total
        # VQ encoders/decoders are BN-free (conv + LeakyReLU ResBlocks); buffers
        # pass through unchanged so the step keeps the shared plumbing's contract
        return total, (losses, buffers)

    base = _make_step(loss_fn, optimizer, mesh, axis_name, with_iteration=False,
                      spmd="pjit", param_placement=param_placement)
    if not restart_dead_codes:
        return base

    parts4 = ("face", "upper", "hands", "lower")
    sizes = {part: int(cfgs[part].vae_codebook_size) for part in parts4}
    raw = base.raw

    def step(params, state, batch, rng, iteration):
        opt_state, usage = state
        params, opt_state, losses = raw(params, opt_state, batch, rng, iteration)
        new_usage = {}
        for i, part in enumerate(parts4):
            counts = losses.pop(f"_counts_{part}")
            zpool = losses.pop(f"_zpool_{part}")
            k = sizes[part]
            frac = counts / jnp.maximum(jnp.sum(counts), 1.0)
            u = restart_decay * usage[part] + (1.0 - restart_decay) * frac
            dead = u < (restart_thresh / k)
            pick = jax.random.randint(jax.random.fold_in(rng, i), (k,), 0,
                                      zpool.shape[0])
            emb = params[part]["quantizer"]["embedding"]["weight"]
            cand = zpool[pick].astype(emb.dtype)
            params[part]["quantizer"]["embedding"]["weight"] = jnp.where(
                dead[:, None], cand, emb)
            new_usage[part] = jnp.where(dead, 1.0 / k, u)
            losses[f"restarted_{part}"] = jnp.sum(dead.astype(jnp.float32))
        return params, (opt_state, new_usage), losses

    replicated = NamedSharding(base.mesh, P())
    sharded = NamedSharding(base.mesh, P(axis_name))
    state_in = None if param_placement == "inherit" else replicated
    jitted = jax.jit(
        step,
        in_shardings=(state_in, state_in, sharded, replicated, replicated),
        out_shardings=(state_in, state_in, replicated),
        donate_argnums=(0, 1),
    )
    jitted.raw = step
    jitted.mesh, jitted.axis_name = base.mesh, axis_name
    jitted.param_placement = param_placement
    return jitted


def vq_usage_init(suite: EmageVQSuite) -> Dict[str, jnp.ndarray]:
    """Initial per-code usage EMA for make_vq_train_step(restart_dead_codes=True):
    1/K everywhere, i.e. every code starts with a full grace window before it can
    be declared dead (~350 steps at the default decay 0.99/threshold 0.03)."""
    return {
        part: jnp.full((int(getattr(suite, part)[1].vae_codebook_size),),
                       1.0 / int(getattr(suite, part)[1].vae_codebook_size),
                       jnp.float32)
        for part in ("face", "upper", "hands", "lower")
    }


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------

def _make_step(loss_fn, optimizer, mesh: Optional[Mesh], axis_name: str,
               with_iteration: bool, spmd: str = "pjit",
               param_placement: str = "replicated"):
    """Wrap a loss into a sharded update step.

    spmd="pjit" (default): plain jit with GSPMD sharding constraints — batch sharded
    over the data axis, params/opt replicated. Mathematically identical to DDP: the
    global-mean loss yields the pmean'd gradient, and BatchNorm's batch stats are
    computed over the GLOBAL batch (SyncBatchNorm parity) because GSPMD reduces across
    shards automatically. This is also much faster per call than shard_map on
    platforms where shard_map pays per-array dispatch overhead (see CLAUDE.md).

    spmd="shard_map": explicit per-shard program with lax.pmean for grads/losses and
    per-shard rng folds — kept for explicit-collective workflows.

    param_placement (pjit path only):
    - "replicated" (default, DDP parity): params/opt_state forced replicated.
    - "inherit" (FSDP/ZeRO-3 over a ("data", "model") mesh): params/opt_state
      keep the sharding the CALLER placed them with (train/mesh.py
      shard_tree_fsdp shards the largest divisible dim of every leaf over the
      model axis); GSPMD all-gathers weights at use and reduce-scatters
      gradients, so per-device param+opt memory drops ~model-axis-fold while
      the math stays the global-batch DDP math (tests/test_train_steps.py
      pins FSDP == replicated to f32 accumulation noise).
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()[:1]), (axis_name,))

    if spmd == "shard_map":
        if param_placement != "replicated":
            raise ValueError(
                "param_placement is a pjit-path option; the shard_map path "
                "replicates params (its in_specs are P()) — FSDP-sharded state "
                "would be silently re-gathered every call"
            )
        def step(params, opt_state, batch, rng, iteration):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            trainable, buffers = partition_params(params)
            args = (batch, rng, iteration) if with_iteration else (batch, rng)
            (_, (losses, new_buffers)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable, buffers, *args)
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            return combine_params(new_trainable, new_buffers), opt_state, losses

        mapped = shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(axis_name), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        jitted = jax.jit(mapped, donate_argnums=(0, 1))
        jitted.raw = mapped  # un-jitted body: composable into larger programs
        jitted.mesh, jitted.axis_name = mesh, axis_name
        jitted.param_placement = "replicated"
        return jitted

    # pjit path: the loss is a global mean, so no explicit collectives are needed.
    def step(params, opt_state, batch, rng, iteration):
        trainable, buffers = partition_params(params)
        args = (batch, rng, iteration) if with_iteration else (batch, rng)
        (_, (losses, new_buffers)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable, buffers, *args)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        return combine_params(new_trainable, new_buffers), opt_state, losses

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))
    if param_placement == "inherit":
        # None = inherit the caller's placement (FSDP-sharded trees stay
        # sharded; replicated trees stay replicated); outputs left to GSPMD,
        # which preserves donated buffers' shardings
        state_in, state_out = None, None
    elif param_placement == "replicated":
        state_in, state_out = replicated, replicated
    else:
        raise ValueError(f"unknown param_placement {param_placement!r} "
                         "(replicated|inherit)")
    jitted = jax.jit(
        step,
        in_shardings=(state_in, state_in, sharded, replicated, replicated),
        out_shardings=(state_out, state_out, replicated),
        donate_argnums=(0, 1),
    )
    # un-jitted body: lets callers fuse many steps into one device program (e.g. a
    # lax.scan over steps for epoch-style loops or steady-state benchmarking, where
    # per-call host<->device traffic would otherwise dominate on tunneled platforms)
    jitted.raw = step
    jitted.mesh, jitted.axis_name = mesh, axis_name
    jitted.param_placement = param_placement
    return jitted


def make_multi_step(step: Callable, k: int) -> Callable:
    """Fuse ``k`` consecutive train steps into ONE device program.

    step: a jitted step from ``make_*_train_step`` (its ``.raw`` body is scanned).
    Returns jitted ``(params, opt_state, batches, rng, iteration0) ->
    (params, opt_state, metrics)`` where ``batches`` is the per-step batch dict with a
    leading (k, ...) axis, ``iteration0`` is the int32 global step of the first inner
    step, and ``metrics`` are stacked per step, newest last. Inner step j gets
    ``fold_in(rng, iteration0 + j)`` and iteration ``float(iteration0 + j)`` — exactly
    what ``run_training``'s sequential path passes for global step iteration0+j, so
    fused and unfused training produce identical updates (same math; only the host
    boundary moves).

    Why: params/opt-state stay on device between the k updates — one host dispatch
    per k steps. On tunneled single-chip setups (CLAUDE.md) per-call param traffic
    dominates (measured 20x on CaMN: 2.1 s/call -> 106 ms/step scanned); on real
    multi-host pods it reduces host sync points. The reference has no analogue
    (torch executes eagerly); this is free structure from the functional step design.
    """
    raw = getattr(step, "raw", step)
    mesh = getattr(step, "mesh", None)

    def many(params, opt_state, batches, rng, iteration0):
        def body(carry, j):
            p, o = carry
            batch = jax.tree_util.tree_map(lambda x: x[j], batches)
            it = iteration0 + j
            p, o, metrics = raw(p, o, batch, jax.random.fold_in(rng, it),
                                it.astype(jnp.float32))
            return (p, o), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(k)
        )
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(many, donate_argnums=(0, 1))
    # mirror the per-step shardings: batch leaves carry (k, batch, ...) so the data
    # axis moves to dim 1; params/opt follow the step's param_placement
    # (replicated, or inherited for FSDP-sharded state); rng/iteration replicated
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(None, step.axis_name))
    if getattr(step, "param_placement", "replicated") == "inherit":
        state_in, state_out = None, None
    else:
        state_in, state_out = replicated, replicated
    return jax.jit(
        many,
        in_shardings=(state_in, state_in, batch_sharded, replicated, replicated),
        out_shardings=(state_out, state_out, replicated),
        donate_argnums=(0, 1),
    )


def init_opt_state(optimizer: optax.GradientTransformation, params) -> Any:
    """Initialize optimizer state over the TRAINABLE leaves only (BN buffers are
    carried in the param tree but not optimized)."""
    trainable, _ = partition_params(params)
    return optimizer.init(trainable)


__all__ = [
    "combine_params",
    "init_opt_state",
    "make_camn_train_step",
    "make_disco_train_step",
    "make_emage_train_step",
    "make_multi_step",
    "mask_ratio_schedule",
    "partition_params",
]
