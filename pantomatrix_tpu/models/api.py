"""User-facing model classes: the HF-style ``from_pretrained``/``save_pretrained`` API.

Capability parity with the reference's public surface (README.md:79-83,
/root/reference/models/*/modeling_*.py, /root/reference/models/auto/): thin stateful
wrappers around (config, param-pytree, pure apply fn). All compute stays functional —
the class only carries state and ergonomics; ``model.params`` / ``model.config`` feed
straight into jit/pjit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Type

import jax

from ..io.hf_checkpoint import load_params, save_checkpoint
from . import camn as _camn
from . import disco as _disco
from . import emage as _emage
from . import emage_vq as _emage_vq
from .configs import (
    BaseConfig,
    CamnAudioConfig,
    DiscoAudioConfig,
    EmageAudioConfig,
    EmageVAEConvConfig,
    EmageVQVAEConvConfig,
    auto_config,
)


class PretrainedModel:
    """Base: config + params + pure apply functions."""

    config_class: Type[BaseConfig] = BaseConfig

    def __init__(self, config: BaseConfig, params: Optional[Dict[str, Any]] = None,
                 seed: int = 0):
        self.config = config
        # jit the random init: eagerly it dispatches thousands of ops, which on
        # tunneled platforms costs ~7 ms each (minutes for the full-size models);
        # as one compiled program it takes seconds (CLAUDE.md)
        self.params = (
            params if params is not None
            else jax.jit(self._init)(jax.random.PRNGKey(seed))
        )

    def _init(self, key):
        raise NotImplementedError

    @classmethod
    def from_pretrained(cls, directory: str) -> "PretrainedModel":
        """Load a local HF-layout checkpoint directory (config.json + weights)."""
        config = cls.config_class.load_json(directory)
        return cls(config, load_params(directory))

    def save_pretrained(self, directory: str) -> None:
        save_checkpoint(directory, self.params, self.config)


class CamnAudioModel(PretrainedModel):
    config_class = CamnAudioConfig

    def _init(self, key):
        return _camn.init_camn(key, self.config)

    def __call__(self, audio, speaker_id, seed_frames=4, seed_motion=None,
                 return_axis_angle=True, ctx=None, compute_dtype=None):
        from ..nn.layers import EVAL
        return _camn.camn_forward(
            self.params, self.config, audio, speaker_id, seed_frames, seed_motion,
            return_axis_angle, ctx or EVAL, compute_dtype=compute_dtype,
        )


class DiscoAudioModel(PretrainedModel):
    config_class = DiscoAudioConfig

    def _init(self, key):
        return _disco.init_disco(key, self.config)

    def __call__(self, audio, speaker_id, seed_frames=4, seed_motion=None,
                 return_axis_angle=True, ctx=None, compute_dtype=None):
        from ..nn.layers import EVAL
        return _disco.disco_forward(
            self.params, self.config, audio, speaker_id, seed_frames, seed_motion,
            return_axis_angle, ctx or EVAL, compute_dtype=compute_dtype,
        )


class EmageVQVAEConv(PretrainedModel):
    config_class = EmageVQVAEConvConfig

    def _init(self, key):
        return _emage_vq.init_emage_vqvae(key, self.config)

    def __call__(self, inputs):
        return _emage_vq.vqvae_forward(self.params, self.config, inputs)

    def map2index(self, inputs):
        return _emage_vq.vqvae_map2index(self.params, self.config, inputs)

    def map2latent(self, inputs):
        return _emage_vq.vqvae_map2latent(self.params, self.config, inputs)

    def decode(self, index):
        return _emage_vq.vqvae_decode_index(self.params, self.config, index)

    def decode_from_latent(self, latent):
        return _emage_vq.vqvae_decode_latent(self.params, self.config, latent)


class EmageVAEConv(PretrainedModel):
    config_class = EmageVAEConvConfig

    def _init(self, key):
        return _emage_vq.init_emage_vae(key, self.config)

    def __call__(self, inputs):
        return _emage_vq.vae_forward(self.params, self.config, inputs)


class EmageVQModel:
    """Composite of the five tokenizers (reference EmageVQModel,
    modeling_emage_audio.py:72-205)."""

    def __init__(self, face: EmageVQVAEConv, upper: EmageVQVAEConv,
                 hands: EmageVQVAEConv, lower: EmageVQVAEConv, global_motion: EmageVAEConv):
        self.suite = _emage_vq.EmageVQSuite(
            face=(face.params, face.config),
            upper=(upper.params, upper.config),
            hands=(hands.params, hands.config),
            lower=(lower.params, lower.config),
            global_motion=(global_motion.params, global_motion.config),
        )

    def spilt_inputs(self, rot6d, expression, tar_contact=None, tar_trans=None):
        # (sic) reference spelling, modeling_emage_audio.py:97
        return _emage_vq.vq_split_inputs(rot6d, expression, tar_contact, tar_trans)

    def map2index(self, rot6d, expression, tar_contact=None, tar_trans=None):
        return _emage_vq.vq_map2index(self.suite, rot6d, expression, tar_contact, tar_trans)

    def map2latent(self, rot6d, expression, tar_contact=None, tar_trans=None):
        return _emage_vq.vq_map2latent(self.suite, rot6d, expression, tar_contact, tar_trans)

    def decode(self, **kwargs):
        return _emage_vq.vq_decode(self.suite, **kwargs)

    def get_global_motion(self, lower_body, ref_trans):
        return _emage_vq.vq_get_global_motion(self.suite, lower_body, ref_trans)


class EmageAudioModel(PretrainedModel):
    config_class = EmageAudioConfig

    def _init(self, key):
        return _emage.init_emage(key, self.config)

    def __call__(self, audio, speaker_id, masked_motion, mask, use_audio=True, ctx=None):
        from ..nn.layers import EVAL
        return _emage.emage_forward(
            self.params, self.config, audio, speaker_id, masked_motion, mask,
            use_audio, ctx or EVAL,
        )

    def inference(self, audio, speaker_id, vq_model: EmageVQModel,
                  masked_motion=None, mask=None, compute_dtype=None,
                  batched_wav=False):
        return _emage.emage_inference(
            self.params, self.config, audio, speaker_id, vq_model.suite,
            masked_motion, mask, compute_dtype=compute_dtype,
            batched_wav=batched_wav,
        )


MODEL_REGISTRY: Dict[str, Type[PretrainedModel]] = {
    "camn_audio": CamnAudioModel,
    "disco_audio": DiscoAudioModel,
    "emage_audio": EmageAudioModel,
    "emage_vqvaeconv": EmageVQVAEConv,
    "emage_vaeconv": EmageVAEConv,
}


class AutoModel:
    """AutoModel.from_pretrained parity (models/auto/modeling_auto.py:20-38):
    dispatch on config.json model_type."""

    @classmethod
    def from_pretrained(cls, directory: str) -> PretrainedModel:
        config = auto_config(directory)
        model_cls = MODEL_REGISTRY[config.model_type]
        return model_cls(config, load_params(directory))


class AutoConfig:
    @classmethod
    def from_pretrained(cls, directory: str) -> BaseConfig:
        return auto_config(directory)


__all__ = [
    "AutoConfig",
    "AutoModel",
    "CamnAudioModel",
    "DiscoAudioModel",
    "EmageAudioModel",
    "EmageVAEConv",
    "EmageVQModel",
    "EmageVQVAEConv",
    "MODEL_REGISTRY",
    "PretrainedModel",
]
