"""pantomatrix_tpu — a TPU-native (JAX/XLA/Pallas) audio-driven 3D human animation framework.

Re-implements the full capability surface of PantoMatrix (DisCo / CaMN / EMAGE:
speech → SMPL-X body pose + FLAME expression + global translation at 30 fps,
BEAT2 training/eval, HF-style checkpoints) as an idiomatic JAX framework:

- `core`    rotation math, joint masking, velocity integration, SMPL-X forward kinematics
- `nn`      functional neural building blocks (conv stacks, LSTM scans, transformers, VQ)
- `models`  DisCo / CaMN / EMAGE model families with `from_pretrained`/`save_pretrained`
- `io`      BEAT-format npz IO and PyTorch-checkpoint import
- `data`    BEAT2 host-side data pipeline with static-shape batching
- `train`   pjit/shard_map training loops over a device mesh
- `eval`    first-party FGD / BC / L1div / LVDFace / MSEFace metrics
- `viz`     2D skeleton rendering + host-side mesh video farm
"""

__version__ = "0.1.0"

_API_EXPORTS = {
    "AutoConfig", "AutoModel", "CamnAudioModel", "DiscoAudioModel",
    "EmageAudioModel", "EmageVAEConv", "EmageVQModel", "EmageVQVAEConv",
}


def __getattr__(name):
    """Lazy top-level re-exports: pantomatrix_tpu.AutoModel etc. (jax stays unloaded
    until a model is actually used)."""
    if name in _API_EXPORTS:
        from . import models as _m
        from .models import api as _api

        return getattr(_api, name)
    if name in ("EmageGenerator", "SequenceGenerator", "StreamingEmageGenerator",
                "StreamingPool", "GenerationResult"):
        from . import serve as _serve

        return getattr(_serve, name)
    if name in ("MotionServer", "MotionClient"):
        from . import serve_http as _serve_http

        return getattr(_serve_http, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
