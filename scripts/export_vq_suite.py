"""Export a trained EMAGE tokenizer suite from a VQ-trainer checkpoint.

``cli.train_emage_vq`` exports the best-val suite at the end of a run; if a run
is interrupted after checkpointing (or exporting failed), this rebuilds the
``--vq_path`` layout (emage_vq/{face,upper,hands,lower,global}/) the EMAGE
audio trainer loads, from any saved ``best.bin``/``last.bin`` — the same
five-checkpoint layout the reference downloads from the hub
(/root/reference/test_emage_audio.py:82-93).

Usage (from the repo root):
    python scripts/export_vq_suite.py <ckpt.bin> <output_dir>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main(ckpt_path: str, out_dir: str) -> None:
    from safetensors import safe_open
    from safetensors.numpy import load_file

    from pantomatrix_tpu.cli.train_emage_vq import export_suite
    from pantomatrix_tpu.models.emage_vq import init_vq_suite
    from pantomatrix_tpu.train.ckpt import _unflatten

    suite = jax.jit(init_vq_suite)(jax.random.PRNGKey(0))
    template = {part: getattr(suite, part)[0]
                for part in ("face", "upper", "hands", "lower", "global_motion")}
    flat = load_file(ckpt_path)
    with safe_open(ckpt_path, framework="numpy") as f:
        meta = f.metadata() or {}
    params = _unflatten(flat, "model", template)
    root = export_suite(out_dir, params, suite)
    print(f"exported tokenizer suite (step {meta.get('iteration', '?')}, "
          f"extra={meta.get('extra', '{}')}) to {root}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
