"""Write a synthetic SMPLX_NEUTRAL_2020-format archive for offline full runs.

The real SMPL-X model archive is non-redistributable and absent from this
environment, so the FK-gated evaluation metrics (BC / L1div / LVDFace /
MSEFace — reference train_emage_audio.py:403-432) normally skip. This script
materializes the same synthetic archive the test suite uses
(tests/test_smplx_archive_and_ckpt_layout.py) at a stable path so training
runs can point SMPLX_MODEL_PATH at it and exercise the complete five-metric
evaluation protocol end-to-end. Geometry is random but structurally valid
(55-joint kinematic chain, blendshapes, landmark embedding); metric VALUES are
not comparable to the real model — only the code path is.

Usage:
    python scripts/make_synth_smplx.py [out_path]
    # default: datasets/synth_smplx/SMPLX_NEUTRAL_2020.npz
"""
import os
import sys

import numpy as np


def write_archive(path: str, seed: int = 0, V: int = 64, F: int = 100) -> str:
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    faces = rng.randint(0, V, (F, 3)).astype(np.int64)
    kintree = np.zeros((2, 55), np.int64)
    kintree[0] = np.concatenate([[2**32 - 1], np.arange(54)])  # parent row
    np.savez(
        path,
        v_template=rng.normal(0, 0.3, (V, 3)).astype(np.float64),
        shapedirs=rng.normal(0, 0.01, (V, 3, 400)).astype(np.float64),
        posedirs=rng.normal(0, 0.01, (V, 3, 486)).astype(np.float64),
        J_regressor=np.abs(rng.normal(0, 1, (55, V))).astype(np.float64),
        kintree_table=kintree,
        weights=np.abs(rng.normal(0, 1, (V, 55))).astype(np.float64),
        hands_meanl=rng.normal(0, 0.05, 45).astype(np.float64),
        hands_meanr=rng.normal(0, 0.05, 45).astype(np.float64),
        f=faces,
        lmk_faces_idx=rng.randint(0, F, 51).astype(np.int64),
        lmk_bary_coords=np.full((51, 3), 1 / 3, np.float64),
    )
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        "datasets", "synth_smplx", "SMPLX_NEUTRAL_2020.npz")
    print(f"wrote {write_archive(out)}")
