"""One-command activation of the network/artifact-gated parity validations.

The framework has three validations that cannot run offline because the
artifacts are not redistributable (PARITY.md "Known gaps"):

1. FGD embedder value parity — needs ``AESKConv_240_100.bin``
   (/root/reference/README.md:92; used at train_emage_audio.py:421-428).
2. SMPL-X FK against the real model — needs ``SMPLX_NEUTRAL_2020.npz``
   (/root/reference/emage_utils/motion_rep_transfer.py:8-18).
3. Hub-checkpoint import + forward parity — needs local clones of
   ``H-Liu1997/{disco,camn,emage}_audio`` (/root/reference/README.md:79-83).

The moment any artifact appears, run this script with its path: every gated
validation it unlocks executes and a pass/fail JSON report is written. With
``--dry-run`` the script synthesizes stand-ins (a torch-saved AESKConv state
dict, a synthetic SMPLX archive, hub-layout checkpoint dirs) and runs the exact
same flow end-to-end — proving the harness works before the artifacts exist
(tests/test_activate_parity.py).

Usage:
  python /root/repo/scripts/activate_parity.py \
      [--aeskconv /path/AESKConv_240_100.bin] \
      [--smplx /path/SMPLX_NEUTRAL_2020.npz] \
      [--hub-disco DIR] [--hub-camn DIR] [--hub-emage DIR] \
      [--report /tmp/parity_report.json] [--dry-run]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_TESTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests")


def _result(fn):
    """Run one validation; capture pass/fail + detail."""
    try:
        detail = fn()
        return {"status": "pass", "detail": detail}
    except Exception as e:  # noqa: BLE001 — report, don't crash the harness
        return {"status": "fail", "detail": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc(limit=8)}


# --- 1. FGD embedder ---------------------------------------------------------

def validate_aeskconv(path: str) -> dict:
    """Import the weight file, embed random windows, and (when torch is
    available) pin the JAX features against a torch oracle built from the SAME
    state dict — feature-level value parity of the FGD embedder."""
    from pantomatrix_tpu.eval.fgd_encoder import load_aeskconv

    emb = load_aeskconv(path)
    rng = np.random.RandomState(0)
    windows = rng.uniform(-1, 1, (4, 64, 330)).astype(np.float32)
    feats = emb(windows)
    assert feats.ndim == 2 and feats.shape[-1] == 240, feats.shape
    assert np.all(np.isfinite(feats)), "non-finite FGD features"
    out = {"feature_shape": list(feats.shape)}

    try:
        import torch

        sys.path.insert(0, _TESTS)
        from torch_oracles import TorchLocalEncoder

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model_state" in raw:
            raw = raw["model_state"]
        oracle = TorchLocalEncoder(emb.plan)
        oracle.load_state_dict({
            k.split("encoder.", 1)[1]: torch.as_tensor(v)
            for k, v in raw.items() if "encoder." in k
        })
        oracle.eval()
        with torch.no_grad():
            want = oracle(torch.from_numpy(windows)).numpy()
        diff = float(np.max(np.abs(want.reshape(feats.shape) - feats)))
        assert diff < 1e-4, f"feature mismatch vs torch oracle: {diff}"
        out["torch_oracle_max_abs_diff"] = diff
    except ImportError:
        out["torch_oracle"] = "torch unavailable — import-only validation"
    return out


# --- 2. SMPL-X archive -------------------------------------------------------

def validate_smplx(path: str) -> dict:
    """Load the archive, run FK, and check the invariants that pin a correct
    LBS (rest-pose joints match the regressor; identity pose reproduces the
    shaped template; ground-offset save path works end-to-end)."""
    import jax

    from pantomatrix_tpu.core.smplx import lbs, load_smplx

    model = load_smplx(path)
    d = {"num_vertices": model.num_vertices}
    betas = np.zeros(300, np.float32)
    out = lbs(model, betas, np.zeros((2, 165), np.float32))
    verts, joints = np.asarray(out["vertices"]), np.asarray(out["joints"])
    assert np.all(np.isfinite(verts)) and np.all(np.isfinite(joints))
    # identity pose with flat hands == shaped template through the regressor
    flat = lbs(model, betas, np.zeros((1, 165), np.float32), flat_hand_mean=True)
    vt = np.asarray(model.v_template)
    diff = float(np.max(np.abs(np.asarray(flat["vertices"])[0] - vt)))
    assert diff < 1e-4, f"identity-pose FK deviates from template by {diff}"
    jr = np.asarray(model.j_regressor) @ vt
    jd = float(np.max(np.abs(np.asarray(flat["joints"])[0, : jr.shape[0]] - jr)))
    assert jd < 1e-4, f"rest joints deviate from regressor by {jd}"
    d["identity_pose_max_diff"] = diff
    d["rest_joint_max_diff"] = jd

    # ground-offset translation on save (io/beat_format.py, gated on the archive)
    import tempfile

    from pantomatrix_tpu.io.beat_format import beat_format_save

    os.environ["SMPLX_MODEL_PATH"] = path
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.npz")
        beat_format_save(p, np.zeros((4, 165), np.float32),
                         expressions=np.zeros((4, 100), np.float32))
        with np.load(p) as z:
            assert z["trans"].shape == (4, 3)
            d["ground_offset_trans0"] = [float(x) for x in z["trans"][0]]
    return d


# --- 3. Hub checkpoints ------------------------------------------------------

def validate_hub(family: str, directory: str) -> dict:
    """Import the checkpoint directory and compare the JAX forward against a
    torch oracle loaded from the SAME state dict — motion-parameter parity
    without network access (the oracles mirror the reference architecture,
    tests/torch_oracles.py)."""
    import jax
    import jax.numpy as jnp

    from pantomatrix_tpu.io.hf_checkpoint import load_state_dict
    from pantomatrix_tpu.io.hf_checkpoint import load_params

    sd = load_state_dict(directory)
    params = load_params(directory)
    d = {"n_tensors": len(sd)}

    import torch

    sys.path.insert(0, _TESTS)
    rng = np.random.RandomState(1)

    if family in ("camn", "disco"):
        from torch_oracles import TorchCamn, TorchDisco

        from pantomatrix_tpu.core.masking import MASK_DICT
        from pantomatrix_tpu.models.api import AutoConfig
        from pantomatrix_tpu.models.camn import camn_forward
        from pantomatrix_tpu.models.disco import disco_forward

        cfg = AutoConfig.from_pretrained(directory)
        t = 16
        audio = rng.uniform(-1, 1, (1, t * 1080)).astype(np.float32)
        sid = np.zeros((1, 1), np.int64)
        joint_mask = MASK_DICT[cfg.joint_mask or "local_upper"]
        cls, fwd = ((TorchCamn, camn_forward) if family == "camn"
                    else (TorchDisco, disco_forward))
        oracle = cls(cfg).eval()
        oracle.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
        with torch.no_grad():
            want = oracle(torch.from_numpy(audio), torch.from_numpy(sid),
                          joint_mask=joint_mask)["motion_axis_angle"].numpy()
        got = np.asarray(fwd(params, cfg, jnp.asarray(audio),
                             jnp.asarray(sid, jnp.int32),
                             cfg.seed_frames)["motion_axis_angle"])
    elif family == "emage":
        from torch_oracles import TorchEmage

        from pantomatrix_tpu.models.api import AutoConfig
        from pantomatrix_tpu.models.emage import emage_forward

        cfg = AutoConfig.from_pretrained(directory)
        oracle = TorchEmage(cfg).eval()
        oracle.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
        t = cfg.pose_length
        audio = rng.uniform(-1, 1, (1, t * 533)).astype(np.float32)
        motion = np.zeros((1, t, cfg.pose_dims + 7), np.float32)
        mask = np.ones((1, t, cfg.pose_dims + 7), np.float32)
        sid = np.zeros((1, 1), np.int64)
        with torch.no_grad():
            want = oracle(torch.from_numpy(audio), torch.from_numpy(sid),
                          torch.from_numpy(motion), torch.from_numpy(mask)
                          )["rec_upper"].numpy()
        got = np.asarray(emage_forward(params, cfg, jnp.asarray(audio),
                                       jnp.asarray(sid, jnp.int32),
                                       jnp.asarray(motion), jnp.asarray(mask)
                                       )["rec_upper"])
    else:
        raise ValueError(f"unknown family {family}")

    diff = float(np.max(np.abs(want - got)))
    scale = float(np.max(np.abs(want)) + 1e-9)
    assert diff / scale < 1e-3, f"forward mismatch vs torch oracle: {diff} (scale {scale})"
    d["forward_max_abs_diff"] = diff
    return d


# --- dry-run stand-ins -------------------------------------------------------

def make_dry_run_artifacts(td: str) -> dict:
    """Synthesize one stand-in per gated artifact (same layouts as the real
    ones) so the full activation flow can be exercised offline."""
    import torch

    sys.path.insert(0, _TESTS)
    from torch_oracles import TorchLocalEncoder

    from pantomatrix_tpu.eval.fgd_encoder import make_plan

    paths = {}
    # 1. AESKConv .bin: torch-pickled {"model_state": {...}} like the real file
    plan = make_plan()
    oracle = TorchLocalEncoder(plan)
    sd = {f"module.encoder.{k}": v for k, v in oracle.state_dict().items()}
    paths["aeskconv"] = os.path.join(td, "AESKConv_240_100.bin")
    torch.save({"model_state": sd}, paths["aeskconv"])

    # 2. synthetic SMPLX archive (real key layout, small V)
    rng = np.random.RandomState(0)
    V, F = 64, 100
    kintree = np.zeros((2, 55), np.int64)
    kintree[0] = np.concatenate([[2**32 - 1], np.arange(54)])
    # real SMPL-X skinning weights are a row-stochastic matrix — the identity-
    # pose invariant (LBS == template) depends on it
    weights = np.abs(rng.normal(0, 1, (V, 55)))
    weights /= weights.sum(axis=1, keepdims=True)
    paths["smplx"] = os.path.join(td, "SMPLX_NEUTRAL_2020.npz")
    np.savez(
        paths["smplx"],
        v_template=rng.normal(0, 0.3, (V, 3)).astype(np.float64),
        shapedirs=rng.normal(0, 0.01, (V, 3, 400)).astype(np.float64),
        posedirs=rng.normal(0, 0.01, (V, 3, 486)).astype(np.float64),
        J_regressor=np.abs(rng.normal(0, 1, (55, V))).astype(np.float64),
        kintree_table=kintree,
        weights=weights.astype(np.float64),
        hands_meanl=rng.normal(0, 0.05, 45).astype(np.float64),
        hands_meanr=rng.normal(0, 0.05, 45).astype(np.float64),
        f=rng.randint(0, V, (F, 3)).astype(np.int64),
        lmk_faces_idx=rng.randint(0, F, 51).astype(np.int64),
        lmk_bary_coords=np.full((51, 3), 1 / 3, np.float64),
    )

    # 3. hub-layout checkpoints saved from our models (import path identical:
    # config.json + weights with torch state_dict key paths)
    from pantomatrix_tpu.models.api import (
        CamnAudioModel,
        DiscoAudioModel,
        EmageAudioModel,
    )
    from pantomatrix_tpu.models.configs import (
        CamnAudioConfig,
        DiscoAudioConfig,
        EmageAudioConfig,
    )

    small = dict(hidden_size=32, n_layer=1, dropout_prob=0.0)
    paths["hub_camn"] = os.path.join(td, "camn_audio")
    CamnAudioModel(CamnAudioConfig(**small), seed=0).save_pretrained(paths["hub_camn"])
    paths["hub_disco"] = os.path.join(td, "disco_audio")
    DiscoAudioModel(DiscoAudioConfig(**small), seed=1).save_pretrained(paths["hub_disco"])
    paths["hub_emage"] = os.path.join(td, "emage_audio")
    EmageAudioModel(
        EmageAudioConfig(audio_f=32, motion_f=16, hidden_size=32, speaker_dims=4,
                         pose_length=8, seed_frames=2, vae_codebook_size=16,
                         vae_length=16, dropout_prob=0.0),
        seed=2,
    ).save_pretrained(paths["hub_emage"])
    return paths


def run(args) -> dict:
    report: dict = {"validations": {}}
    if args.aeskconv:
        report["validations"]["fgd_aeskconv"] = _result(
            lambda: validate_aeskconv(args.aeskconv))
    if args.smplx:
        report["validations"]["smplx_fk"] = _result(lambda: validate_smplx(args.smplx))
    for family in ("disco", "camn", "emage"):
        d = getattr(args, f"hub_{family}")
        if d:
            report["validations"][f"hub_{family}"] = _result(
                lambda f=family, dd=d: validate_hub(f, dd))
    if not report["validations"]:
        report["note"] = "no artifacts supplied; nothing to validate"
    report["ok"] = all(v["status"] == "pass"
                       for v in report["validations"].values())
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--aeskconv")
    ap.add_argument("--smplx")
    ap.add_argument("--hub-disco", dest="hub_disco")
    ap.add_argument("--hub-camn", dest="hub_camn")
    ap.add_argument("--hub-emage", dest="hub_emage")
    ap.add_argument("--report", default="parity_report.json")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthesize stand-in artifacts and validate against them")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side validation work

    if args.dry_run:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            paths = make_dry_run_artifacts(td)
            args.aeskconv = args.aeskconv or paths["aeskconv"]
            args.smplx = args.smplx or paths["smplx"]
            args.hub_camn = args.hub_camn or paths["hub_camn"]
            args.hub_disco = args.hub_disco or paths["hub_disco"]
            args.hub_emage = args.hub_emage or paths["hub_emage"]
            report = run(args)
        report["dry_run"] = True
    else:
        report = run(args)

    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
