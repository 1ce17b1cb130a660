"""End-to-end debug-mode smoke runs of the train CLIs on a synthetic mini-BEAT2
(the reference's --debug "iterate one data point for fast testing" behavior)."""
import json
import os
import sys

import numpy as np
import pytest

from test_data_pipeline import write_wav


@pytest.fixture(scope="module")
def mini_beat2(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_beat2")
    (root / "smplxflame_30").mkdir()
    (root / "footcontact").mkdir()
    (root / "wave16k").mkdir()
    rng = np.random.RandomState(0)
    metas = []
    for vid in ("2_a_0_1_1", "2_a_0_2_2"):
        n = 40
        np.savez(
            root / "smplxflame_30" / f"{vid}.npz",
            betas=np.zeros(300, np.float32),
            poses=rng.uniform(-0.5, 0.5, (n, 165)).astype(np.float32),
            expressions=rng.uniform(-1, 1, (n, 100)).astype(np.float32),
            trans=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            model="smplx2020", gender="neutral", mocap_frame_rate=30,
        )
        np.save(root / "footcontact" / f"{vid}.npy",
                (rng.uniform(size=(n, 4)) < 0.5).astype(np.float32))
        wav = rng.uniform(-0.3, 0.3, n * 16000 // 30).astype(np.float32)
        write_wav(root / "wave16k" / f"{vid}.wav", wav, 16000)
        metas.append({
            "video_id": vid, "mode": "train",
            "motion_path": str(root / "smplxflame_30" / f"{vid}.npz"),
            "audio_path": str(root / "wave16k" / f"{vid}.wav"),
            "start_idx": 0, "end_idx": 32,
            "content_label": 0 if vid.endswith("1") else 1,
            "rhythm_label": 1,
        })
    meta_path = root / "meta.json"
    meta_path.write_text(json.dumps(metas))
    return str(meta_path)


def _run_cli(main_fn, tmp_path, mini_beat2, extra=()):
    argv = [
        "prog", "--debug",
        f"data.meta_paths=['{mini_beat2}']",
        f"data.test_meta_paths=['{mini_beat2}']",
        "data.train_bs=2",
        f"output_dir={tmp_path}",
        "log_period=1",
        # tiny model so the debug run compiles fast on CPU
        "model.hidden_size=32", "model.n_layer=1", "model.dropout_prob=0.0",
    ] + list(extra)
    old = sys.argv
    sys.argv = argv
    try:
        main_fn()
    finally:
        sys.argv = old
    # a checkpoint directory must exist afterwards
    exps = os.listdir(tmp_path)
    assert exps
    ckpt = os.path.join(tmp_path, exps[0], "ckpt")
    assert os.path.exists(os.path.join(ckpt, "last.bin"))
    assert os.path.exists(os.path.join(ckpt, "last", "model.safetensors"))


def test_train_camn_debug(tmp_path, mini_beat2):
    from pantomatrix_tpu.cli.train_camn import main

    _run_cli(main, tmp_path, mini_beat2)


def test_train_disco_debug(tmp_path, mini_beat2):
    from pantomatrix_tpu.cli.train_disco import main

    _run_cli(main, tmp_path, mini_beat2)


def test_train_emage_debug(tmp_path, mini_beat2):
    from pantomatrix_tpu.cli.train_emage import main

    _run_cli(
        main, tmp_path, mini_beat2,
        extra=[
            "--random_vq",
            "model.audio_f=32", "model.motion_f=16", "model.speaker_dims=4",
            # clip length (32 frames) must equal the model window / PE period
            "model.pose_length=32", "model.seed_frames=4",
            "model.vae_codebook_size=256", "model.vae_length=256",
        ],
    )


def test_evaluate_cli_camn(tmp_path, mini_beat2):
    """--test flow: generate test-set npz from a checkpoint, run the metric pipeline."""
    import json as _json

    from pantomatrix_tpu.cli.evaluate import main
    from pantomatrix_tpu.models.api import CamnAudioModel
    from pantomatrix_tpu.models.configs import CamnAudioConfig

    # mini_beat2 metas are all mode=train; write a test-mode copy
    metas = _json.load(open(mini_beat2))
    for m in metas:
        m["mode"] = "test"
    meta_path = str(tmp_path / "meta_test.json")
    open(meta_path, "w").write(_json.dumps(metas))

    ckpt = str(tmp_path / "camn_ckpt")
    CamnAudioModel(CamnAudioConfig(hidden_size=32, n_layer=1), seed=0).save_pretrained(ckpt)

    save = str(tmp_path / "test_out")
    old = sys.argv
    sys.argv = ["prog", "--family", "camn", "--model_path", ckpt,
                "--meta", meta_path, "--save_folder", save]
    try:
        main()
    finally:
        sys.argv = old
    m = _json.load(open(os.path.join(save, "metrics.json")))
    assert "fgd" in m
    outs = [f for f in os.listdir(save) if f.endswith("_output.npz")]
    assert len(outs) == 2  # unique test videos


def test_evaluate_cli_from_bare_beat2_layout(tmp_path, mini_beat2):
    """--beat2_root flow: no prebuilt clip index — evaluate builds one on the fly
    from a bare BEAT2 layout (train_test_split.csv + smplxflame_30/ + wave16k/),
    the reference's datasets/process_testdata.py step."""
    import json as _json

    from pantomatrix_tpu.cli.evaluate import main
    from pantomatrix_tpu.models.api import CamnAudioModel
    from pantomatrix_tpu.models.configs import CamnAudioConfig

    root = os.path.dirname(mini_beat2)
    with open(os.path.join(root, "train_test_split.csv"), "w") as f:
        f.write("id,type\n2_a_0_1_1,test\n2_a_0_2_2,test\n")

    ckpt = str(tmp_path / "camn_ckpt")
    CamnAudioModel(CamnAudioConfig(hidden_size=32, n_layer=1), seed=0).save_pretrained(ckpt)

    save = str(tmp_path / "bare_out")
    old = sys.argv
    sys.argv = ["prog", "--family", "camn", "--model_path", ckpt,
                "--beat2_root", root, "--clip_length", "32",
                "--save_folder", save]
    try:
        main()
    finally:
        sys.argv = old
    m = _json.load(open(os.path.join(save, "metrics.json")))
    assert "fgd" in m
    built = [f for f in os.listdir(save) if f.startswith("beat2_s") and f.endswith(".json")]
    assert built, "clip index not built"
    clips = _json.load(open(os.path.join(save, built[0])))
    assert all(c["mode"] == "test" for c in clips)


def test_emage_cli_on_reference_example(tmp_path):
    """Full flagship CLI path on the actual reference example audio (MP3 decode ->
    windowed AR inference -> VQ decode -> BEAT npz with expressions+trans)."""
    audio_dir = "/root/reference/examples/audio"
    if not os.path.isdir(audio_dir):
        pytest.skip("reference examples not available")
    from pantomatrix_tpu.cli.test_emage import main

    save = str(tmp_path / "emage_out")
    old = sys.argv
    sys.argv = [
        "prog", "--audio_folder", audio_dir, "--save_folder", save, "--random_init",
    ]
    try:
        main()
    finally:
        sys.argv = old
    outs = [f for f in os.listdir(save) if f.endswith("_output.npz")]
    assert outs
    d = np.load(os.path.join(save, outs[0]), allow_pickle=True)
    t = d["poses"].shape[0]
    assert 27 * 30 < t < 30 * 30          # ~28.7 s at 30 fps
    assert d["poses"].shape == (t, 165)
    assert d["expressions"].shape == (t, 100)
    assert d["trans"].shape == (t, 3)
    assert np.isfinite(d["poses"]).all()


def test_train_camn_periodic_test_flow(tmp_path, mini_beat2):
    """--debug --evaluation: the in-training every-test_steps test pass runs on the
    main process (generate -> npz -> metrics) and keeps a test_best/ HF checkpoint
    (reference train_emage_audio.py:320-329,:491)."""
    import json as _json

    from pantomatrix_tpu.cli.train_camn import main

    # test clips must exceed the 64-frame FGD window or the metric is nan (and
    # test_best is never written) — build 80-frame test videos
    rng = np.random.RandomState(7)
    metas = []
    for vid in ("2_b_0_1_1", "2_b_0_2_2"):
        n = 80
        np.savez(
            tmp_path / f"{vid}.npz",
            betas=np.zeros(300, np.float32),
            poses=rng.uniform(-0.5, 0.5, (n, 165)).astype(np.float32),
            expressions=rng.uniform(-1, 1, (n, 100)).astype(np.float32),
            trans=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            model="smplx2020", gender="neutral", mocap_frame_rate=30,
        )
        wav = rng.uniform(-0.3, 0.3, n * 16000 // 30).astype(np.float32)
        write_wav(tmp_path / f"{vid}.wav", wav, 16000)
        metas.append({
            "video_id": vid, "mode": "test",
            "motion_path": str(tmp_path / f"{vid}.npz"),
            "audio_path": str(tmp_path / f"{vid}.wav"),
            "start_idx": 0, "end_idx": 64,
        })
    meta_test = str(tmp_path / "meta_test.json")
    open(meta_test, "w").write(_json.dumps(metas))

    argv = [
        "prog", "--debug", "--evaluation", "--visualization",
        f"data.meta_paths=['{mini_beat2}']",
        f"data.test_meta_paths=['{meta_test}']",
        "data.train_bs=2",
        f"output_dir={tmp_path}",
        "log_period=1",
        "model.hidden_size=32", "model.n_layer=1", "model.dropout_prob=0.0",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old
    exps = [e for e in os.listdir(tmp_path) if e.startswith("camn")]
    assert exps
    exp = os.path.join(tmp_path, exps[0])
    # debug: test_steps=2, max 4 steps -> passes at iterations 2 and 4
    for it in (2, 4):
        mfile = os.path.join(exp, f"test_{it}", "metrics.json")
        assert os.path.exists(mfile), f"missing {mfile}"
        assert "fgd" in _json.load(open(mfile))
    assert os.path.exists(os.path.join(exp, "ckpt", "test_best", "model.safetensors"))


def test_train_camn_test_once_mode(tmp_path, mini_beat2):
    """--test: run the test pass once and exit without training (no last.bin)."""
    import json as _json

    from pantomatrix_tpu.cli.train_camn import main

    metas = _json.load(open(mini_beat2))
    for m in metas:
        m["mode"] = "test"
    meta_test = str(tmp_path / "meta_test.json")
    open(meta_test, "w").write(_json.dumps(metas))

    argv = [
        "prog", "--debug", "--test",
        f"data.meta_paths=['{mini_beat2}']",
        f"data.test_meta_paths=['{meta_test}']",
        "data.train_bs=2",
        f"output_dir={tmp_path}",
        "model.hidden_size=32", "model.n_layer=1", "model.dropout_prob=0.0",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old
    exps = [e for e in os.listdir(tmp_path) if e.startswith("camn")]
    exp = os.path.join(tmp_path, exps[0])
    assert os.path.exists(os.path.join(exp, "test_0", "metrics.json"))
    assert not os.path.exists(os.path.join(exp, "ckpt", "last.bin"))


def test_train_camn_writes_metrics_jsonl(tmp_path, mini_beat2):
    """The always-on JsonlLogger records train means per log period."""
    import json as _json

    from pantomatrix_tpu.cli.train_camn import main

    _run_cli(main, tmp_path, mini_beat2)
    exps = os.listdir(tmp_path)
    mfile = os.path.join(tmp_path, exps[0], "metrics.jsonl")
    assert os.path.exists(mfile)
    recs = [_json.loads(l) for l in open(mfile)]
    assert recs and all("step" in r and "loss" in r for r in recs)


def test_train_camn_fsdp_debug(tmp_path, mini_beat2):
    """solver.fsdp_model_axis=4 trains over a ("data","model") mesh end to end:
    params/opt sharded (ZeRO-3 via GSPMD), checkpoints still written as full
    host arrays (single-process leaves are fully addressable)."""
    from pantomatrix_tpu.cli.train_camn import main

    _run_cli(main, tmp_path, mini_beat2,
             extra=["solver.fsdp_model_axis=4"])  # 8 devices -> data axis 2, bs 2


def test_guard_tiny_batch_bf16():
    """bs<=2 + bfloat16 on a non-CPU backend forces f32 (PROFILE.md: the XLA:TPU
    compiler SIGABRTs on the conv-stack families at this configuration); CPU and
    bs>=4 configurations are untouched."""
    from pantomatrix_tpu.cli._train_common import guard_tiny_batch_bf16
    from pantomatrix_tpu.utils.config import DotDict

    def cfg(bs, dtype):
        return DotDict.wrap({"data": {"train_bs": bs},
                             "solver": {"compute_dtype": dtype}})

    c = cfg(2, "bfloat16")
    assert guard_tiny_batch_bf16(c, backend="tpu")
    assert c.solver.compute_dtype == "float32"

    c = cfg(2, "bfloat16")
    assert not guard_tiny_batch_bf16(c, backend="cpu")
    assert c.solver.compute_dtype == "bfloat16"

    c = cfg(56, "bfloat16")
    assert not guard_tiny_batch_bf16(c, backend="tpu")
    assert c.solver.compute_dtype == "bfloat16"

    c = cfg(2, "float32")
    assert not guard_tiny_batch_bf16(c, backend="tpu")
    assert c.solver.compute_dtype == "float32"


def test_train_emage_vq_debug_then_emage_from_vq_path(tmp_path, mini_beat2):
    """The tokenizer-pretraining stage exports the --vq_path layout the EMAGE
    trainer loads: train VQ suite (debug) -> emage_vq/{face,...,global}/ ->
    train_emage --vq_path <exp_dir> consumes it end to end."""
    from pantomatrix_tpu.cli.train_emage_vq import main as vq_main

    _run_cli(vq_main, tmp_path, mini_beat2)
    exp = os.path.join(tmp_path, sorted(os.listdir(tmp_path))[0])
    root = os.path.join(exp, "emage_vq")
    for name in ("face", "upper", "hands", "lower", "global"):
        assert os.path.exists(os.path.join(root, name, "model.safetensors")), name
        assert os.path.exists(os.path.join(root, name, "config.json")), name

    from pantomatrix_tpu.cli.train_emage import main as emage_main

    out2 = os.path.join(tmp_path, "emage_from_vq")
    os.makedirs(out2)
    _run_cli(
        emage_main, out2, mini_beat2,
        extra=[
            "--vq_path", exp,
            "model.audio_f=32", "model.motion_f=16", "model.speaker_dims=4",
            "model.pose_length=32", "model.seed_frames=4",
            "model.vae_codebook_size=256", "model.vae_length=256",
        ],
    )
