"""Two-REAL-process distributed training (the torchrun --nnodes analogue,
/root/reference/README.md:329; NCCL init at train_emage_audio.py:214-251).

Everything else in the suite runs multi-device in ONE process; these tests spawn
two actual OS processes (each with 4 virtual CPU devices, gloo collectives,
PANTO_COORDINATOR wiring through train/mesh.py:maybe_init_distributed) and assert

- the final trained params equal the single-process 8-device run of the identical
  config (same global batch, same per-device rows) to float32-ulp accumulation:
  the per-process SPMD program (gloo all-reduce) and the single-process program
  are different XLA compilations, so their reduction orders differ in the last
  ulp — losses match to ~1e-7 relative and SGD params to <1e-6 absolute (Adam
  would amplify those ulps to ~1e-3 via its sign(g)*lr early steps; CLAUDE.md),
- each process consumed a disjoint, exactly partitioned epoch (loader unit tests).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_train_cli_smoke import write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# loader partition: disjoint + exact (pure host logic, no subprocesses)
# ---------------------------------------------------------------------------

class _IdxDataset:
    """Dataset stub whose item i is just {'i': [i]} — makes batch contents legible."""

    def __init__(self, n):
        self.n = n
        self.data_list = [{"content_label": i % 3} for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"i": np.asarray([i])}


def _epoch_batches(loader, epoch=0):
    loader.set_epoch(epoch)
    return [b["i"][:, 0] for b in loader]


@pytest.mark.parametrize("n,gb,pcount", [(20, 8, 2), (16, 8, 4), (37, 6, 3)])
def test_dataloader_exact_partition(n, gb, pcount):
    from pantomatrix_tpu.data.beat2 import DataLoader

    ds = _IdxDataset(n)
    single = _epoch_batches(DataLoader(ds, gb, seed=3), epoch=1)
    shards = [
        _epoch_batches(DataLoader(ds, gb, seed=3, process_index=p, process_count=pcount),
                       epoch=1)
        for p in range(pcount)
    ]
    assert all(len(s) == len(single) for s in shards)
    for k, batch in enumerate(single):
        merged = np.concatenate([shards[p][k] for p in range(pcount)])
        # concat of process-local batches == the single-process global batch,
        # row-for-row (this is what makes per-device placement identical)
        np.testing.assert_array_equal(merged, batch)
        # and the shards are pairwise disjoint
        for p in range(pcount):
            for q in range(p + 1, pcount):
                assert not set(shards[p][k]) & set(shards[q][k])


@pytest.mark.parametrize("n,gb,pcount", [(3, 8, 2), (6, 8, 2), (5, 4, 4), (11, 8, 2)])
def test_dataloader_pad_smaller_than_global_batch(n, gb, pcount):
    """drop_last=False wrap-around pad must tile the index stream as many times
    as needed — datasets smaller than one global batch included (regression:
    a single-wrap pad raised ValueError on reshape)."""
    from pantomatrix_tpu.data.beat2 import DataLoader

    seen = []
    for p in range(pcount):
        dl = DataLoader(_IdxDataset(n), gb, shuffle=False, process_index=p,
                        process_count=pcount, drop_last=False)
        for batch in _epoch_batches(dl):
            assert len(batch) == gb // pcount
            seen.extend(batch.tolist())
    # every dataset element appears at least once across the processes
    assert set(range(n)) <= set(seen)


def test_dataloader_epoch_reshuffles_consistently():
    from pantomatrix_tpu.data.beat2 import DataLoader

    ds = _IdxDataset(24)
    e0 = np.concatenate(_epoch_batches(DataLoader(ds, 8), epoch=0))
    e1 = np.concatenate(_epoch_batches(DataLoader(ds, 8), epoch=1))
    assert not np.array_equal(e0, e1)  # set_epoch reseeds
    # every process sees the SAME epoch permutation (disjointness depends on it)
    p0 = np.concatenate(_epoch_batches(DataLoader(ds, 8, process_index=0,
                                                  process_count=2), epoch=1))
    p1 = np.concatenate(_epoch_batches(DataLoader(ds, 8, process_index=1,
                                                  process_count=2), epoch=1))
    merged = np.stack([p0.reshape(-1, 4), p1.reshape(-1, 4)], 1).reshape(-1)
    np.testing.assert_array_equal(merged, e1)


def test_dataloader_rejects_indivisible_batch():
    from pantomatrix_tpu.data.beat2 import DataLoader

    with pytest.raises(ValueError, match="divide evenly"):
        DataLoader(_IdxDataset(8), 7, process_count=2)


def test_weighted_loader_exact_partition():
    from pantomatrix_tpu.cli.train_disco import _WeightedLoader

    ds = _IdxDataset(30)
    single = _epoch_batches(_WeightedLoader(ds, 6), epoch=2)
    shards = [
        _epoch_batches(_WeightedLoader(ds, 6, process_index=p, process_count=2),
                       epoch=2)
        for p in range(2)
    ]
    assert len(single) == len(shards[0]) == len(shards[1]) == 5
    for k, batch in enumerate(single):
        np.testing.assert_array_equal(
            np.concatenate([shards[0][k], shards[1][k]]), batch
        )


# ---------------------------------------------------------------------------
# two real processes, gloo collectives, bitwise-equal final params
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mp_beat2(tmp_path_factory):
    """16 train clips (2 windows x 8 synthetic videos) + 2 test clips: enough for
    two global batches of 8 per epoch."""
    root = tmp_path_factory.mktemp("mp_beat2")
    (root / "smplxflame_30").mkdir()
    (root / "footcontact").mkdir()
    (root / "wave16k").mkdir()
    rng = np.random.RandomState(7)
    train, test = [], []
    for v in range(8):
        vid = f"2_mp_0_{v}_{v}"
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
        for start in (0, 8):
            meta = {
                "video_id": vid, "mode": "train",
                "motion_path": str(root / "smplxflame_30" / f"{vid}.npz"),
                "audio_path": str(root / "wave16k" / f"{vid}.wav"),
                "start_idx": start, "end_idx": start + 32,
            }
            train.append(meta)
        if v < 2:
            test.append({**train[-1], "mode": "test"})
    train_meta = root / "meta_train.json"
    train_meta.write_text(json.dumps(train))
    test_meta = root / "meta_test.json"
    test_meta.write_text(json.dumps(test))
    return str(train_meta), str(test_meta)


def _emage_argv(train_meta, test_meta, outdir):
    """4 train steps fused 2-per-dispatch + one full test pass at step 4 — the
    smallest run that exercises make_multi_step, the val/test flow's
    local_params pull, and best-test checkpointing under multi-process."""
    return [
        "--random_vq", "--evaluation",
        f"data.meta_paths=['{train_meta}']",
        f"data.test_meta_paths=['{test_meta}']",
        "data.train_bs=8",
        f"output_dir={outdir}",
        "log_period=2",
        "solver.max_train_steps=4",
        "solver.steps_per_dispatch=2",
        "solver.optimizer=sgd",
        # bf16 (the shipped default) has 8-bit-mantissa ulps — last-ulp
        # reduction-order differences between the gloo and single-process
        # compilations would swamp the 1e-5 bounds below; pin f32
        "solver.compute_dtype=float32",
        "validation.validation_steps=4",
        "validation.test_steps=4",
        "model.hidden_size=32", "model.n_layer=1", "model.dropout_prob=0.0",
        "model.audio_f=32", "model.motion_f=16", "model.speaker_dims=4",
        "model.pose_length=32", "model.seed_frames=4",
        "model.vae_codebook_size=256", "model.vae_length=256",
    ]


def _launch(argv, n_devices, extra_env, log_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.update(extra_env)
    log = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_mp_train_worker.py"),
         "emage", *argv],
        env=env, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
    ), log


def _last_ckpt_params(outdir):
    exps = os.listdir(outdir)
    assert len(exps) == 1, exps
    path = os.path.join(outdir, exps[0], "ckpt", "last", "model.safetensors")
    assert os.path.exists(path), f"missing {path}"
    from safetensors.numpy import load_file

    return path, load_file(path)


def test_two_process_train_bitwise_equals_single_process(mp_beat2, tmp_path):
    train_meta, test_meta = mp_beat2
    out_single = str(tmp_path / "single")
    out_p0 = str(tmp_path / "proc0")
    out_p1 = str(tmp_path / "proc1")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    mp_env = {
        "PANTO_COORDINATOR": f"localhost:{port}",
        "PANTO_NUM_PROCESSES": "2",
    }
    procs = [
        _launch(_emage_argv(train_meta, test_meta, out_single), 8, {},
                tmp_path / "single.log"),
        _launch(_emage_argv(train_meta, test_meta, out_p0), 4,
                {**mp_env, "PANTO_PROCESS_ID": "0"}, tmp_path / "p0.log"),
        _launch(_emage_argv(train_meta, test_meta, out_p1), 4,
                {**mp_env, "PANTO_PROCESS_ID": "1"}, tmp_path / "p1.log"),
    ]
    try:
        for p, log in procs:
            rc = p.wait(timeout=1500)
            log.close()
    finally:
        for p, log in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for name in ("single", "p0", "p1"):
        txt = open(tmp_path / f"{name}.log").read()
        assert "WORKER_DONE" in txt, f"{name} failed:\n{txt[-4000:]}"

    # the two programs are mathematically identical (DDP parity): loss
    # trajectories agree to float32 ulps...
    loss_s, loss_0 = (
        [json.loads(l) for l in open(os.path.join(
            outdir, os.listdir(outdir)[0], "metrics.jsonl"))]
        for outdir in (out_single, out_p0)
    )
    assert [l["step"] for l in loss_s] == [l["step"] for l in loss_0]
    for ls, l0 in zip(loss_s, loss_0):
        for k in ls:
            if k != "step" and np.isfinite(ls[k]):
                np.testing.assert_allclose(ls[k], l0[k], rtol=1e-5, err_msg=k)

    # ...and the SGD-trained params agree to ulp accumulation (reduction order
    # differs between the gloo-collective and single-process compilations)
    path_s, single = _last_ckpt_params(out_single)
    path_0, proc0 = _last_ckpt_params(out_p0)
    assert single.keys() == proc0.keys()
    for k in single:
        np.testing.assert_allclose(
            single[k], proc0[k], atol=1e-6, rtol=1e-5,
            err_msg=f"{k} ({path_s} vs {path_0})",
        )
    # rank-1 must NOT write checkpoints (rank-0 parity, train_emage_audio.py:320)
    exps1 = os.listdir(out_p1)
    assert not any(
        os.path.exists(os.path.join(out_p1, e, "ckpt", "last.bin")) for e in exps1
    )
    # the test pass ran on rank 0 and recorded embedder provenance
    exp0 = os.listdir(out_p0)[0]
    mpath = os.path.join(out_p0, exp0, "test_4", "metrics.json")
    assert os.path.exists(mpath)
    assert json.load(open(mpath))["fgd_embedder"] == "stats"


def test_two_process_fsdp_equals_single_process_fsdp(mp_beat2, tmp_path):
    """FSDP/ZeRO-3 across REAL processes (VERDICT r3 #3): 2 processes x 4 devices
    with a (4, 2) ("data","model") mesh must train to the same params as ONE
    process x 8 devices with the identical mesh shape. Exercises the
    multi-process shard_tree_fsdp placement (make_array_from_callback), the
    collective gather_replicated in the val/test/final checkpoint paths, and
    rank-0-only writes of all-gathered weights."""
    train_meta, test_meta = mp_beat2
    out_single = str(tmp_path / "single_fsdp")
    out_p0 = str(tmp_path / "proc0_fsdp")
    out_p1 = str(tmp_path / "proc1_fsdp")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    argv = _emage_argv(train_meta, test_meta, "PLACEHOLDER")
    argv = [a for a in argv if not a.startswith("output_dir=")]
    argv += ["solver.fsdp_model_axis=2"]

    mp_env = {
        "PANTO_COORDINATOR": f"localhost:{port}",
        "PANTO_NUM_PROCESSES": "2",
    }
    procs = [
        _launch(argv + [f"output_dir={out_single}"], 8, {},
                tmp_path / "single_fsdp.log"),
        _launch(argv + [f"output_dir={out_p0}"], 4,
                {**mp_env, "PANTO_PROCESS_ID": "0"}, tmp_path / "p0_fsdp.log"),
        _launch(argv + [f"output_dir={out_p1}"], 4,
                {**mp_env, "PANTO_PROCESS_ID": "1"}, tmp_path / "p1_fsdp.log"),
    ]
    try:
        for p, log in procs:
            p.wait(timeout=1500)
            log.close()
    finally:
        for p, log in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for name in ("single_fsdp", "p0_fsdp", "p1_fsdp"):
        txt = open(tmp_path / f"{name}.log").read()
        assert "WORKER_DONE" in txt, f"{name} failed:\n{txt[-4000:]}"

    # both jobs run the SAME (4, 2) GSPMD partitioning, so contraction order
    # matches shard-for-shard; only the cross-process collective transport
    # differs (gloo vs in-process) — last-ulp bounds like the DP test
    path_s, single = _last_ckpt_params(out_single)
    path_0, proc0 = _last_ckpt_params(out_p0)
    assert single.keys() == proc0.keys()
    for k in single:
        np.testing.assert_allclose(
            single[k], proc0[k], atol=2e-6, rtol=1e-5,
            err_msg=f"{k} ({path_s} vs {path_0})",
        )
    # rank-1 must not write checkpoints; rank-0's exist (the all-gathered save)
    exps1 = os.listdir(out_p1)
    assert not any(
        os.path.exists(os.path.join(out_p1, e, "ckpt", "last.bin")) for e in exps1
    )
