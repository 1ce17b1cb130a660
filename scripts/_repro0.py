"""Replay DisCo training from FRESH INIT (step 0 -> 550) with the deterministic
stream; compare logged 50-step rows vs the original full run's metrics.jsonl and
the state@500 vs its best.bin checkpoint. Discriminates checkpoint-save corruption
from original-process divergence."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pantomatrix_tpu.utils.config import load_config
from pantomatrix_tpu.models.configs import DiscoAudioConfig
from pantomatrix_tpu.models.disco import init_disco
from pantomatrix_tpu.train.optim import make_optimizer
from pantomatrix_tpu.train.steps import init_opt_state, make_disco_train_step, make_multi_step
from pantomatrix_tpu.train.mesh import make_train_mesh, shard_batch
from pantomatrix_tpu.data.beat2 import BEAT2Dataset
from pantomatrix_tpu.cli.train_disco import _WeightedLoader

cfg = load_config("/root/repo/pantomatrix_tpu/configs/disco_audio.yaml")
model_cfg = DiscoAudioConfig.from_dict(cfg.model.to_dict())
params = jax.jit(lambda k: init_disco(k, model_cfg))(jax.random.PRNGKey(cfg.seed))
mesh = make_train_mesh(64, 1)
opt = make_optimizer(learning_rate=float(cfg.solver.learning_rate),
                     max_grad_norm=float(cfg.solver.max_grad_norm),
                     lr_scheduler=cfg.solver.lr_scheduler,
                     warmup_steps=0, total_steps=14500)
step = make_disco_train_step(model_cfg, opt, mesh, compute_dtype="bfloat16")
opt_state = init_opt_state(opt, params)
ds = BEAT2Dataset(["/root/repo/datasets/synth_beat2/data_json/beat2_s20_l128_speaker2_disco.json"],
                  "train", model_cfg.pose_fps, model_cfg.audio_sr,
                  model_cfg.joint_mask, variant="disco")
loader = _WeightedLoader(ds, 64, seed=cfg.seed)
k = 10
multi = make_multi_step(step, k)
rng = jax.random.PRNGKey(cfg.seed)

def stream():
    e = 0
    while True:
        loader.set_epoch(e)
        for b in loader:
            yield shard_batch(b, mesh)
        e += 1

st = stream()
import jax.tree_util as jtu
stack = jax.jit(lambda *c: jtu.tree_map(lambda *xs: jnp.stack(xs), *c))
sums, cnt = {}, 0
p, o = params, opt_state
snap500 = None
it = 0
for d in range(55):  # 550 steps
    chunk = [next(st) for _ in range(k)]
    batch = stack(*chunk)
    p, o, L = multi(p, o, batch, rng, jnp.asarray(it, jnp.int32))
    it += k
    for kk, v in L.items():
        sums[kk] = sums.get(kk, 0.0) + float(np.asarray(v).sum())
    cnt += k
    if it % 50 == 0:
        print("step", it, {kk: round(v / cnt, 4) for kk, v in sums.items()}, flush=True)
        sums, cnt = {}, 0
    if it == 500:
        snap500 = jtu.tree_map(np.asarray, p)

from safetensors.numpy import load_file
flat = load_file("/root/repo/outputs/full_runs/disco_full_r4_20260819_000610/ckpt/best.bin")
leaves = jtu.tree_leaves(snap500)
diffs = [float(np.max(np.abs(flat[f"model.{i:05d}"] - leaf))) for i, leaf in enumerate(leaves)]
print("replayed state@500 vs best.bin: max leaf diff =", max(diffs), flush=True)
order = np.argsort(diffs)[::-1][:8]
for i in order:
    print(f"  leaf {i:03d} shape {leaves[i].shape} diff {diffs[i]:.6g}")
