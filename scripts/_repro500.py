import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pantomatrix_tpu.utils.config import load_config
from pantomatrix_tpu.models.configs import DiscoAudioConfig
from pantomatrix_tpu.models.disco import init_disco
from pantomatrix_tpu.train.optim import make_optimizer
from pantomatrix_tpu.train.steps import init_opt_state, make_disco_train_step, make_multi_step
from pantomatrix_tpu.train.ckpt import load_train_state
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
p, o, it, _ = load_train_state(
    "/root/repo/outputs/full_runs/disco_full_r4_20260819_000610/ckpt/best.bin", params, opt_state)
print("ckpt iteration:", it, flush=True)
ds = BEAT2Dataset(["/root/repo/datasets/synth_beat2/data_json/beat2_s20_l128_speaker2_disco.json"],
                  "train", model_cfg.pose_fps, model_cfg.audio_sr,
                  model_cfg.joint_mask, variant="disco")
loader = _WeightedLoader(ds, 64, seed=cfg.seed)
spe = len(loader)
epoch, skip = it // spe, it % spe
k = 10
multi = make_multi_step(step, k)
rng = jax.random.PRNGKey(cfg.seed)

def stream():
    e, s = epoch, skip
    while True:
        loader.set_epoch(e)
        for i, b in enumerate(loader):
            if i < s: continue
            yield shard_batch(b, mesh)
        s = 0; e += 1

st = stream()
import jax.tree_util as jtu
stack = jax.jit(lambda *c: jtu.tree_map(lambda *xs: jnp.stack(xs), *c))
sums, cnt = {}, 0
snap1000 = None
for d in range(55):  # 550 steps: 500 -> 1050
    chunk = [next(st) for _ in range(k)]
    batch = stack(*chunk)
    p, o, L = multi(p, o, batch, rng, jnp.asarray(it + d*k, jnp.int32))
    for kk, v in L.items():
        sums[kk] = sums.get(kk, 0.0) + float(np.asarray(v).sum())
    cnt += k
    gstep = it + (d+1)*k
    if gstep % 50 == 0:
        print("step", gstep, {kk: round(v/cnt, 4) for kk, v in sums.items()}, flush=True)
        sums, cnt = {}, 0
    if gstep == 1000:
        snap1000 = jtu.tree_map(np.asarray, p)

# bitwise compare snap1000 vs last.bin params
from safetensors.numpy import load_file
flat = load_file("/root/repo/outputs/full_runs/disco_full_r4_20260819_000610/ckpt/last.bin")
leaves = jtu.tree_leaves(snap1000)
diffs = []
for i, leaf in enumerate(leaves):
    ref = flat[f"model.{i:05d}"]
    diffs.append(float(np.max(np.abs(ref - leaf))))
print("state@1000 vs last.bin: max leaf diff =", max(diffs), flush=True)
