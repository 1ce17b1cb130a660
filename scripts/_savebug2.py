"""Enhanced save-integrity probe: after ONE fused dispatch, compare
(1) live pull A vs the file's raw tensors (save integrity),
(2) A vs load_train_state result (load integrity),
(3) dtypes everywhere. Platform chosen by SAVEBUG_PLATFORM (cpu default)."""
import os, sys
sys.path.insert(0, "/root/repo")
plat = os.environ.get("SAVEBUG_PLATFORM", "cpu")
import jax
if plat == "cpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import jax.tree_util as jtu
from pantomatrix_tpu.utils.config import load_config
from pantomatrix_tpu.models.configs import DiscoAudioConfig
from pantomatrix_tpu.models.disco import init_disco, disco_forward
from pantomatrix_tpu.train.optim import make_optimizer
from pantomatrix_tpu.train.steps import init_opt_state, make_disco_train_step, make_multi_step
from pantomatrix_tpu.train.ckpt import BestKeeper, load_train_state
from pantomatrix_tpu.train.mesh import make_train_mesh, shard_batch
from pantomatrix_tpu.data.beat2 import BEAT2Dataset
from pantomatrix_tpu.cli.train_disco import _WeightedLoader

cfg = load_config("/root/repo/pantomatrix_tpu/configs/disco_audio.yaml")
model_cfg = DiscoAudioConfig.from_dict(cfg.model.to_dict())
params = jax.jit(lambda k: init_disco(k, model_cfg))(jax.random.PRNGKey(cfg.seed))
bs = 64 if plat != "cpu" else 8
mesh = make_train_mesh(bs, 1)
opt = make_optimizer(learning_rate=3e-4, max_grad_norm=0.99, lr_scheduler="constant",
                     warmup_steps=0, total_steps=14500)
step = make_disco_train_step(model_cfg, opt, mesh, compute_dtype="bfloat16")
opt_state = init_opt_state(opt, params)
ds = BEAT2Dataset(["/root/repo/datasets/synth_beat2/data_json/beat2_s20_l128_speaker2_disco.json"],
                  "train", model_cfg.pose_fps, model_cfg.audio_sr,
                  model_cfg.joint_mask, variant="disco")
loader = _WeightedLoader(ds, bs, seed=cfg.seed)
loader.set_epoch(0)
b0 = shard_batch(next(iter(loader)), mesh)
k = 10
multi = make_multi_step(step, k)
stack = jax.jit(lambda *c: jtu.tree_map(lambda *xs: jnp.stack(xs), *c))
batch = stack(*([b0] * k))
rng = jax.random.PRNGKey(cfg.seed)

import shutil
ckdir = "/tmp/savebug2_ckpt"
shutil.rmtree(ckdir, ignore_errors=True)
keeper = BestKeeper(ckdir, model_cfg)

p, o = params, opt_state
p, o, L = multi(p, o, batch, rng, jnp.asarray(0, jnp.int32))
A = jtu.tree_map(np.asarray, p)
keeper.update(1.0, p, o, 10)

from safetensors.numpy import load_file
flat = load_file(os.path.join(ckdir, "last.bin"))
leavesA = jtu.tree_leaves(A)
bad = []
for i, leaf in enumerate(leavesA):
    f = flat[f"model.{i:05d}"]
    d = float(np.max(np.abs(f - leaf))) if np.size(leaf) else 0.0
    if d > 0:
        bad.append((i, np.shape(leaf), leaf.dtype, f.dtype, d))
print(f"file-vs-live: {len(bad)} bad leaves of {len(leavesA)}", flush=True)
for row in bad[:10]:
    print("  ", row)
# re-init templates for load (params/opt_state were donated by the dispatch)
params_t = jax.jit(lambda kk: init_disco(kk, model_cfg))(jax.random.PRNGKey(cfg.seed))
opt_t = init_opt_state(opt, params_t)
lp, lo, it, _ = load_train_state(os.path.join(ckdir, "last.bin"), params_t, opt_t)
dm = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) if np.size(a) else 0.0
         for a, b in zip(leavesA, jtu.tree_leaves(lp)))
print("load-vs-live max diff:", dm, flush=True)
print("dtypes live:", sorted({str(x.dtype) for x in leavesA}),
      "file:", sorted({str(v.dtype) for v in flat.values()}), flush=True)
