"""Save-integrity probe on the real chip: does BestKeeper.update write the live
in-memory train state, bit-for-bit? Replicates the full-budget run's structure
(full-size DisCo, bs64, bf16, k=10 fused dispatches, donation, a val-like jitted
read before each save) but feeds ONE real batch repeatedly so device time, not the
host loader, dominates. At every 'val boundary' (500 steps): pull params twice
(transfer determinism), save last/best + HF export via the REAL BestKeeper, reload,
and compare everything bitwise."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
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
loader.set_epoch(0)
b0 = shard_batch(next(iter(loader)), mesh)
k = 10
multi = make_multi_step(step, k)
stack = jax.jit(lambda *c: jtu.tree_map(lambda *xs: jnp.stack(xs), *c))
batch = stack(*([b0] * k))
rng = jax.random.PRNGKey(cfg.seed)

# val-like read: a jitted forward on the live params (predict_jit analogue)
fwd = jax.jit(lambda p, a: disco_forward(p, model_cfg, a, jnp.zeros((64, 1), jnp.int32),
                                         model_cfg.seed_frames))
import os, shutil
ckdir = "/tmp/savebug_ckpt"
shutil.rmtree(ckdir, ignore_errors=True)
keeper = BestKeeper(ckdir, model_cfg)

def maxdiff(a_tree, b_tree):
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               if np.size(x) else 0.0
               for x, y in zip(jtu.tree_leaves(a_tree), jtu.tree_leaves(b_tree)))

p, o = params, opt_state
it = 0
for d in range(100):  # 1000 steps
    p, o, L = multi(p, o, batch, rng, jnp.asarray(it, jnp.int32))
    it += k
    if it % 500 == 0:
        _ = jax.block_until_ready(fwd(p, b0["audio"]))  # val-like read
        A = jtu.tree_map(np.asarray, p)
        B = jtu.tree_map(np.asarray, p)
        print(f"step {it}: pull-twice max diff = {maxdiff(A, B)}", flush=True)
        keeper.update(float(it), p, o, it)
        lp, lo, li, _ = load_train_state(os.path.join(ckdir, "last.bin"), params, opt_state)
        print(f"step {it}: file-vs-live max diff = {maxdiff(A, lp)} (iter {li})", flush=True)
        print(f"step {it}: loss={float(np.asarray(L['all_loss']).mean()):.4f}", flush=True)
print("done", flush=True)
