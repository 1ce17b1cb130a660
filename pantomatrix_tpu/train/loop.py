"""Generic step-indexed training loop.

Parity with the shared harness behavior of the three reference trainers (SURVEY.md
§2.6): step-indexed loop to ``max_train_steps``, val every ``validation_steps``
(windowed FGD, best-checkpoint keeping), resume with intra-epoch fast-forward, running
loss meters, optional wandb.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ckpt import BestKeeper, load_train_state


def prefetch(iterable, fn, depth: int = 2):
    """Run ``fn`` (e.g. host decode + device_put) for upcoming items on a background
    thread so data preparation overlaps device compute (the reference gets this from
    torch DataLoader workers; train_emage_audio.py:275 num_workers=8)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterable:
                q.put(fn(item))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


class Meters:
    """Running-mean loss meters (tqdm-desc parity, train_emage_audio.py:504-519)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def update(self, losses: Dict[str, Any]) -> None:
        for k, v in losses.items():
            v = np.asarray(v, dtype=np.float64)  # scalar, or (k,) from a fused dispatch
            self.sums[k] = self.sums.get(k, 0.0) + float(v.sum())
            self.counts[k] = self.counts.get(k, 0) + int(v.size)

    def means(self) -> Dict[str, float]:
        return {k: self.sums[k] / self.counts[k] for k in self.sums}

    def reset(self) -> None:
        self.sums.clear()
        self.counts.clear()


@dataclass
class TrainLoopConfig:
    max_train_steps: int = 1000
    validation_steps: int = 500
    # every test_steps, run the full test pass (generate -> npz -> metrics) on the
    # main process and keep a `test_best/` HF checkpoint keyed on its FGD — the
    # reference's per-test_steps rank-0 block (train_emage_audio.py:320-329,:491).
    # 0 disables (also the effective default when no test_fn is supplied).
    test_steps: int = 0
    log_period: int = 50
    ckpt_dir: str = "./outputs/ckpt"
    resume_from_checkpoint: Optional[str] = None
    seed: int = 42
    wandb: bool = False
    # >1 fuses this many optimizer steps into ONE device program (lax.scan over the
    # raw step; train/steps.py make_multi_step): params/opt-state never return to the
    # host between the fused updates. Measured 20x step throughput on tunneled
    # single-chip setups (PROFILE.md); identical numerics to the sequential path.
    # Must divide log_period, validation_steps, and max_train_steps.
    steps_per_dispatch: int = 1


def run_training(
    loop_cfg: TrainLoopConfig,
    step_fn: Callable,
    params,
    opt_state,
    train_loader,
    place_batch: Callable[[dict], dict],
    val_fn: Optional[Callable] = None,
    model_config=None,
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    is_main_process: bool = True,
    test_fn: Optional[Callable] = None,
):
    """Run ``step_fn(params, opt_state, batch, rng, iteration)`` to max_train_steps.

    val_fn(params, iteration) -> metric (lower better), called every
    validation_steps (on EVERY process — it may contain collectives); best/last
    checkpoints are written by the main process only (rank-0 parity,
    train_emage_audio.py:320,337).

    test_fn(params, iteration) -> metric dict (lower-better "fgd" keys the
    test_best/ checkpoint), called every ``test_steps`` on the MAIN process only
    (the reference runs its full test pass rank-0, train_emage_audio.py:320).
    """
    iteration = 0
    best_test = float("inf")
    best_test_embedder = ""
    if loop_cfg.resume_from_checkpoint:
        params, opt_state, iteration, extra = load_train_state(
            loop_cfg.resume_from_checkpoint,
            params_template=params, opt_state_template=opt_state,
        )
        # re-place the restored host arrays the way the CLI placed the fresh
        # state: FSDP steps (param_placement="inherit") must resume SHARDED,
        # not silently replicated from uncommitted inputs. Replicated steps
        # need nothing — their in_shardings place host arrays as before.
        mesh = getattr(step_fn, "mesh", None)
        if (mesh is not None
                and getattr(step_fn, "param_placement", "replicated") == "inherit"):
            from .mesh import fsdp_enabled, place_train_state

            if fsdp_enabled(mesh):
                params, opt_state = place_train_state(params, opt_state, mesh)
        # without this the first post-resume test pass would displace test_best/
        # with arbitrarily worse weights (anything beats a fresh inf)
        best_test = float(extra.get("best_test", float("inf")))
        best_test_embedder = str(extra.get("best_test_embedder", ""))
        print(f"resumed from {loop_cfg.resume_from_checkpoint} at step {iteration}")

    if len(train_loader) == 0:
        raise ValueError(
            "train_loader yields no batches (dataset smaller than the batch size "
            "with drop_last) — the step loop would never advance"
        )
    keeper = BestKeeper(loop_cfg.ckpt_dir, model_config)

    # FSDP x multi-process: live params/opt leaves are sharded over devices other
    # processes own, so val/test/checkpoint paths (which pull leaves to host)
    # need an all-gathered replicated copy. The gather is a COLLECTIVE — it runs
    # on every process; only the host pulls stay rank-0. Identity elsewhere.
    _mesh = getattr(step_fn, "mesh", None)
    _needs_gather = False
    if _mesh is not None and jax.process_count() > 1:
        from .mesh import fsdp_enabled as _fsdp_enabled

        _needs_gather = (_fsdp_enabled(_mesh)
                         and getattr(step_fn, "param_placement", "") == "inherit")

    def eval_state(p, o=None):
        if not _needs_gather:
            return p, o
        from .mesh import gather_replicated

        return (gather_replicated(p, _mesh),
                None if o is None else gather_replicated(o, _mesh))

    rng = jax.random.PRNGKey(loop_cfg.seed)
    meters = Meters()
    steps_per_epoch = max(len(train_loader), 1)
    epoch = iteration // steps_per_epoch
    skip = iteration % steps_per_epoch  # deterministic resume (ref :313-317)

    k = loop_cfg.steps_per_dispatch
    multi_fn = None
    if k > 1:
        from .steps import make_multi_step

        checked = ["log_period", "validation_steps", "max_train_steps"]
        if loop_cfg.test_steps:
            checked.append("test_steps")
        for name in checked:
            if getattr(loop_cfg, name) % k:
                raise ValueError(
                    f"steps_per_dispatch={k} must divide {name}="
                    f"{getattr(loop_cfg, name)} so log/val/stop boundaries land "
                    "between fused dispatches"
                )
        if iteration % k:
            raise ValueError(
                f"resumed iteration {iteration} is not a multiple of "
                f"steps_per_dispatch={k} (checkpoints are written on val/stop "
                "boundaries, which are)"
            )
        multi_fn = make_multi_step(step_fn, k)
        # one device call per chunk: eager per-leaf jnp.stack would pay the
        # tunneled platform's per-op dispatch cost times the leaf count
        stack_fn = jax.jit(
            lambda *c: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *c)
        )

    def batch_stream():
        nonlocal epoch, skip
        while True:
            train_loader.set_epoch(epoch)
            for i, batch in enumerate(prefetch(train_loader, place_batch)):
                if i < skip:
                    continue
                yield batch
            skip = 0
            epoch += 1

    data_time = net_time = 0.0
    pending = []
    last_saved = -1
    stream = batch_stream()
    while iteration < loop_cfg.max_train_steps:
        # data time = how long the step loop actually blocks on the prefetch
        # queue (the reference's data_time, train_emage_audio.py:504-519)
        t0 = time.time()
        if multi_fn is not None:
            chunk = [next(stream) for _ in range(k)]
            batch = stack_fn(*chunk)
        else:
            batch = next(stream)
        data_time += time.time() - t0

        t0 = time.time()
        if multi_fn is not None:
            params, opt_state, losses = multi_fn(
                params, opt_state, batch, rng, jnp.asarray(iteration, jnp.int32)
            )
        else:
            params, opt_state, losses = step_fn(
                params, opt_state, batch, jax.random.fold_in(rng, iteration),
                jnp.asarray(float(iteration)),
            )
        iteration += k
        pending.append(losses)  # keep dispatch async; sync only at log_period
        if iteration % loop_cfg.log_period == 0:
            jax.block_until_ready(losses)
        net_time += time.time() - t0

        if iteration % loop_cfg.log_period == 0:
            for l in pending:
                meters.update(l)
            pending.clear()
            means = meters.means()
            if is_main_process:
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
                print(f"step {iteration}: {msg} "
                      f"(data {data_time:.1f}s net {net_time:.1f}s)")
                if log_fn:
                    log_fn(iteration, means)
            meters.reset()

        if val_fn is not None and iteration % loop_cfg.validation_steps == 0:
            eval_params, eval_opt = eval_state(params, opt_state)
            metric = float(val_fn(eval_params, iteration))
            # rank-uniform: the final-block eval_state at loop exit is gated on
            # last_saved != iteration, and eval_state is a COLLECTIVE under
            # multi-process FSDP — updating last_saved only on rank 0 would make
            # rank 0 skip the final gather while other ranks issue it (deadlock)
            last_saved = iteration
            if is_main_process:
                improved = keeper.update(metric, eval_params, eval_opt, iteration,
                                         extra={"best_test": best_test,
                                                "best_test_embedder": best_test_embedder})
                print(f"val @ {iteration}: metric={metric:.4f}"
                      + (" (new best)" if improved else ""))
                if log_fn:
                    log_fn(iteration, {"val/metric": metric})

        if (test_fn is not None and loop_cfg.test_steps
                and iteration % loop_cfg.test_steps == 0):
            # the gather is collective (all ranks); the test pass itself is rank-0
            # (guarded by indentation, not `continue`, so code appended after this
            # block still runs on every rank)
            test_params, _ = eval_state(params)
            if is_main_process:
                tmetrics = test_fn(test_params, iteration)
                msg = " ".join(
                    f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in sorted(tmetrics.items())
                )
                tmetric = float(tmetrics.get("fgd", float("inf")))
                # never mix FGD values from different embedders in best-test
                # selection: a stats-embedder number is incomparable to an
                # aeskconv one (eval/metrics.py FGD.embedder_kind)
                embedder = str(tmetrics.get("fgd_embedder", ""))
                if embedder != best_test_embedder:
                    # an unknown previous embedder ("" — e.g. a checkpoint resumed
                    # from before provenance was recorded) is just as incomparable
                    # as a known different one, so any finite best_test resets
                    if best_test != float("inf"):
                        print(f"test: fgd embedder changed "
                              f"{best_test_embedder!r} -> {embedder!r}; "
                              "resetting test_best tracking")
                        best_test = float("inf")
                    best_test_embedder = embedder
                if tmetric < best_test:
                    best_test = tmetric
                    from ..io.hf_checkpoint import save_checkpoint

                    save_checkpoint(os.path.join(loop_cfg.ckpt_dir, "test_best"),
                                    test_params, model_config)
                    msg += " (new test best)"
                print(f"test @ {iteration}: {msg}")
                if log_fn:
                    log_fn(iteration, {f"test/{k}": float(v)
                                       for k, v in tmetrics.items()
                                       if isinstance(v, (int, float))})

    if last_saved != iteration:
        # always persist the final params (inf metric never displaces the best);
        # the gather is collective, the write is rank-0
        final_params, final_opt = eval_state(params, opt_state)
        # force the collective on EVERY rank before anyone exits: an async
        # orphaned gather would otherwise let a rank-divergence bug pass silently
        jax.block_until_ready(final_params)
        if is_main_process:
            keeper.update(float("inf"), final_params, final_opt, iteration,
                          extra={"best_test": best_test,
                                 "best_test_embedder": best_test_embedder})
    return params, opt_state, iteration


__all__ = ["Meters", "TrainLoopConfig", "run_training"]
