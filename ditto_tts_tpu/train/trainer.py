"""Training harness: epoch loop, history, checkpointing, resume.

Capability parity with the reference Trainer (ref: src/utils/Trainer.py:
7-227 — builder-pattern fit with custom train/validate closures, interval
checkpointing, resume, history-in-checkpoint) with corrected semantics:

  * best model tracked by MIN validation loss (reference initialized
    best_loss = 0 so best_model was only set on losses <= 0 — quirk #10)
  * checkpoints are pickle-free .npz (train/checkpoint.py)
  * metrics stream to a JSONL log in addition to the in-memory history

The step functions are the jitted builders from train/steps.py; the data
iterator yields ready device batches (data/mls.py). Epoch-level logic stays
in Python — everything per-step is inside jit.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import numpy as np
import jax

from .checkpoint import (latest_checkpoint, restore_into,
                         save_checkpoint)


class Trainer:
    def __init__(self, step_fn: Callable, eval_fn: Optional[Callable] = None,
                 *, jit: bool = True, donate_state: bool = True):
        if jit:
            step_fn = jax.jit(step_fn,
                              donate_argnums=(0,) if donate_state else ())
            if eval_fn is not None:
                eval_fn = jax.jit(eval_fn)
        self.step_fn = step_fn
        self.eval_fn = eval_fn
        self.history: Dict = {
            "params": {"lr": None, "epochs": None, "model_name": None},
            "train": {"loss": [], "metrics": []},
            "validation": {"loss": [], "metrics": []},
        }

    def fit(self, state, frozen, train_batches: Callable[[], Iterable],
            val_batches: Optional[Callable[[], Iterable]] = None, *,
            epochs: int = 1, key, model_name: str = "model",
            learning_rate: Optional[float] = None,
            checkpoint_dir: str = "checkpoints",
            checkpoint_interval: int = 5, resume: bool = True,
            log_path: Optional[str] = None, verbose: bool = True,
            shard_state: Optional[Callable] = None):
        self.history["params"].update(
            {"lr": learning_rate, "epochs": epochs, "model_name": model_name})

        start_epoch = 0
        if resume:
            ckpt = latest_checkpoint(checkpoint_dir, prefix=model_name)
            if ckpt is not None:
                state, meta = self._load(ckpt, state)
                if shard_state is not None:
                    # restore_into yields host arrays; re-place them with
                    # the caller's mesh shardings (TP/DP training)
                    state = shard_state(state)
                if meta:
                    start_epoch = int(meta.get("epoch", 0))
                    self.history = meta.get("history", self.history)
                if verbose:
                    print(f"[trainer] resumed from {ckpt} "
                          f"at epoch {start_epoch}")

        best_loss = float("inf")
        best_path = None
        log_f = open(log_path, "a") if log_path else None
        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                key, k_epoch = jax.random.split(key)
                state, train_metrics = self._run_epoch(
                    state, frozen, train_batches(), k_epoch, train=True)
                val_metrics = {}
                if val_batches is not None and self.eval_fn is not None:
                    key, k_val = jax.random.split(key)
                    _, val_metrics = self._run_epoch(
                        state, frozen, val_batches(), k_val, train=False)

                self.history["train"]["loss"].append(
                    train_metrics.get("loss"))
                self.history["train"]["metrics"].append(train_metrics)
                self.history["validation"]["loss"].append(
                    val_metrics.get("loss"))
                self.history["validation"]["metrics"].append(val_metrics)

                if log_f:
                    log_f.write(json.dumps(
                        {"epoch": epoch + 1, "train": train_metrics,
                         "val": val_metrics,
                         "seconds": round(time.time() - t0, 2)}) + "\n")
                    log_f.flush()
                if verbose:
                    print(f"[trainer] epoch {epoch + 1}: "
                          f"train {train_metrics} val {val_metrics} "
                          f"({time.time() - t0:.1f}s)")

                vloss = val_metrics.get("loss")
                if vloss is not None and vloss < best_loss:
                    # best state lives on disk, not as a second in-memory
                    # copy of the full train state (device memory)
                    best_loss = vloss
                    best_path = self._save(checkpoint_dir, model_name,
                                           "best", state)

                if (epoch + 1) % checkpoint_interval == 0:
                    self._save(checkpoint_dir, model_name, epoch + 1, state)
        finally:
            if log_f:
                log_f.close()

        final = state if best_path is None else \
            restore_into(state, best_path)
        if best_path is not None and shard_state is not None:
            final = shard_state(final)
        self._save(checkpoint_dir, model_name, "final", final)
        return final, self.history

    # ------------------------------------------------------------------

    def _run_epoch(self, state, frozen, batches, key, *, train: bool):
        # Metric sums accumulate as DEVICE scalars — no float()/host sync
        # inside the batch loop (a per-step device->host round-trip would
        # serialize the async dispatch stream and throttle TPU training);
        # one transfer happens at epoch end.
        sums: Optional[Dict] = None
        count = 0
        for batch in batches:
            key, k_step = jax.random.split(key)
            if train:
                state, metrics = self.step_fn(state, frozen, batch, k_step)
            else:
                metrics = self.eval_fn(state, frozen, batch, k_step)
            count += 1
            sums = metrics if sums is None else jax.tree.map(
                lambda a, b: a + b, sums, metrics)
        if sums is None:
            return state, {}
        return state, {k: float(v) / count for k, v in sums.items()}

    def _save(self, checkpoint_dir, model_name, epoch, state):
        tag = epoch if isinstance(epoch, str) else f"epoch_{epoch}"
        path = os.path.join(checkpoint_dir, f"{model_name}_{tag}.npz")
        meta = {"epoch": epoch if isinstance(epoch, int) else None,
                "history": _jsonable(self.history)}
        save_checkpoint(path, state, metadata=meta)
        return path

    def _load(self, path, like_state):
        # path-keyed restore: every stored array goes to the template leaf
        # with the same tree path; structural drift fails loudly instead of
        # silently mis-assigning weights (see checkpoint.restore_into)
        state = restore_into(like_state, path)
        meta = None
        meta_file = path[:-4] + ".json" if path.endswith(".npz") else \
            path + ".json"
        if os.path.exists(meta_file):
            with open(meta_file) as f:
                meta = json.load(f)
        return state, meta


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.floating, np.integer)):
        return float(x)
    return x
