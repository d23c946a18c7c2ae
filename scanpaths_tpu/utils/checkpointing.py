"""Checkpoint management (reference AiR/utils/checkpointing.py:9-113).

Same triad semantics as the reference:
* ``checkpoint.msgpack``       — model + optimizer, written on EVERY
  ``step(metric)`` call (the resume checkpoint);
* ``checkpoint_best.msgpack``  — model only, written when the tracked
  metric improves under the configured mode;
* the pre-RL ``<logdir>_supervised_save`` copy is made by the trainer.

Serialization is flax msgpack over the (params, batch_stats, opt_state)
pytrees — single-file, atomic via temp+rename.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Any

from flax import serialization


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_pytree(path: str, tree: Any):
    _atomic_write(path, serialization.to_bytes(tree))


def restore_pytree(path: str, like: Any):
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


class CheckpointManager:
    def __init__(self, serialization_dir: str, mode: str = "max",
                 best_metric=None, filename_prefix: str = "checkpoint"):
        assert mode in ("min", "max")
        self._dir = serialization_dir
        self._mode = mode
        self._prefix = filename_prefix
        self._best_metric = best_metric
        os.makedirs(serialization_dir, exist_ok=True)

    def step(self, metric: float, model_state: Any, opt_state: Any = None):
        """Serialize the rolling checkpoint; update the best checkpoint
        if ``metric`` improves (ties count as improvement, like the
        reference's <=/>=; a falsy initial best adopts the first metric,
        reference checkpointing.py:83-84)."""
        save_pytree(join(self._dir, f"{self._prefix}.msgpack"),
                    {"model": model_state, "optimizer": opt_state})
        if not self._best_metric:
            self._best_metric = metric
        improved = (metric <= self._best_metric if self._mode == "min"
                    else metric >= self._best_metric)
        if improved:
            self._best_metric = metric
            save_pytree(join(self._dir, f"{self._prefix}_best.msgpack"),
                        {"model": model_state})

    def get_best_metric(self):
        return self._best_metric

    def restore(self, like_model: Any, like_opt: Any):
        return restore_pytree(join(self._dir, f"{self._prefix}.msgpack"),
                              {"model": like_model, "optimizer": like_opt})

    def restore_best(self, like_model: Any):
        return restore_pytree(
            join(self._dir, f"{self._prefix}_best.msgpack"),
            {"model": like_model})["model"]
