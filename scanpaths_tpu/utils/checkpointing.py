"""Checkpoint management (reference AiR/utils/checkpointing.py:9-113).

Same triad semantics as the reference:
* ``checkpoint.msgpack``       — model + optimizer, written on EVERY
  ``step(metric)`` call (the resume checkpoint);
* ``checkpoint_best.msgpack``  — model only, written when the tracked
  metric improves under the configured mode;
* the pre-RL ``<logdir>_supervised_save`` copy is made by the trainer.

Two interchangeable backends behind the same manager API:
* ``msgpack`` (default) — flax msgpack over the (params, batch_stats,
  opt_state) pytrees; single-file, atomic via temp+rename, synchronous.
* ``orbax``  — orbax.checkpoint with ASYNC saves: ``step()`` enqueues
  the serialization and returns so the next train step overlaps the
  checkpoint write (the classic TPU pattern); ``wait()`` blocks until
  all enqueued writes have landed (the trainer calls it before the
  ``supervised_save`` directory copy and at the end of ``fit``).

``restore_checkpoint`` / ``restore_best_checkpoint`` auto-detect which
backend wrote a checkpoints directory, so ``--resume_dir`` and the test
drivers work regardless of which backend the run was trained with.
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

    def wait(self):
        """Msgpack saves are synchronous; nothing to wait for."""

    def restore(self, like_model: Any, like_opt: Any):
        return restore_pytree(join(self._dir, f"{self._prefix}.msgpack"),
                              {"model": like_model, "optimizer": like_opt})

    def restore_best(self, like_model: Any):
        return restore_pytree(
            join(self._dir, f"{self._prefix}_best.msgpack"),
            {"model": like_model})["model"]


class OrbaxCheckpointManager:
    """Same triad/best semantics as :class:`CheckpointManager`, saved
    through orbax's async checkpointer: ``step()`` returns as soon as
    the pytree is snapshotted and the write proceeds in background
    threads, overlapping the next train steps.  Layout:
    ``<dir>/checkpoint.orbax`` (model + optimizer, every step) and
    ``<dir>/checkpoint_best.orbax`` (model only, on improvement)."""

    def __init__(self, serialization_dir: str, mode: str = "max",
                 best_metric=None, filename_prefix: str = "checkpoint"):
        assert mode in ("min", "max")
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._dir = os.path.abspath(serialization_dir)
        self._mode = mode
        self._prefix = filename_prefix
        self._best_metric = best_metric
        os.makedirs(self._dir, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def step(self, metric: float, model_state: Any, opt_state: Any = None):
        """Reference semantics (checkpointing.py:79-110): rolling save
        every call; best save when the metric improves, ties improving,
        a falsy initial best adopting the first metric."""
        ocp = self._ocp
        # one in-flight save at a time: orbax snapshots the arrays up
        # front, so waiting here only throttles back-to-back epochs,
        # never corrupts
        self._ckptr.wait_until_finished()
        self._ckptr.save(join(self._dir, f"{self._prefix}.orbax"),
                         args=ocp.args.PyTreeSave(
                             {"model": model_state, "optimizer": opt_state}),
                         force=True)
        if not self._best_metric:
            self._best_metric = metric
        improved = (metric <= self._best_metric if self._mode == "min"
                    else metric >= self._best_metric)
        if improved:
            self._best_metric = metric
            self._ckptr.wait_until_finished()
            self._ckptr.save(join(self._dir, f"{self._prefix}_best.orbax"),
                             args=ocp.args.PyTreeSave({"model": model_state}),
                             force=True)

    def get_best_metric(self):
        return self._best_metric

    def wait(self):
        """Block until every enqueued async write has landed on disk
        (call before copying/reading the checkpoints dir or exiting)."""
        self._ckptr.wait_until_finished()

    def _restore(self, name: str, like: Any):
        ocp = self._ocp
        self.wait()
        restore_args = ocp.checkpoint_utils.construct_restore_args(like)
        return self._ckptr.restore(
            join(self._dir, name),
            args=ocp.args.PyTreeRestore(item=like,
                                        restore_args=restore_args))

    def restore(self, like_model: Any, like_opt: Any):
        return self._restore(f"{self._prefix}.orbax",
                             {"model": like_model, "optimizer": like_opt})

    def restore_best(self, like_model: Any):
        return self._restore(f"{self._prefix}_best.orbax",
                             {"model": like_model})["model"]


def make_checkpoint_manager(serialization_dir: str, mode: str = "max",
                            best_metric=None, backend: str = "msgpack"):
    """Factory over the two backends (``--ckpt_backend``)."""
    if backend == "orbax":
        return OrbaxCheckpointManager(serialization_dir, mode=mode,
                                      best_metric=best_metric)
    assert backend == "msgpack", f"unknown checkpoint backend {backend!r}"
    return CheckpointManager(serialization_dir, mode=mode,
                             best_metric=best_metric)


def detect_backend(checkpoints_dir: str,
                   filename_prefix: str = "checkpoint") -> str:
    """Which backend wrote this directory? (msgpack when ambiguous/empty
    — the historical default.)"""
    if (os.path.isdir(join(checkpoints_dir, f"{filename_prefix}.orbax"))
            or os.path.isdir(join(checkpoints_dir,
                                  f"{filename_prefix}_best.orbax"))):
        if not (os.path.exists(join(checkpoints_dir,
                                    f"{filename_prefix}.msgpack"))
                or os.path.exists(join(checkpoints_dir,
                                       f"{filename_prefix}_best.msgpack"))):
            return "orbax"
    return "msgpack"


def restore_checkpoint(checkpoints_dir: str, like_model: Any,
                       like_opt: Any):
    """Auto-detecting rolling-checkpoint restore (resume path)."""
    return make_checkpoint_manager(
        checkpoints_dir,
        backend=detect_backend(checkpoints_dir)).restore(like_model,
                                                         like_opt)


def restore_best_checkpoint(checkpoints_dir: str, like_model: Any):
    """Auto-detecting best-checkpoint restore (test/predict drivers)."""
    return make_checkpoint_manager(
        checkpoints_dir,
        backend=detect_backend(checkpoints_dir)).restore_best(like_model)
