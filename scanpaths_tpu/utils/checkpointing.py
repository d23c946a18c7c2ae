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
  checkpoint write (the classic TPU pattern).  Writes land in a
  ``.new`` staging dir and are renamed over the final name only after
  they fully commit, so a crash mid-write never loses the previous
  checkpoint.  ``wait()`` blocks until all enqueued writes have landed
  and been swapped in (the trainer calls it before the
  ``supervised_save`` directory copy); ``close()`` additionally
  releases orbax's background threads at the end of ``fit``.

``restore_checkpoint`` / ``restore_best_checkpoint`` auto-detect which
backend wrote a checkpoints directory, so ``--resume_dir`` and the test
drivers work regardless of which backend the run was trained with.
"""

from __future__ import annotations

import os
import shutil
from os.path import join
from typing import Any

from flax import serialization


def _backend_artifacts(directory: str, prefix: str, suffix: str):
    """Checkpoint artifacts a backend may have left in this dir —
    final names plus the orbax commit-swap leftovers (``.old`` from a
    crash between the two renames, ``.new`` from a crash mid-write).
    The write guards and ``detect_backend`` share this list so the
    guard can never admit a state detection would later reject."""
    names = []
    for stem in (f"{prefix}{suffix}", f"{prefix}_best{suffix}"):
        for n in (stem, stem + ".old", stem + ".new"):
            if os.path.exists(join(directory, n)):
                names.append(n)
    return names


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
        foreign = _backend_artifacts(serialization_dir, filename_prefix,
                                     ".orbax")
        if foreign:
            raise RuntimeError(
                f"refusing to write msgpack checkpoints into "
                f"{serialization_dir!r}: it already holds orbax "
                f"checkpoints {foreign} — mixed-backend directories make "
                f"auto-detecting restores ambiguous (resume with "
                f"--ckpt_backend orbax, or move the leftovers aside)")

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

    def close(self):
        """Msgpack holds no background resources; nothing to close."""

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
        foreign = _backend_artifacts(self._dir, filename_prefix, ".msgpack")
        if foreign:
            raise RuntimeError(
                f"refusing to write orbax checkpoints into {self._dir!r}: "
                f"it already holds msgpack checkpoints {foreign} — a later "
                f"auto-detecting restore could silently pick the stale "
                f"backend (resume with --ckpt_backend msgpack, or move "
                f"the leftovers aside)")
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        self._pending: list[tuple[str, str]] = []   # (staged, final)
        self._closed = False

    def _commit(self):
        """Wait for in-flight writes, then swap staged dirs into place.

        Crash safety: orbax's ``save(force=True)`` deletes the target
        path up front while the write commits in background threads, so
        saving straight to the final name leaves a window with NO
        complete checkpoint on disk.  Saves therefore go to a
        ``<name>.new`` staging dir and are renamed over the final name
        only after ``wait_until_finished``; the previous checkpoint
        survives (as ``<name>`` or, across the two renames, as
        ``<name>.old``) until the new one is fully on disk."""
        self._ckptr.wait_until_finished()
        for staged, final in self._pending:
            old = final + ".old"
            if os.path.isdir(old):
                shutil.rmtree(old)
            if os.path.isdir(final):
                os.rename(final, old)
            os.rename(staged, final)
            if os.path.isdir(old):
                shutil.rmtree(old)
        self._pending = []

    def _save_staged(self, final_name: str, tree: Any):
        staged = join(self._dir, final_name + ".new")
        if os.path.isdir(staged):
            shutil.rmtree(staged)          # stale staging from a crash
        self._ckptr.save(staged, args=self._ocp.args.PyTreeSave(tree),
                         force=True)
        self._pending.append((staged, join(self._dir, final_name)))

    def step(self, metric: float, model_state: Any, opt_state: Any = None):
        """Reference semantics (checkpointing.py:79-110): rolling save
        every call; best save when the metric improves, ties improving,
        a falsy initial best adopting the first metric.  Saves are
        async: ``step`` returns once orbax has snapshotted the arrays;
        the write overlaps the next train steps and is committed (swap
        into the final name) by the next ``step``/``wait``."""
        self._commit()
        self._save_staged(f"{self._prefix}.orbax",
                          {"model": model_state, "optimizer": opt_state})
        if not self._best_metric:
            self._best_metric = metric
        improved = (metric <= self._best_metric if self._mode == "min"
                    else metric >= self._best_metric)
        if improved:
            self._best_metric = metric
            # one in-flight save at a time: commit the rolling write,
            # then stage the best write (committed on the next barrier)
            self._commit()
            self._save_staged(f"{self._prefix}_best.orbax",
                              {"model": model_state})

    def get_best_metric(self):
        return self._best_metric

    def wait(self):
        """Block until every enqueued async write has landed on disk AND
        been swapped into its final name (call before copying/reading
        the checkpoints dir or exiting)."""
        self._commit()

    def close(self):
        """Commit pending writes and release the AsyncCheckpointer's
        background threads (orbax's documented close() contract; also
        the multi-host exit barrier).  Idempotent."""
        if self._closed:
            return
        self._commit()
        self._ckptr.close()
        self._closed = True

    def _restore(self, name: str, like: Any):
        ocp = self._ocp
        self._commit()
        path = join(self._dir, name)
        if not os.path.isdir(path) and os.path.isdir(path + ".old"):
            # crash landed between the two commit renames: the previous
            # complete checkpoint survives under the .old name
            path = path + ".old"
        restore_args = ocp.checkpoint_utils.construct_restore_args(like)
        return self._ckptr.restore(
            path,
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
    """Which backend wrote this directory? (msgpack when empty — the
    historical default.)  A directory holding BOTH backends' artifacts
    is an error: one of them is stale, and silently preferring either
    could restore older weights than the run actually has."""
    orbax = bool(_backend_artifacts(checkpoints_dir, filename_prefix,
                                    ".orbax"))
    msgpack = bool(_backend_artifacts(checkpoints_dir, filename_prefix,
                                      ".msgpack"))
    if orbax and msgpack:
        raise RuntimeError(
            f"{checkpoints_dir!r} holds BOTH msgpack and orbax "
            f"checkpoints; refusing to guess which is current — remove "
            f"the stale backend's files or pass an explicit backend")
    return "orbax" if orbax else "msgpack"


def restore_checkpoint(checkpoints_dir: str, like_model: Any,
                       like_opt: Any):
    """Auto-detecting rolling-checkpoint restore (resume path)."""
    mgr = make_checkpoint_manager(
        checkpoints_dir, backend=detect_backend(checkpoints_dir))
    try:
        return mgr.restore(like_model, like_opt)
    finally:
        mgr.close()


def restore_best_checkpoint(checkpoints_dir: str, like_model: Any):
    """Auto-detecting best-checkpoint restore (test/predict drivers)."""
    mgr = make_checkpoint_manager(
        checkpoints_dir, backend=detect_backend(checkpoints_dir))
    try:
        return mgr.restore_best(like_model)
    finally:
        mgr.close()
