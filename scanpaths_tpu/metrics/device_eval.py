"""Device-side full-suite validation sweep (``--device_eval``).

The reference pays its validation wall-clock in Python metric loops
(OSIE/utils/evaluation.py:151-282: MultiMatch + NW + Levenshtein + TDE
per GT-subject x decode on the CPU) — the one pathology of the original
that round 1 left alive on the eval path.  Every metric column already
has a parity-tested device kernel (metrics/jax_metrics.py); this module
computes the per-pair score rows as ONE jitted program per batch and
keeps only the reference's cheap aggregation (NaN handling, per-image
best groups, bucketing) on the host by reusing the HOST suite's own
``_summarize``/``_bucketize`` — so the output tree is semantically
identical by construction, proven in tests/test_device_eval.py.

Row layout matches ``evaluation.pair_metrics``: [mm_vector,
mm_direction, mm_length, mm_position, mm_duration, sm_wod, sm_wd, sed,
stde].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import jax_metrics as jm
from .evaluation import _bucketize, _summarize


@functools.partial(jax.jit, static_argnums=(0, 1))
def pair_rows(spec_wd: jm.ScanMatchSpec, spec_wod: jm.ScanMatchSpec,
              gt_fix, gt_len, pred_fix, pred_len):
    """All nine pairwise metrics for every (prediction, GT subject)
    pair, on device.

    gt_fix: [N, S, L, 3] (durations in SECONDS), gt_len: [N, S];
    pred_fix: [N, T, 3], pred_len: [N].  Returns [N, S, 9] float32
    (garbage where the caller's subject mask is 0 — the host
    aggregation filters by mask).
    """
    n, s = gt_fix.shape[:2]
    gt_flat = gt_fix.reshape(n * s, *gt_fix.shape[2:])
    gl = gt_len.reshape(n * s)
    pr = jnp.repeat(pred_fix, s, axis=0)
    pl = jnp.repeat(pred_len, s, axis=0)
    mm = jm.multimatch_scores(gt_flat, gl, pr, pl)            # [N*S, 5]
    wod = jm.scanmatch_scores(spec_wod, gt_flat, gl, pr, pl)
    wd = jm.scanmatch_scores(spec_wd, gt_flat, gl, pr, pl)
    sed = jm.sed_scores(gt_flat, gl, pr, pl)
    stde = jm.stde_scores(gt_flat, gl, pr, pl)
    rows = jnp.concatenate(
        [mm, wod[:, None], wd[:, None], sed[:, None], stde[:, None]],
        axis=-1)
    return rows.reshape(n, s, 9).astype(jnp.float32)


def human_rows(spec_wd: jm.ScanMatchSpec, spec_wod: jm.ScanMatchSpec,
               gt_fix, gt_len) -> np.ndarray:
    """All ordered subject-vs-subject metric rows for one batch of
    images, on device: returns [N, S, S, 9] float64 with
    ``M[n, a, b] = pair_metrics(subject_a, subject_b)``.

    Built from S calls of :func:`pair_rows` (one compile for the whole
    loop — the shapes never change) with subject ``i`` on the *pred*
    side, so ``pair_rows(...)[n, j] = pair_metrics(subject_j,
    subject_i)``; stacking those columns over ``i`` along axis 2 yields
    the ordered-pair matrix without materializing an S*S cross product
    on device.  Some pairwise columns are order-sensitive (STDE embeds
    the FIRST argument's delays; MultiMatch aligns a->b), so the order
    bookkeeping here is load-bearing.
    """
    return np.asarray(_human_rows_dev(spec_wd, spec_wod,
                                      jnp.asarray(gt_fix),
                                      jnp.asarray(gt_len)), np.float64)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _human_rows_dev(spec_wd, spec_wod, gt_fix, gt_len):
    """One program for the whole ordered-pair matrix: vmap the
    per-subject :func:`pair_rows` column over the pred axis
    (out_axes=2 reproduces the stacked-columns layout).  One device
    call + one host sync per batch instead of S of each — the S
    sequential synced calls paid ~35 ms of tunnel latency per subject."""
    col = lambda pf, pl: pair_rows(spec_wd, spec_wod,  # noqa: E731
                                   gt_fix, gt_len, pf, pl)
    return jax.vmap(col, in_axes=(1, 1), out_axes=2)(gt_fix, gt_len)


def human_evaluation_device(loader, spec_wd: jm.ScanMatchSpec,
                            spec_wod: jm.ScanMatchSpec, task: str = "osie"):
    """Device-kernel human inter-observer baseline — the drop-in
    replacement for ``evaluation.human_evaluation`` under
    ``--device_eval`` (same (metrics, stds, per_image) return tree,
    aggregation shared with the host suite).

    The reference computes this sweep with O(images x subjects^2)
    Python metric loops before every training run and at the start of
    every test run (OSIE/utils/evaluation.py:11-148); here every
    pairwise metric row comes from the parity-tested device kernels and
    the host keeps only the NaN bookkeeping and group means.
    """
    if task == "air":
        return _human_evaluation_air_device(loader, spec_wd, spec_wod)
    rows, group_sizes = [], []
    per_image = {}
    for batch in loader:
        m = human_rows(spec_wd, spec_wod, batch["gt_fix"], batch["gt_len"])
        mask = np.asarray(batch["gt_mask"]).astype(bool)
        for bi in range(m.shape[0]):
            ns = int(mask[bi].sum())
            img_scores = []
            for i in range(ns):
                g = 0
                for j in range(ns):
                    if i == j:
                        continue
                    r = m[bi, i, j]
                    rows.append(r)
                    img_scores.append(r)
                    g += 1
                group_sizes.append(g)
            per_image[batch["img_names"][bi]] = list(
                np.asarray(img_scores, np.float64).mean(axis=0))
    metrics, stds = _summarize(np.asarray(rows, np.float64), group_sizes,
                               mm_dropna=False)
    return metrics, stds, per_image


def _human_evaluation_air_device(loader, spec_wd, spec_wod):
    """AiR bucketed human baseline on device rows (reference
    AiR/utils/evaluation.py:11-186: NaN pairs skipped entirely, buckets
    by answer-correctness pairs, per-question good/poor means)."""
    rows_by_group = []
    per_qid = {}
    for batch in loader:
        m = human_rows(spec_wd, spec_wod, batch["gt_fix"], batch["gt_len"])
        mask = np.asarray(batch["gt_mask"]).astype(bool)
        for bi in range(m.shape[0]):
            ns = int(mask[bi].sum())
            performances = list(batch["performances"][bi])
            allr, right, wrong = [], [], []
            for i in range(ns):
                for j in range(ns):
                    if i == j:
                        continue
                    r = m[bi, i, j]
                    if np.any(np.isnan(r)):
                        continue
                    allr.append(r)
                    if performances[i] and performances[j]:
                        right.append(r)
                    elif not performances[i] and not performances[j]:
                        wrong.append(r)
            rows_by_group.append((allr, right, wrong))
            good = list(np.asarray(right, np.float64).mean(0)) if right \
                else [0.0] * 9
            poor = list(np.asarray(wrong, np.float64).mean(0)) if wrong \
                else [0.0] * 9
            per_qid[batch["question_ids"][bi]] = {True: good, False: poor}
    metrics, stds = _bucketize(rows_by_group)
    return metrics, stds, per_qid


@functools.partial(jax.jit, static_argnums=(0, 1))
def _pair_rows_and_overflow(spec_wd, spec_wod, gt_fix, gt_len,
                            pred_fix, pred_len):
    """:func:`pair_rows` plus the rollout truncation count, fused into
    one program.  The w/-duration NW table bound is sized from the
    SPLIT's GT (trainer._eval_specs); sampled rollouts have unbounded
    LogNormal durations, so one can always expand past the static cap
    and get prefix-truncated where the host suite would not.  Counting
    those rollouts in the same program keeps the divergence loud (the
    RL path already reports the analogous reward_overflow_frac) at
    zero extra device calls."""
    rows = pair_rows(spec_wd, spec_wod, gt_fix, gt_len,
                     pred_fix, pred_len)
    ov = jnp.sum(jm.expansion_overflow(spec_wd, pred_fix, pred_len)
                 .astype(jnp.int32))
    return rows, ov


class DeviceSweep:
    """Accumulates device-computed pair rows across validation batches
    and reproduces ``evaluation(...)``'s aggregation exactly."""

    def __init__(self, spec_wd: jm.ScanMatchSpec,
                 spec_wod: jm.ScanMatchSpec):
        self.spec_wd = spec_wd
        self.spec_wod = spec_wod
        self._rows: list[np.ndarray] = []      # one [G, 9] per group
        self._buckets = []                     # air: (all, right, wrong)
        self._overflow = 0                     # truncated rollouts
        self._preds = 0                        # rollouts seen

    @property
    def overflow(self) -> dict:
        """{count, total, frac} of prediction rollouts whose TempBin
        expansion overflowed the w/-duration table (prefix-truncated on
        device; a nonzero frac means the with-duration ScanMatch column
        may read differently from a host-suite run)."""
        return {"count": self._overflow, "total": self._preds,
                "frac": self._overflow / max(self._preds, 1)}

    def log_overflow(self, logger, writer=None,
                     tag: str = "metrics/wd_overflow_frac",
                     step: int = 0, prefix: str = ""):
        """Surface the truncation counter: a scalar for the writer (if
        given) and a WARNING when any rollout was truncated — one
        shared wording so the trainer, joint trainer, and test CLI
        never drift."""
        ov = self.overflow
        if writer is not None:
            writer.add_scalar(tag, ov["frac"], step)
        if ov["count"]:
            logger.warning(
                f"{prefix}device-eval w/-duration table overflow: "
                f"{ov['count']}/{ov['total']} rollouts ({ov['frac']:.2%}) "
                f"prefix-truncated — the with-duration ScanMatch column "
                f"may differ from a host-suite run")

    def _compute_rows(self, gt_fix, gt_len, pred_fix, pred_len) -> np.ndarray:
        """Pair rows + the overflow count in ONE jitted program and one
        host sync (eagerly dispatching the overflow ops would pay
        several per-op round-trips through the device tunnel on the
        path this sweep exists to keep off the host)."""
        rows, ov = _pair_rows_and_overflow(
            self.spec_wd, self.spec_wod, jnp.asarray(gt_fix),
            jnp.asarray(gt_len), jnp.asarray(pred_fix),
            jnp.asarray(pred_len))
        rows = np.asarray(rows, np.float64)
        self._overflow += int(np.asarray(ov))
        self._preds += int(np.asarray(pred_len).shape[0])
        return rows

    def add_batch(self, gt_fix, gt_len, gt_mask, pred_fix, pred_len):
        """One decode repeat of one batch: gt_* [N, S, ...] (mask 1 =
        real subject), pred_* [N, ...]."""
        rows = self._compute_rows(gt_fix, gt_len, pred_fix, pred_len)
        mask = np.asarray(gt_mask).astype(bool)
        for i in range(rows.shape[0]):
            self._rows.append(rows[i][mask[i]])

    def add_batch_air(self, gt_fix, gt_len, gt_mask, pred_fix, pred_len,
                      performances, allocated):
        """AiR bucketed variant: ``performances`` is a ragged list (per
        image) of subject flags, ``allocated`` the stream flag of these
        predictions.  Mirrors evaluation_performance_related's NaN-skip
        + (perf == alloc) bucketing (reference AiR/utils/evaluation.py:
        188-359)."""
        rows = self._compute_rows(gt_fix, gt_len, pred_fix, pred_len)
        mask = np.asarray(gt_mask).astype(bool)
        for i in range(rows.shape[0]):
            r = rows[i][mask[i]]
            perfs = list(performances[i])
            allr, right, wrong = [], [], []
            for j in range(r.shape[0]):
                if np.any(np.isnan(r[j])):
                    continue
                allr.append(r[j])
                if perfs[j] and allocated:
                    right.append(r[j])
                elif (not perfs[j]) and (not allocated):
                    wrong.append(r[j])
            self._buckets.append((allr, right, wrong))

    def result(self):
        """(metrics, stds) with the host suite's exact aggregation."""
        if self._buckets:
            return _bucketize(self._buckets)
        sizes = [len(r) for r in self._rows]
        rows = np.concatenate([r for r in self._rows if len(r)], axis=0)
        return _summarize(rows, sizes)
