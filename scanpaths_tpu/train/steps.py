"""Jittable training steps: supervised and SCST (RL), all tasks.

The reference's RL loop round-trips every rollout through the host for
reward computation (reference OSIE/train.py:222-246: sample on GPU,
decode on CPU, ScanMatch on CPU, rewards back to GPU).  Here the whole
rollout -> reward -> REINFORCE -> update path is ONE jitted program:
sampling (ops.sampling), ScanMatch rewards (metrics.jax_metrics NW
kernels), harmonic-mean reward shaping, baselines and gradients all
stay on device.

Reference semantics preserved:
* RL forward runs in eval mode — BatchNorm uses running stats and the
  probs are softmaxed (reference OSIE/train.py:199 ``model.eval()``),
  but gradients flow through it;
* rewards = harmonic mean of (ScanMatch w/o dur, ScanMatch w/ dur)
  means over GT subjects — OSIE/COCO normalize by the TOTAL subject
  count with MultiMatch-NaN pairs voided (OSIE
  utils/evaluation.py:296-335), AiR normalizes same/diff groups by the
  VALID pair count (AiR utils/evaluation.py:410-420);
* the baseline is the mean reward over rollouts (OSIE/train.py:254;
  AiR per-stream, AiR/train.py:304-307);
* the loss is a plain sum over rollouts x samples of
  -logpi * advantage for actions and durations (OSIE/train.py:256-258).

Divergence from the reference (documented): the reference REJECTS and
resamples a whole batch rollout when any sample's reward is NaN
(OSIE/train.py:237-239, AiR accept_flag) — a data-dependent host loop.
Here invalid (sample, rollout) entries instead get zero advantage and
are excluded from the baseline mean (a masked expectation of the same
estimator); with a supervised-pretrained policy the rejection path is
rare, and the gradient is identical whenever no rejection would occur.

The AiR Consistency-Divergence reward is implemented but only added to
the loss under ``apply_cd=True`` — the reference computes it and drops
it via a dangling ``+`` statement (AiR/train.py:332-340), so parity
default is off.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.grid import GridSpec
from ..metrics import jax_metrics as jm
from ..ops.sampling import random_sample
from . import losses


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RLConfig:
    task: str
    grid: GridSpec
    rl_sample_number: int
    # Static bounds for the NW DP tables.  The Trainer derives these
    # from the training split (EvaluationDataset.wd_symbols_needed /
    # .pad_gt_len) so GT never overflows; sampled rollouts can still
    # exceed max_symbols_wd (durations are unbounded LogNormals) and
    # that case is COUNTED and reported as `reward_overflow_frac`.
    max_symbols_wd: int = 256
    max_symbols_wod: int = 24
    apply_cd: bool = False
    lambda_5: float = -2.0

    @property
    def spec_wd(self):
        return jm.ScanMatchSpec(xres=self.grid.width, yres=self.grid.height,
                                temp_bin=50.0,
                                max_symbols=self.max_symbols_wd)

    @property
    def spec_wod(self):
        return jm.ScanMatchSpec(
            xres=self.grid.width, yres=self.grid.height, temp_bin=0.0,
            max_symbols=max(self.grid.max_length, self.max_symbols_wod))


def _model_inputs(task: str, batch: dict) -> dict:
    kw = {}
    if task in ("air", "coco"):
        kw["attention_maps"] = batch["attention_maps"]
    if task == "coco":
        kw["task_ids"] = batch["tasks"]
    return kw


# ---------------------------------------------------------------------------
# Supervised step
# ---------------------------------------------------------------------------

def supervised_step(model, optimizer, state: TrainState, batch: dict,
                    lambda_1: float, params_gather=None):
    """One supervised update.  Returns (state, metrics).

    ``params_gather`` (a params-shaped pytree of replicated
    NamedShardings, or None) is the ZeRO-style parameter-sharding hook:
    under ``--model_parallel`` the params/Adam moments live sharded
    across the ``model`` mesh axis between steps, and this constraint
    all-gathers them at step entry so the forward+backward runs as the
    (equivalence-proven) replicated program — see train/mesh.py for why
    the compute itself is not weight-sharded during training."""
    if params_gather is not None:
        state = state.replace(params=jax.lax.with_sharding_constraint(
            state.params, params_gather))

    def loss_fn(params):
        kw = _model_inputs(model.task, batch)
        if model.task == "air":
            kw["performances"] = batch["performances"]
        out, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], train=True, mutable=["batch_stats"], **kw)
        logits = out["actions"] if model.task != "air" \
            else out["all_actions_prob"]
        loss_actions = losses.cross_entropy_loss(
            logits, batch["scanpaths"], batch["action_masks"])
        loss_duration = losses.mlp_log_normal_distribution(
            out["log_normal_mu"], out["log_normal_sigma2"],
            batch["durations"], batch["duration_masks"])
        loss = loss_actions + lambda_1 * loss_duration
        return loss, (loss_actions, loss_duration, updates["batch_stats"])

    (loss, (la, ld, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(params=new_params, batch_stats=new_bs,
                           opt_state=new_opt, step=state.step + 1)
    return new_state, {"loss": loss, "loss_actions": la, "loss_duration": ld}


# ---------------------------------------------------------------------------
# Reward helpers
# ---------------------------------------------------------------------------

def _hmean2(a, b):
    ok = (a > 0) & (b > 0)
    return jnp.where(ok, 2.0 * a * b / jnp.where(ok, a + b, 1.0), 0.0)


def _pair_grids(cfg: RLConfig, gt_fix, gt_len, gt_mask, pred_fix, pred_len,
                full: bool = False):
    """Per-(rollout, sample, subject) metric grids for R rollouts.

    Always returns {"wod", "wd"} [R, N, S]; with ``full`` additionally
    MultiMatch {"mm"} [R, N, S, 5], {"sed"} and {"stde"} [R, N, S] —
    the complete reference ``pairs_eval`` column set
    (OSIE/utils/evaluation.py:284-340) computed on device.
    """
    r, n = pred_fix.shape[:2]
    s = gt_fix.shape[1]
    gt_fix_r = jnp.broadcast_to(gt_fix, (r,) + gt_fix.shape)
    gt_len_r = jnp.broadcast_to(gt_len, (r,) + gt_len.shape)
    gt_flat = gt_fix_r.reshape(r * n * s, *gt_fix.shape[2:])
    gt_len_flat = gt_len_r.reshape(r * n * s)
    wod, wd = jm.scanmatch_pair_grid(
        cfg.spec_wd, cfg.spec_wod,
        gt_fix_r.reshape(r * n, s, *gt_fix.shape[2:]),
        gt_len_r.reshape(r * n, s),
        jnp.broadcast_to(gt_mask, (r,) + gt_mask.shape).reshape(r * n, s),
        pred_fix.reshape(r * n, *pred_fix.shape[2:]),
        pred_len.reshape(r * n))
    out = {"wod": wod.reshape(r, n, s), "wd": wd.reshape(r, n, s)}
    if not full:
        return out
    pred_rep = jnp.repeat(pred_fix.reshape(r * n, *pred_fix.shape[2:]),
                          s, axis=0)
    pred_len_rep = jnp.repeat(pred_len.reshape(r * n), s, axis=0)
    g = cfg.grid
    out["mm"] = jm.multimatch_scores(
        gt_flat, gt_len_flat, pred_rep, pred_len_rep,
        xres=g.width, yres=g.height).reshape(r, n, s, 5)
    out["sed"] = jm.sed_scores(
        gt_flat, gt_len_flat, pred_rep, pred_len_rep,
        height=g.height, width=g.width).astype(jnp.float32) \
        .reshape(r, n, s)
    out["stde"] = jm.stde_scores(
        gt_flat, gt_len_flat, pred_rep, pred_len_rep,
        height=g.height, width=g.width).reshape(r, n, s)
    return out


def _eval_forward(model, params, batch_stats, batch):
    """Eval-mode forward (softmaxed probs, frozen BN stats)."""
    kw = _model_inputs(model.task, batch)
    return model.apply({"params": params, "batch_stats": batch_stats},
                       batch["images"], train=False, **kw)


def _reinforce_terms(samples, mu, sigma2):
    """Per-rollout REINFORCE log-prob terms.  samples.* lead with R."""
    nla = jax.vmap(lambda p, m: -losses.log_action(p, m))(
        samples.action_probs, samples.action_mask)
    nld = jax.vmap(lambda d, m: -losses.log_duration(d, mu, sigma2, m))(
        samples.durations, samples.duration_mask)
    return nla, nld


def rl_step(model, optimizer, state: TrainState, batch: dict, key,
            cfg: RLConfig, params_gather=None):
    """One SCST update.  Returns (state, metrics).

    ``params_gather``: same ZeRO-style gather-at-entry hook as
    :func:`supervised_step`."""
    if params_gather is not None:
        state = state.replace(params=jax.lax.with_sharding_constraint(
            state.params, params_gather))

    def loss_fn(params):
        return rl_loss(model, params, state.batch_stats, batch, key, cfg)

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(params=new_params, opt_state=new_opt,
                              step=state.step + 1)
    return new_state, metrics


def rl_loss(model, params, batch_stats, batch: dict, key, cfg: RLConfig):
    """The SCST loss + metrics at fixed params (factored out of
    ``rl_step`` so the estimator A/B harness, tools/rl_estimator_ab.py,
    can differentiate it directly)."""
    out = _eval_forward(model, params, batch_stats, batch)
    if model.task == "air":
        return _air_rl_loss(out, batch, key, cfg)
    probs = out["all_actions_prob"]
    mu = out["log_normal_mu"]
    sigma2 = out["log_normal_sigma2"]
    r = cfg.rl_sample_number
    keys = jax.random.split(jax.random.fold_in(key, 1), r)
    samples = jax.vmap(
        lambda k: random_sample(k, probs, mu, sigma2, cfg.grid))(keys)

    full = cfg.task == "osie"
    grids = jax.lax.stop_gradient(_pair_grids(
        cfg, batch["gt_fix"], batch["gt_len"], batch["gt_mask"],
        samples.fix, samples.fix_len, full=full))
    wod, wd = grids["wod"], grids["wd"]
    gt_mask = batch["gt_mask"][None]                      # [1, N, S]
    if full:
        # exact reference pairs_eval row voiding: a (GT, rollout)
        # pair is dropped when ANY MultiMatch similarity is NaN
        # (< 3 fixations on either side, or a zero-duration pair —
        # OSIE/utils/evaluation.py:296-299,327)
        pair_ok = (gt_mask > 0) & ~jnp.isnan(grids["mm"]).any(-1)
    else:
        pair_ok = (gt_mask > 0) & ~jnp.isnan(wod) & ~jnp.isnan(wd)
    pair_okf = pair_ok.astype(jnp.float32)
    total = jnp.maximum(batch["gt_mask"].sum(-1)[None], 1.0)  # [1, N]

    def grid_mean(x):
        return jnp.where(jnp.isnan(x), 0., x * pair_okf).sum(-1) / total

    wod_mean = grid_mean(wod)
    wd_mean = grid_mean(wd)
    reward = _hmean2(wod_mean, wd_mean)                   # [R, N]
    ok = pair_ok.any(-1).astype(jnp.float32)              # [R, N]
    baseline = (reward * ok).sum(0) / jnp.maximum(ok.sum(0), 1.0)
    adv = (reward - baseline[None]) * ok

    nla, nld = _reinforce_terms(samples, mu, sigma2)
    loss = (nla * adv).sum() + (nld * adv).sum()
    # loud (not silent) static-bound truncation accounting: fraction
    # of rollouts whose TempBin expansion exceeds the NW table bound
    overflow = jm.expansion_overflow(
        cfg.spec_wd, samples.fix.reshape(-1, *samples.fix.shape[2:]),
        samples.fix_len.reshape(-1))
    metrics = {"rl_loss": loss, "reward_hmean": reward.mean(),
               "rollout_ok_frac": ok.mean(),
               "reward_overflow_frac":
                   overflow.astype(jnp.float32).mean()}
    if full:
        # the reference's 11 metrics_for_reward/* scalars
        # (OSIE/train.py:269-281): per-sample pairs_eval columns
        # averaged over rollouts x samples (masked mean over the
        # valid entries instead of the reference's reject-and-
        # resample loop)
        okf = ok
        denom = jnp.maximum(okf.sum(), 1.0)

        def col_mean(per_rn):
            return (per_rn * okf).sum() / denom

        mm_mean = grid_mean(
            jnp.moveaxis(grids["mm"], -1, 0))             # [5, R, N]
        big = jnp.float32(3.4e38)
        sed_best = jnp.min(
            jnp.where(pair_ok, grids["sed"], big), -1)
        stde_best = jnp.max(
            jnp.where(pair_ok, grids["stde"], -big), -1)
        names = ["vector", "direction", "length", "position",
                 "duration"]
        for i, nm in enumerate(names):
            metrics[f"metrics_for_reward/{nm}"] = col_mean(mm_mean[i])
        metrics["metrics_for_reward/w/o duration"] = col_mean(wod_mean)
        metrics["metrics_for_reward/w/ duration"] = col_mean(wd_mean)
        metrics["metrics_for_reward/SED mean"] = col_mean(
            grid_mean(grids["sed"]))
        metrics["metrics_for_reward/STDE mean"] = col_mean(
            grid_mean(grids["stde"]))
        metrics["metrics_for_reward/SED best"] = col_mean(sed_best)
        metrics["metrics_for_reward/STDE best"] = col_mean(stde_best)
    else:
        metrics["reward_wod"] = wod_mean.mean()
        metrics["reward_wd"] = wd_mean.mean()
    return loss, metrics

def _air_rl_loss(out, batch, key, cfg: RLConfig):
    """AiR SCST: R rollouts per stream (good first, reference
    AiR/train.py:225), same/diff-group rewards, per-stream baselines."""
    r = cfg.rl_sample_number
    perf = batch["gt_performance"]                            # [N, S] float
    gt_mask = batch["gt_mask"]

    rewards, terms = [], []
    for si, stream in enumerate(("good", "poor")):
        probs = out[f"{stream}_all_actions_prob"]
        mu = out[f"{stream}_log_normal_mu"]
        sigma2 = out[f"{stream}_log_normal_sigma2"]
        keys = jax.random.split(jax.random.fold_in(key, si), r)
        samples = jax.vmap(
            lambda k: random_sample(k, probs, mu, sigma2, cfg.grid))(keys)
        grids = jax.lax.stop_gradient(_pair_grids(
            cfg, batch["gt_fix"], batch["gt_len"], gt_mask,
            samples.fix, samples.fix_len))
        wod, wd = grids["wod"], grids["wd"]
        same = (perf[None] == float(stream == "good")) & (gt_mask[None] > 0)
        diff = (perf[None] != float(stream == "good")) & (gt_mask[None] > 0)

        def group_reward(sel):
            okp = sel & ~jnp.isnan(wod) & ~jnp.isnan(wd)
            cnt = jnp.maximum(okp.sum(-1), 1)
            wodm = jnp.where(okp, wod, 0.).sum(-1) / cnt
            wdm = jnp.where(okp, wd, 0.).sum(-1) / cnt
            # empty group -> reference NaN -> zeroed (AiR/train.py:282)
            return jnp.where(okp.any(-1), _hmean2(wodm, wdm), 0.0)

        rewards.append((group_reward(same), group_reward(diff)))
        terms.append(_reinforce_terms(samples, mu, sigma2))

    same_r = jnp.concatenate([rewards[0][0], rewards[1][0]])   # [2R, N]
    diff_r = jnp.concatenate([rewards[0][1], rewards[1][1]])
    nla = jnp.concatenate([terms[0][0], terms[1][0]])
    nld = jnp.concatenate([terms[0][1], terms[1][1]])

    def stream_baseline(x):
        return x.reshape(2, r, -1).mean(1, keepdims=True) \
            .repeat(r, 1).reshape(2 * r, -1)

    adv = same_r - stream_baseline(same_r)
    loss = (nla * adv).sum() + (nld * adv).sum()
    if cfg.apply_cd:
        # Consistency-Divergence term (the paper's eq.; reference
        # computes it at AiR/train.py:309-330 but never adds it).
        cd = jnp.abs((same_r - diff_r)
                     - _gtpairs_cd_target(batch, cfg))
        cd_baseline = stream_baseline(cd)
        loss = loss + cfg.lambda_5 * ((nla * (cd - cd_baseline)).sum()
                                      + (nld * (cd - cd_baseline)).sum())
    metrics = {"rl_loss": loss,
               "reward_same_hmean": same_r.mean(),
               "reward_diff_hmean": diff_r.mean()}
    return loss, metrics


def _gtpairs_cd_target(batch, cfg: RLConfig):
    """GT-vs-GT (same - diff) score gap per sample, replicated to the
    [2R, N] rollout grid, masked where either group score is zero
    (reference AiR/train.py:310-328)."""
    r = cfg.rl_sample_number
    gt_fix, gt_len, gt_mask = (batch["gt_fix"], batch["gt_len"],
                               batch["gt_mask"])
    perf = batch["gt_performance"]
    n, s = gt_mask.shape

    # subject-pair grids: score every (i, j) GT pair of every sample
    fix_i = jnp.repeat(gt_fix, s, axis=1).reshape(n * s * s,
                                                  *gt_fix.shape[2:])
    len_i = jnp.repeat(gt_len, s, axis=1).reshape(n * s * s)
    fix_j = jnp.tile(gt_fix, (1, s, 1, 1)).reshape(n * s * s,
                                                   *gt_fix.shape[2:])
    len_j = jnp.tile(gt_len, (1, s)).reshape(n * s * s)
    wd = jm.scanmatch_scores(cfg.spec_wd, fix_i, len_i, fix_j, len_j)
    wod = jm.scanmatch_scores(cfg.spec_wod, fix_i, len_i, fix_j, len_j)
    wd = wd.reshape(n, s, s)
    wod = wod.reshape(n, s, s)

    valid = (gt_mask[:, :, None] > 0) & (gt_mask[:, None, :] > 0)
    upper = jnp.triu(jnp.ones((s, s), bool), k=1)[None]
    is_good = perf > 0.5

    def group(mask):
        m = (mask & valid & ~jnp.isnan(wd) & ~jnp.isnan(wod))
        cnt = jnp.maximum(m.sum((1, 2)), 1)
        wodm = jnp.where(m, wod, 0.).sum((1, 2)) / cnt
        wdm = jnp.where(m, wd, 0.).sum((1, 2)) / cnt
        return jnp.where(m.any((1, 2)), _hmean2(wodm, wdm), 0.0)

    gg = group(is_good[:, :, None] & is_good[:, None, :] & upper)
    pp = group(~is_good[:, :, None] & ~is_good[:, None, :] & upper
               & (gt_mask[:, :, None] > 0) & (gt_mask[:, None, :] > 0))
    gp = group(is_good[:, :, None] & ~is_good[:, None, :])
    same = jnp.concatenate([jnp.tile(gg, (r,)), jnp.tile(pp, (r,))]) \
        .reshape(2 * r, n)
    diffc = jnp.tile(gp, (2 * r,)).reshape(2 * r, n)
    usable = ((same != 0) & (diffc != 0)).astype(jnp.float32)
    return (same - diffc) * usable
