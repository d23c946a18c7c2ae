"""Convergence artifact: a scripted two-phase training run whose
curves prove the OPTIMIZATION works, not just that steps execute.

Every other proof in the repo is step-level (identical weights, equal
losses, equal rewards); none of them would catch a sign error in the
REINFORCE advantage, the LR schedule, or a mask polarity.  This run
does: on a LEARNABLE structured synthetic corpus
(tools/make_synth_data.py::make_osie_structured — bright blobs,
salience-ordered fixations) it trains the real Trainer end to end
(thin trunk, full 240x320 geometry) through the reference's two-phase
schedule (supervised epochs then SCST — reference OSIE/train.py:
165-281) and records:

* the supervised loss curve (must decrease),
* the validation model-selection scalar per epoch (hmean of the
  ScanMatch metrics — must improve over random init),
* the SCST phase's mean training reward per epoch (must HOLD — a
  sign-flipped advantage collapses it, see the calibration note at
  the deltas below) and the validation scalar after RL, which must
  IMPROVE over the ``supervised_save`` snapshot — the improvement the
  reference exists to produce (reference OSIE/train.py:252-258).  The
  headroom comes from the corpus design: training subjects are
  spatially noisy/order-ambiguous samples of each image's underlying
  blob program (make_osie_headroom), so teacher-forced CE can only
  learn the DIFFUSE per-step marginal; the sequence-level ScanMatch
  reward is maximized by low-entropy mode-seeking rollouts that CE
  cannot produce but SCST's risk-seeking estimator finds.

Writes ``CONVERGENCE.json`` (committed at the repo root);
tests/test_convergence.py asserts the recorded deltas' signs so a
regression that flips any of them fails CI when the artifact is
regenerated:

    python tools/convergence_run.py            # ~10 min on one TPU chip
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_bench_cache")

EPOCHS = 12
START_RL = 6


def run(out_path: str = "CONVERGENCE.json", data_root: str = "",
        log_root: str = "") -> dict:
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from scanpaths_tpu.cli.train import main as train_main
    from tools.make_synth_data import make_osie_headroom

    data_root = data_root or join(tempfile.gettempdir(),
                                  "sp_convergence_headroom")
    if not os.path.exists(join(data_root, "fixations")):
        # 16 val images x 8 subjects x 4 eval rollouts keeps the val
        # scalar's sampling noise well under the expected RL lift
        make_osie_headroom(data_root, np.random.default_rng(7),
                           n_train=96, n_val=16)
    log_root = log_root or tempfile.mkdtemp(prefix="sp_convergence_")

    argv = [
        "--task", "osie",
        "--img_dir", join(data_root, "stimuli"),
        "--fix_dir", join(data_root, "fixations"),
        "--log_root", log_root,
        "--batch", "16", "--lr", "3e-4",
        "--epoch", str(EPOCHS), "--start_rl_epoch", str(START_RL),
        "--warmup_epoch", "1",
        "--rl_sample_number", "5", "--eval_repeat_num", "4",
        # the corpus needs lr 3e-4 to converge supervised in 6 epochs;
        # SCST runs at 0.15 * 3e-4 = 4.5e-5 initial (decaying) — the
        # reference's working RL step size (1e-4 * 0.5 decay).  The
        # r5 stability grid (2 corpus seeds x 2 step sizes,
        # 2026-08-21): at 7.5e-5 corpus-seed 7 climbs (+0.038 lift)
        # but seed 8 COLLAPSES into the zero-reward absorbing state
        # (reward 0.39 -> 0.0004, rollouts degenerating to voided
        # pairs); at 4.5e-5 BOTH seeds lift over supervised_save
        # (7: 0.4146 vs 0.3803; 8: 0.4008 vs 0.3774) and rollout
        # validity holds >0.91 — the robust setting, worth the ~10%
        # smaller lift
        "--rl_lr_initial_decay", "0.15",
        "--backbone_layers", "1,1,1,1", "--embed", "128",
        "--half_precision", "true", "--device_eval", "true",
        "--seed", "0", "--cache_images", "true",
    ]
    train_main(argv)

    (run_dir,) = [d for d in os.listdir(log_root)
                  if not d.endswith("_supervised_save")]
    run_dir = join(log_root, run_dir)

    # ---- parse the scalar stream the run produced ----
    series = defaultdict(list)
    with open(join(run_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            series[rec["tag"]].append((rec["step"], rec["value"]))

    losses = [v for _, v in series["loss/loss"]]
    # Trainer.fit runs epochs 0..EPOCHS-1 (RecordManager inits epoch
    # -1), so supervised epochs are 0..START_RL-1 (START_RL of them,
    # one val eval each) and RL epochs START_RL..EPOCHS-1
    n_sup_epochs = START_RL
    steps_per_epoch = len(losses) // n_sup_epochs
    val_metric = [v for _, v in series["current metric"]]
    rewards = [v for _, v in series["reward_hmean"]]
    n_rl_epochs = EPOCHS - START_RL
    rl_steps_per_epoch = len(rewards) // max(n_rl_epochs, 1)

    def mean(xs):
        return float(np.mean(xs)) if len(xs) else float("nan")

    sup_val = val_metric[:n_sup_epochs]
    rl_val = val_metric[n_sup_epochs:]
    # the epoch-(START_RL-1) eval IS the state RL resumes from (the
    # supervised_save dir copy happens right after that eval)
    supervised_save_metric = sup_val[-1]
    out = {
        "config": {"epochs_run": EPOCHS, "start_rl_epoch": START_RL,
                   "batch": 16, "lr": 3e-4, "corpus":
                       "make_osie_headroom(96 train imgs x 8 subj, "
                       "noise 40px, order-swap 0.3, dwell 100ms)",
                   "geometry": "240x320, T=16, thin trunk (1,1,1,1) "
                               "embed 128, bf16",
                   "regenerate": "python tools/convergence_run.py"},
        "supervised": {
            "loss_first_epoch_mean": round(mean(
                losses[:steps_per_epoch]), 4),
            "loss_last_epoch_mean": round(mean(
                losses[-steps_per_epoch:]), 4),
            "loss_curve_epoch_means": [
                round(mean(losses[i * steps_per_epoch:
                                  (i + 1) * steps_per_epoch]), 4)
                for i in range(n_sup_epochs)],
            "val_metric_per_epoch": [round(v, 4) for v in sup_val],
        },
        "rl": {
            "supervised_save_val_metric": round(supervised_save_metric, 4),
            "val_metric_per_epoch": [round(v, 4) for v in rl_val],
            "best_val_metric": round(max(rl_val), 4) if rl_val else None,
            "reward_first_epoch_mean": round(mean(
                rewards[:rl_steps_per_epoch]), 4),
            "reward_last_epoch_mean": round(mean(
                rewards[-rl_steps_per_epoch:]), 4),
            "reward_epoch_means": [
                round(mean(rewards[i * rl_steps_per_epoch:
                                   (i + 1) * rl_steps_per_epoch]), 4)
                for i in range(n_rl_epochs)],
            # collapse forensics: the fraction of rollouts scoring a
            # valid (non-voided) reward pair — a policy degenerating
            # to <3-fixation rollouts shows here before the reward
            # curve bottoms out
            "rollout_ok_frac_epoch_means": [
                round(mean([v for _, v in
                            series["rollout_ok_frac"]]
                           [i * rl_steps_per_epoch:
                            (i + 1) * rl_steps_per_epoch]), 4)
                for i in range(n_rl_epochs)],
        },
    }
    # The asserted deltas (tests/test_convergence.py) are the ones a
    # sign error in the advantage / LR / mask polarity reliably flips,
    # at thresholds stable under regeneration noise.  Collapse
    # calibration: with the RL step size 3x too large the phase
    # collapses monotonically (reward 0.48 -> 0.08, val 0.50 -> 0.14
    # over 3 epochs — recorded 2026-08-20 on the tight corpus), which
    # fails rl_reward_held and rl_val_held by 4-5x margins; a healthy
    # phase holds both.  ``rl_improved_over_supervised_save`` is the
    # LIFT assertion: on the headroom corpus (make_osie_headroom — CE
    # learns a diffuse marginal, the sequence reward favors the mode)
    # SCST must push the validation scalar ABOVE the supervised_save
    # snapshot, the improvement the reference exists to produce
    # (reference OSIE/train.py:252-258).
    out["deltas"] = {
        "supervised_loss_decreased":
            out["supervised"]["loss_last_epoch_mean"]
            < 0.8 * out["supervised"]["loss_first_epoch_mean"],
        "val_metric_improved_over_training":
            max(val_metric) > val_metric[0],
        "rl_improved_over_supervised_save":
            bool(rl_val) and max(rl_val) > supervised_save_metric,
        "rl_reward_held":
            out["rl"]["reward_last_epoch_mean"]
            >= 0.9 * out["rl"]["reward_first_epoch_mean"],
        "rl_val_held":
            bool(rl_val) and rl_val[-1] >= 0.8 * supervised_save_metric,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["deltas"]))
    shutil.rmtree(log_root, ignore_errors=True)
    return out


if __name__ == "__main__":
    run(*sys.argv[1:])
