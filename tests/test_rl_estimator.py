"""Masked-expectation RL estimator vs the reference's rejection rule
(train/steps.py docstring; VERDICT r1 weak #3).

Pins the AGREEMENT between the two mechanisms on the same rollouts:
* when the reference-style acceptance probe (tools/rl_estimator_ab.py
  ``rollout_reward_ok`` — every image has >= 1 valid MultiMatch pair)
  accepts all derived rollouts of a key, the masked estimator reports
  ``rollout_ok_frac == 1`` — nothing voided, so its loss IS the plain
  REINFORCE sum the reference computes on accepted draws;
* when the probe rejects, the masked metrics flag voided entries
  consistently (frac bounded by the per-rollout acceptance count).

The stochastic-regime comparison (E[grad] cosine, reward trajectories)
is the artifact docs/RL_ESTIMATOR_AB.md from tools/rl_estimator_ab.py,
whose tiny_setup boosts the STOP bias so short-prediction rejections
actually occur.
"""

import sys
from os.path import dirname, join

import numpy as np
import pytest

import jax

sys.path.insert(0, join(dirname(dirname(__file__)), "tools"))

import rl_estimator_ab as ab  # noqa: E402
from scanpaths_tpu.train import steps  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    return ab.tiny_setup()


def test_acceptance_probe_agrees_with_masking(setup):
    """Across draws: all-accepted <=> ok_frac == 1; any rejection <=>
    voided entries in the masked metrics; and the voided fraction is
    bounded by the number of rejected rollouts."""
    model, variables, batch, cfg, grid = setup
    n_imgs = np.asarray(batch["gt_fix"]).shape[0]
    r = cfg.rl_sample_number
    saw_reject = saw_clean = 0
    for d in range(10):
        key = jax.random.PRNGKey(100 + d)
        rollout_keys = jax.random.split(jax.random.fold_in(key, 1), r)
        oks = [ab.rollout_reward_ok(model, variables, batch, cfg, grid, rk)
               for rk in rollout_keys]
        _, metrics = steps.rl_loss(model, variables["params"],
                                   variables["batch_stats"], batch, key,
                                   cfg)
        frac = float(metrics["rollout_ok_frac"])
        if all(oks):
            saw_clean += 1
            assert frac == 1.0, (d, frac)
        else:
            saw_reject += 1
            assert frac < 1.0, (d, frac)
            # each rejected rollout voids >= 1 of its images
            n_rej = sum(1 for ok in oks if not ok)
            assert frac <= 1.0 - n_rej / (r * n_imgs) + 1e-6
    # the setup is tuned so BOTH regimes occur across 10 draws
    assert saw_reject >= 1, "no rejection sampled - setup drifted"
    assert saw_clean >= 1, "no clean draw sampled - setup drifted"
