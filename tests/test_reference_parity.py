"""Function-level goldens computed by EXECUTING the reference (torch)
implementations at test time — losses and the deterministic scanpath
decode.  The reference modules import with stock torch/numpy, so these
run the original code rather than trusting hand-copied constants.
(Reading and running /root/reference is allowed; copying its code into
the framework is not — this file only calls it.)"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/OSIE/models"


def _ref_module(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(f"ref_{name}",
                                                  f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ref_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_loss():
    return _ref_module("loss")


@pytest.fixture(scope="module")
def ref_sampling():
    return _ref_module("sampling")


def test_losses_match_executed_reference(ref_loss):
    from scanpaths_tpu.train import losses

    rng = np.random.default_rng(0)
    n, t, a = 3, 5, 13
    logits = rng.normal(size=(n, t, a)).astype(np.float32)
    gt = rng.uniform(0, 1, (n, t, a)).astype(np.float32)
    gt /= gt.sum(-1, keepdims=True)
    mask = (rng.uniform(size=(n, t)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    dur = rng.uniform(0.05, 1.2, (n, t)).astype(np.float32)
    mu = rng.normal(size=(n, t)).astype(np.float32)
    sigma2 = rng.uniform(0.1, 2.0, (n, t)).astype(np.float32)
    probs = rng.uniform(0.01, 1.0, (n, t)).astype(np.float32)

    tt = torch.tensor
    cases = [
        ("cross_entropy",
         ref_loss.CrossEntropyLoss(tt(logits), tt(gt), tt(mask)),
         losses.cross_entropy_loss(logits, gt, mask)),
        ("lognormal_nll",
         ref_loss.MLPLogNormalDistribution(tt(mu), tt(sigma2), tt(dur),
                                           tt(mask)),
         losses.mlp_log_normal_distribution(mu, sigma2, dur, mask)),
        ("rayleigh_nll",
         ref_loss.MLPRayleighDistribution(tt(sigma2), tt(dur), tt(mask)),
         losses.mlp_rayleigh_distribution(sigma2, dur, mask)),
        ("nss",
         ref_loss.NSS(tt(probs.reshape(n, t)), tt(mask)),
         losses.nss(probs.reshape(n, t), mask)),
        ("cc",
         ref_loss.CC(tt(probs.reshape(n, t)), tt(mask + 0.1)),
         losses.cc(probs.reshape(n, t), mask + 0.1)),
        ("kld",
         ref_loss.KLD(tt(probs.reshape(n, t)), tt(mask + 0.1)),
         losses.kld(probs.reshape(n, t), mask + 0.1)),
    ]
    for name, want, got in cases:
        assert float(got) == pytest.approx(float(want), rel=2e-5,
                                           abs=2e-6), name

    # per-sample REINFORCE terms [N]
    want_la = ref_loss.LogAction(tt(probs), tt(mask)).numpy()
    got_la = np.asarray(losses.log_action(probs, mask))
    np.testing.assert_allclose(got_la, want_la, rtol=2e-5)
    want_ld = ref_loss.LogDuration(tt(dur), tt(mu), tt(sigma2),
                                   tt(mask)).numpy()
    got_ld = np.asarray(losses.log_duration(dur, mu, sigma2, mask))
    np.testing.assert_allclose(got_ld, want_ld, rtol=2e-5)


def test_decode_matches_executed_reference(ref_sampling):
    """Force identical sampled actions/durations through both decoders
    and compare fixation vectors + masks (the deterministic part of
    reference sampling.py:56-77)."""
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.ops.sampling import random_sample, to_fix_vectors

    t_len, mh, mw = 6, 30, 40
    a = mh * mw + 1
    grid = GridSpec(map_width=mw, map_height=mh, width=320, height=240,
                    max_length=t_len, min_length=1)
    # actions: mid-stop, no-stop, immediate-stop-at-step-1, stop at end
    actions = np.array([
        [5, 77, 0, 3, 9, 11],
        [1, 2, 3, 4, 5, 6],
        [8, 0, 0, 2, 2, 2],
        [1200, 600, 301, 42, 7, 0],
    ], np.int64)
    n = actions.shape[0]
    rng = np.random.default_rng(1)
    durations = rng.uniform(0.1, 0.9, (n, t_len)).astype(np.float32)

    # ---- ours: one-hot probs + sigma2=0 force the exact trajectory ----
    probs = np.full((n, t_len, a), 1e-9, np.float32)
    probs[np.arange(n)[:, None], np.arange(t_len)[None], actions] = 1.0
    mu = np.log(durations)
    k_fixed = jax.random.PRNGKey(0)
    out = random_sample(k_fixed, jnp.asarray(probs), jnp.asarray(mu),
                        jnp.zeros((n, t_len), jnp.float32), grid)
    np.testing.assert_array_equal(np.asarray(out.actions), actions)
    ours_fv = to_fix_vectors(out)

    # ---- reference decode on the SAME actions/durations ----
    sampler = ref_sampling.Sampling(convLSTM_length=t_len, min_length=1,
                                    map_width=mw, map_height=mh,
                                    width=320, height=240)
    images = torch.zeros((n, 3, 8, 8))
    ref_fv, ref_am, ref_dm = sampler.generate_scanpath(
        images, torch.tensor(probs.max(-1)), torch.tensor(durations),
        torch.tensor(actions))

    for i in range(n):
        assert len(ours_fv[i]) == len(ref_fv[i]), i
        for field in ("start_x", "start_y", "duration"):
            np.testing.assert_allclose(
                np.asarray(ours_fv[i][field], np.float64),
                np.asarray(ref_fv[i][field], np.float64),
                rtol=1e-6, err_msg=f"sample {i} field {field}")
    np.testing.assert_array_equal(np.asarray(out.action_mask),
                                  ref_am.numpy())
    np.testing.assert_array_equal(np.asarray(out.duration_mask),
                                  ref_dm.numpy())
