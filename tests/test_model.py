"""Model forward: shapes, task variants, train/eval semantics, gradient
flow.  Uses a reduced geometry (80x96 input -> 10x12 grid) AND a thin
trunk (one bottleneck per stage, embed 128) so the stride-8 backbone +
decode run in seconds on the single-core CPU test backend — the
semantics under test are size-independent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanpaths_tpu.core.grid import GridSpec
from scanpaths_tpu.models.scanpath_model import ScanpathModel
from scanpaths_tpu.ops.sampling import random_sample, to_fix_vectors

MH, MW = 10, 12
H, W = 8 * MH, 8 * MW
T = 6
A = MH * MW + 1
N = 2


TINY = dict(embed=128, backbone_layers=(1, 1, 1, 1))


def make_model(task):
    return ScanpathModel(task=task, seq_len=T, map_h=MH, map_w=MW, **TINY)


def init_and_apply(task, train, rng_seed=0, **inputs):
    model = make_model(task)
    images = jnp.asarray(
        np.random.default_rng(rng_seed).normal(size=(N, H, W, 3)),
        jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, images, train=False, **inputs)
    )(jax.random.PRNGKey(0))
    if train:
        out, _ = jax.jit(
            lambda v: model.apply(v, images, train=True,
                                  mutable=["batch_stats"], **inputs)
        )(variables)
    else:
        out = jax.jit(
            lambda v: model.apply(v, images, train=False, **inputs)
        )(variables)
    return model, variables, out


def test_osie_shapes_and_softmax():
    _, _, out = init_and_apply("osie", train=False)
    assert out["all_actions_prob"].shape == (N, T, A)
    np.testing.assert_allclose(np.asarray(out["all_actions_prob"]).sum(-1),
                               1.0, rtol=1e-5)
    assert out["log_normal_mu"].shape == (N, T)
    assert np.all(np.asarray(out["log_normal_sigma2"]) > 0)
    assert out["action_map"].shape == (N, T, MH, MW)
    # training mode returns raw logits under the osie key name
    _, _, tout = init_and_apply("osie", train=True)
    assert "actions" in tout
    assert not np.allclose(np.asarray(tout["actions"]).sum(-1), 1.0)


def test_feature_extraction_impls_agree(monkeypatch):
    """SP_FEAT_IMPL=factored (hoisted channel mean + one contraction)
    must compute the same forward as the literal two-mean product path
    — the factorization is exact up to float reassociation, checked
    through the full T-step feedback loop (the amap re-enters the
    attention history, so a real divergence would compound)."""
    outs = {}
    for impl in ("prod", "factored"):
        monkeypatch.setenv("SP_FEAT_IMPL", impl)
        # air exercises the attention-map input AND two streams
        att = jnp.asarray(
            np.abs(np.random.default_rng(3).normal(size=(N, MH, MW, 1))),
            jnp.float32)
        _, _, outs[impl] = init_and_apply("air", train=False,
                                          attention_maps=att)
    for k in outs["prod"]:
        np.testing.assert_allclose(
            np.asarray(outs["factored"][k]), np.asarray(outs["prod"][k]),
            rtol=2e-4, atol=1e-6, err_msg=k)

    # training path: gradients through the factored extraction must
    # match too (the VJP no longer materializes the [N,H,W,C] product)
    model = make_model("osie")
    images = jnp.asarray(
        np.random.default_rng(7).normal(size=(N, H, W, 3)), jnp.float32)
    grads = {}
    for impl in ("prod", "factored"):
        monkeypatch.setenv("SP_FEAT_IMPL", impl)
        variables = jax.jit(
            lambda k: model.init(k, images, train=False)
        )(jax.random.PRNGKey(0))

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, train=True, mutable=["batch_stats"])
            return jnp.sum(out["actions"] ** 2) + jnp.sum(
                out["log_normal_mu"] ** 2)
        grads[impl] = jax.jit(jax.grad(loss))(variables["params"])
    from jax.flatten_util import ravel_pytree
    flat_p, _ = ravel_pytree(grads["prod"])
    flat_f, _ = ravel_pytree(grads["factored"])
    scale = float(jnp.max(jnp.abs(flat_p))) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_f) / scale,
                               np.asarray(flat_p) / scale,
                               rtol=2e-4, atol=5e-6)


def test_air_dual_stream():
    att = jnp.ones((N, MH, MW, 1), jnp.float32)
    _, _, out = init_and_apply("air", train=False, attention_maps=att)
    for k in ("good_all_actions_prob", "poor_all_actions_prob",
              "good_action_map", "poor_log_normal_sigma2"):
        assert k in out
    # good and poor streams differ (different conditioner convs)
    assert not np.allclose(np.asarray(out["good_all_actions_prob"]),
                           np.asarray(out["poor_all_actions_prob"]))
    # training selection picks per-sample stream
    perf = jnp.array([True, False])
    _, _, tout = init_and_apply("air", train=True, attention_maps=att,
                                performances=perf)
    assert tout["all_actions_prob"].shape == (N, T, A)


def test_coco_bank_dispatch_and_grads():
    att = jnp.ones((N, MH, MW, 1), jnp.float32)
    tids = jnp.array([3, 7], jnp.int32)
    model = make_model("coco")
    images = jnp.asarray(np.random.default_rng(0).normal(size=(N, H, W, 3)),
                         jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, images, train=False, attention_maps=att,
                             task_ids=tids))(jax.random.PRNGKey(0))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=True, attention_maps=att, task_ids=tids,
            mutable=["batch_stats"])
        return (out["actions"] ** 2).mean()

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    bank = np.asarray(grads["conditioner"]["bank_kernel"])
    used = {3, 7}
    for k in range(18):
        nz = np.abs(bank[k]).sum() > 0
        assert nz == (k in used), f"head {k}: grad nonzero={nz}"


def test_sampler_semantics():
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=2)
    rng = np.random.default_rng(0)
    probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(N, T, A)),
                                       jnp.float32), -1)
    # force STOP extremely likely everywhere
    probs_stop = probs.at[..., 0].set(1e6)
    probs_stop = probs_stop / probs_stop.sum(-1, keepdims=True)
    mu = jnp.zeros((N, T))
    sigma2 = jnp.ones((N, T)) * 0.01
    s = jax.jit(lambda k, p, m, s2: random_sample(k, p, m, s2, grid))(
        jax.random.PRNGKey(1), probs_stop, mu, sigma2)
    # min_length masking: no STOP in the first 2 steps
    assert np.all(np.asarray(s.actions)[:, :2] != 0)
    # first allowed STOP is at index 2
    np.testing.assert_array_equal(np.asarray(s.actions)[:, 2], 0)
    np.testing.assert_array_equal(np.asarray(s.scanpath_length), 2)
    np.testing.assert_array_equal(np.asarray(s.fix_len), 2)
    np.testing.assert_array_equal(np.asarray(s.action_mask).sum(-1), 3)
    np.testing.assert_array_equal(np.asarray(s.duration_mask).sum(-1), 2)
    # pixel geometry: cell centers
    fv = to_fix_vectors(s)
    assert len(fv) == N and len(fv[0]) == 2
    gx, gy = grid.x_granularity, grid.y_granularity
    assert np.all((fv[0]["start_x"] - gx / 2) % gx == 0)
    assert np.all((fv[0]["start_y"] - gy / 2) % gy == 0)


def test_sampler_duration_quirk():
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=1)
    probs = jnp.full((4096, T, A), 1.0 / A)
    mu = jnp.full((4096, T), 0.5)
    sigma2 = jnp.full((4096, T), 2.0)
    s = jax.jit(lambda k, p, m, s2: random_sample(k, p, m, s2, grid))(
        jax.random.PRNGKey(0), probs, mu, sigma2)
    # durations = exp(r*sigma2 + mu): log-durations have std sigma2 (the
    # reference quirk), not sqrt(sigma2)
    logd = np.log(np.asarray(s.durations)).ravel()
    assert abs(logd.mean() - 0.5) < 0.05
    assert abs(logd.std() - 2.0) < 0.05


def test_greedy_sample_deterministic():
    from scanpaths_tpu.ops.sampling import greedy_sample

    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=2)
    rng = np.random.default_rng(3)
    probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(N, T, A)),
                                       jnp.float32), -1)
    mu = jnp.asarray(rng.normal(size=(N, T)), jnp.float32)
    sigma2 = jnp.ones((N, T), jnp.float32)
    s1 = jax.jit(lambda p, m, s2: greedy_sample(p, m, s2, grid))(
        probs, mu, sigma2)
    s2_ = jax.jit(lambda p, m, s2: greedy_sample(p, m, s2, grid))(
        probs, mu, sigma2)
    np.testing.assert_array_equal(np.asarray(s1.actions),
                                  np.asarray(s2_.actions))
    # argmax of the STOP-masked distribution, STOP never in first 2 steps
    masked = np.array(probs)    # writable copy
    masked[:, :2, 0] = 0
    np.testing.assert_array_equal(np.asarray(s1.actions),
                                  masked.argmax(-1))
    # durations are the LogNormal median exp(mu)
    np.testing.assert_allclose(np.asarray(s1.durations),
                               np.exp(np.asarray(mu)), rtol=1e-6)
