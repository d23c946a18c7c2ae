"""The fused conditioner+head evaluation must be EXACTLY the two-stage
computation (reference OSIE/models/baseline_attention.py:281-282 feeds
the 5x5 conditioner conv straight into predict_head, all of whose
consumers are linear 512->1 convs), up to float reassociation.

Strategy: run the same ScanpathModel with the same params twice —
``fuse_head=True`` vs ``fuse_head=False`` — in float64, where the
reassociation error of the composed kernels is ~1e-12, and assert the
full output trees agree to 1e-9.  A float32 smoke tolerance covers the
dtype actually used in training.  The drt border corrections (output
row 0 / col 0 of the strided 7x7-after-5x5 composition) are what this
test pins down hardest: composition without corrections is wrong by
O(1) exactly there.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanpaths_tpu.models.components import (
    ConvParams,
    PredictHead,
    apply_fused_cond_head,
    conv2d,
    fuse_cond_head,
)
from scanpaths_tpu.models.scanpath_model import create_model

MAP_H, MAP_W, EMBED = 30, 40, 64


def _rand_params(key, shape):
    return jax.random.normal(key, shape) * 0.1


def _head_raw(key, e, dtype):
    ks = jax.random.split(key, 6)
    return {
        "w2": (_rand_params(ks[0], (1, 1, e, 1)).astype(dtype),
               jnp.asarray([0.3], dtype)),
        "w3": (_rand_params(ks[1], (1, 1, e, 1)).astype(dtype),
               jnp.asarray([-0.2], dtype)),
        "kd": (_rand_params(ks[2], (7, 7, e, 1)).astype(dtype),
               jnp.asarray([0.11], dtype)),
        "kd2": (_rand_params(ks[3], (MAP_H // 5, MAP_W // 5, 1, 2))
                .astype(dtype), jnp.zeros((2,), dtype)),
    }


def _two_stage_drt(h, k1, b1, kd, bd, dtype):
    """Oracle: literal conditioner conv then literal drt conv."""
    o1 = conv2d(h, k1, b1, padding=((2, 2), (2, 2)), dtype=dtype)
    return conv2d(o1, kd, bd, strides=(5, 5), padding=((2, 2), (2, 2)),
                  dtype=dtype)[..., 0]


@pytest.mark.parametrize("hw", [(MAP_H, MAP_W), (10, 20)])
def test_fused_drt_matches_two_stage_f64(hw):
    mh, mw = hw
    with jax.enable_x64(True):
        key = jax.random.PRNGKey(0)
        k_h, k_c, k_hd = jax.random.split(key, 3)
        h = jax.random.normal(k_h, (3, mh, mw, EMBED), jnp.float64)
        k1 = _rand_params(k_c, (5, 5, EMBED, EMBED)).astype(jnp.float64)
        b1 = jnp.linspace(-0.5, 0.5, EMBED, dtype=jnp.float64)
        raw = _head_raw(k_hd, EMBED, jnp.float64)

        fused = fuse_cond_head(k1, b1, raw, mh, mw)
        _, _, d_fused = apply_fused_cond_head(h, fused, jnp.float64)

        kd, bd = raw["kd"]
        d_ref = _two_stage_drt(h, k1, b1, kd, bd, jnp.float64)
        np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref),
                                   rtol=1e-9, atol=1e-9)


def test_fused_stop_and_amap_match_two_stage_f64():
    with jax.enable_x64(True):
        key = jax.random.PRNGKey(1)
        k_h, k_c, k_hd = jax.random.split(key, 3)
        h = jax.random.normal(k_h, (2, MAP_H, MAP_W, EMBED), jnp.float64)
        k1 = _rand_params(k_c, (5, 5, EMBED, EMBED)).astype(jnp.float64)
        b1 = jnp.linspace(-0.3, 0.4, EMBED, dtype=jnp.float64)
        raw = _head_raw(k_hd, EMBED, jnp.float64)

        fused = fuse_cond_head(k1, b1, raw, MAP_H, MAP_W)
        stop, amap, _ = apply_fused_cond_head(h, fused, jnp.float64)

        o1 = conv2d(h, k1, b1, padding=((2, 2), (2, 2)), dtype=jnp.float64)
        w2k, w2b = raw["w2"]
        stop_ref = jnp.mean(
            conv2d(o1, w2k, w2b, dtype=jnp.float64).reshape(2, -1), axis=-1,
            keepdims=True)
        w3k, w3b = raw["w3"]
        amap_ref = jax.nn.relu(conv2d(o1, w3k, w3b,
                                      dtype=jnp.float64))[..., 0]
        np.testing.assert_allclose(np.asarray(stop), np.asarray(stop_ref),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(amap), np.asarray(amap_ref),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("task", ["osie", "air", "coco"])
def test_model_fused_equals_unfused(task):
    """Full-model f32 check: same params, fused vs literal path."""
    kw = dict(embed=48, seq_len=3, backbone_layers=(1, 1, 1, 1))
    fused_m = create_model(task, fuse_head=True, **kw)
    plain_m = create_model(task, fuse_head=False, **kw)

    n = 2
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(n, 240, 320, 3)), jnp.float32)
    extra = {}
    if task in ("air", "coco"):
        extra["attention_maps"] = jnp.asarray(
            rng.uniform(0, 1, (n, 30, 40, 1)), jnp.float32)
    if task == "coco":
        extra["task_ids"] = jnp.asarray([1, 7], jnp.int32)

    variables = fused_m.init(jax.random.PRNGKey(0), images, train=False,
                             **extra)
    # identical param trees: the fusion is evaluation-only
    plain_vars = plain_m.init(jax.random.PRNGKey(0), images, train=False,
                              **extra)
    chex_tree_a = jax.tree.map(lambda a: a.shape, variables)
    chex_tree_b = jax.tree.map(lambda a: a.shape, plain_vars)
    assert chex_tree_a == chex_tree_b

    out_f = fused_m.apply(variables, images, train=False, **extra)
    out_p = plain_m.apply(variables, images, train=False, **extra)
    assert set(out_f) == set(out_p)
    for k in out_f:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_p[k]),
            rtol=2e-3, atol=2e-4, err_msg=f"{task}:{k}")


def test_taps_sel_kernels_survive_first_call_under_jit():
    """The cached one-hot selection kernels must be jit-safe: if the
    FIRST call happens inside a trace and the cache holds a jnp array,
    a tracer leaks and every later call fails (bench.py hit this)."""
    from scanpaths_tpu.models import components as C
    C._sel_kernel_sa.cache_clear()
    C._sel_kernel_drt.cache_clear()
    key = jax.random.PRNGKey(3)
    k_h, k_c, k_hd = jax.random.split(key, 3)
    h = jax.random.normal(k_h, (2, MAP_H, MAP_W, EMBED), jnp.float32)
    k1 = _rand_params(k_c, (5, 5, EMBED, EMBED))
    b1 = jnp.linspace(-0.3, 0.4, EMBED)
    raw = _head_raw(k_hd, EMBED, jnp.float32)
    fused = fuse_cond_head(k1, b1, raw, MAP_H, MAP_W)

    # first call under jit (populates the cache inside the trace) ...
    jitted = jax.jit(lambda x: apply_fused_cond_head(x, fused, jnp.float32))
    stop_j, amap_j, d_j = jitted(h)
    # ... then an eager call must still work and agree
    stop_e, amap_e, d_e = apply_fused_cond_head(h, fused, jnp.float32)
    np.testing.assert_allclose(np.asarray(stop_j), np.asarray(stop_e),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_j), np.asarray(d_e),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_flow_to_all_cond_head_params():
    """Gradients must reach the conditioner and every head kernel
    through the composed path (the composition is differentiable)."""
    kw = dict(embed=32, seq_len=2, backbone_layers=(1, 1, 1, 1))
    m = create_model("osie", fuse_head=True, **kw)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(1, 240, 320, 3)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), images, train=True)

    aux = {k: v for k, v in variables.items() if k != "params"}

    def loss(params):
        out, _ = m.apply({"params": params, **aux}, images, train=True,
                         mutable=["batch_stats"])
        return (jnp.sum(out["actions"] ** 2)
                + jnp.sum(out["log_normal_mu"] ** 2)
                + jnp.sum(out["log_normal_sigma2"]))

    grads = jax.grad(loss)(variables["params"])
    for path in (("conditioner", "sal_layer", "kernel"),
                 ("conditioner", "sal_layer", "bias"),
                 ("head", "sal_layer_2", "kernel"),
                 ("head", "sal_layer_3", "kernel"),
                 ("head", "drt_layer_1", "kernel"),
                 ("head", "drt_layer_2", "kernel")):
        g = grads
        for p in path:
            g = g[p]
        assert float(jnp.abs(g).max()) > 0, path
