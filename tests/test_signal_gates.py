"""SignalGates (the factorized rank-1 task-signal gate conv) must be
numerically identical — up to float reassociation — to the dense 3x3
conv over the materialized spatial (x) semantic outer product that it
replaces (the reference computes the dense conv over the materialized
product, OSIE/models/baseline_attention.py:40-44)."""

import jax
import jax.numpy as jnp
import numpy as np

from scanpaths_tpu.models.components import SignalGates


def _dense_reference(kernel, bias, s, cv):
    """conv3x3(s (x) cv) with the same kernel — the unfactorized form."""
    ss = s[..., None] * cv[:, None, None, :]          # [N, H, W, C]
    out = jax.lax.conv_general_dilated(
        ss, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def test_factorized_equals_dense_conv():
    n, h, w, c, g = 3, 10, 12, 16, 48
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(n, h, w)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)

    mod = SignalGates(features=g, in_features=c)
    variables = mod.init(jax.random.PRNGKey(1), s, cv)
    got = mod.apply(variables, s, cv)

    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    want = _dense_reference(kernel, bias, s, cv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_factorized_gradients_match_dense():
    n, h, w, c, g = 2, 6, 8, 8, 24
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(n, h, w)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    mod = SignalGates(features=g, in_features=c)
    variables = mod.init(jax.random.PRNGKey(3), s, cv)

    def loss_fact(params, s, cv):
        return jnp.sum(mod.apply({"params": params}, s, cv) ** 2)

    def loss_dense(params, s, cv):
        return jnp.sum(_dense_reference(params["kernel"], params["bias"],
                                        s, cv) ** 2)

    gf = jax.grad(loss_fact)(variables["params"], s, cv)
    gd = jax.grad(loss_dense)(variables["params"], s, cv)
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(np.asarray(gf[k]), np.asarray(gd[k]),
                                   rtol=1e-4, atol=1e-4)
    # input gradients too (they drive the attention memories upstream)
    gsf = jax.grad(loss_fact, argnums=1)(variables["params"], s, cv)
    gsd = jax.grad(loss_dense, argnums=1)(variables["params"], s, cv)
    np.testing.assert_allclose(np.asarray(gsf), np.asarray(gsd),
                               rtol=1e-4, atol=1e-4)


def test_param_tree_matches_replaced_conv():
    """Checkpoint compatibility: {kernel [3,3,C,G], bias [G]}."""
    mod = SignalGates(features=48, in_features=16)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 5, 5)), jnp.zeros((1, 16)))
    assert set(variables["params"]) == {"kernel", "bias"}
    assert variables["params"]["kernel"].shape == (3, 3, 16, 48)
    assert variables["params"]["bias"].shape == (48,)
