"""Space-to-depth stem exactness: ``stem_impl="s2d"`` must be the
SAME function as the pixel-space 7x7/stride-2/pad-3 stem convolution
(reference OSIE/models/resnet.py:96 ``conv1``) — same parameter tree,
same numbers up to conv-sum reassociation.  The transform exists purely
to feed the MXU a 12-wide contraction instead of a 3-wide one
(models/resnet.py::s2d_stem_conv derivation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanpaths_tpu.models.resnet import DilatedResNet50, s2d_stem_conv


def _conv7_s2_p3(x, k7, dtype=jnp.float32):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k7.astype(dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_stem_equals_conv_stem_f64():
    """Kernel-level identity in float64: the regrouped sum is the same
    sum, so agreement is to reassociation noise (~1e-14), not a model
    tolerance."""
    with jax.enable_x64(True):
        key = jax.random.PRNGKey(0)
        kx, kk = jax.random.split(key)
        for h, w in ((14, 14), (240, 320), (40, 48)):
            x = jax.random.normal(kx, (2, h, w, 3), jnp.float64)
            k7 = jax.random.normal(kk, (7, 7, 3, 64), jnp.float64)
            want = _conv7_s2_p3(x, k7, jnp.float64)
            got = s2d_stem_conv(x, k7, jnp.float64)
            assert got.shape == want.shape == (2, h // 2, w // 2, 64)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-12, atol=1e-12)


def test_s2d_stem_odd_input_refused():
    x = jnp.zeros((1, 15, 16, 3))
    k7 = jnp.zeros((7, 7, 3, 64))
    with pytest.raises(AssertionError):
        s2d_stem_conv(x, k7)


def test_backbone_s2d_same_params_same_features():
    """The two stem_impl variants share one parameter tree (checkpoints
    port unchanged in both directions) and produce the same stride-8
    features in float32."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 96, 3)),
                    jnp.float32)
    conv = DilatedResNet50(layers=(1, 1, 1, 1), stem_impl="conv")
    s2d = DilatedResNet50(layers=(1, 1, 1, 1), stem_impl="s2d")
    variables = jax.jit(lambda k: conv.init(k, x))(jax.random.PRNGKey(1))
    v2 = jax.jit(lambda k: s2d.init(k, x))(jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(variables) \
        == jax.tree_util.tree_structure(v2)
    assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)

    want = jax.jit(lambda v: conv.apply(v, x))(variables)
    got = jax.jit(lambda v: s2d.apply(v, x))(variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
