"""Fused Pallas bottleneck stage (ops/pallas_block.py) vs the flax stack.

Interpret-mode equivalence of the whole-stage kernel — BN folding,
1x1 -> 3x3(dilated) -> 1x1 + residual chains — against the repo's own
Bottleneck (reference semantics OSIE/models/resnet.py:57-130 with the
SAM dilation patch), plus the halo-layout invariants that let stages
chain without relayout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from scanpaths_tpu.models.resnet import Bottleneck
from scanpaths_tpu.ops import pallas_block as pb


def _stack(planes, blocks, dilation):
    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for bi in range(blocks):
                x = Bottleneck(planes=planes, stride=1, dilation=dilation,
                               has_downsample=False, name=f"b{bi}")(x, False)
            return x
    return Stack()


def _randomized_variables(mod, x, seed):
    """init, then randomize BN stats and scale/bias so folding is
    actually exercised (fresh-init stats are 0-mean/1-var no-ops)."""
    vs = mod.init(jax.random.PRNGKey(seed), x)
    keys = iter(jax.random.split(jax.random.PRNGKey(seed + 1), 200))

    def rnd_stats(path, leaf):
        k = next(keys)
        if path[-1].key == "var":
            return jnp.abs(jax.random.normal(k, leaf.shape)) + 0.5
        return jax.random.normal(k, leaf.shape) * 0.2

    leaves, td = jax.tree_util.tree_flatten_with_path(vs["batch_stats"])
    bs = jax.tree_util.tree_unflatten(td, [rnd_stats(p, l)
                                           for p, l in leaves])

    def rnd_params(path, leaf):
        name = path[-1].key
        if name == "scale":
            return 1.0 + jax.random.normal(next(keys), leaf.shape) * 0.3
        if name == "bias":
            return jax.random.normal(next(keys), leaf.shape) * 0.3
        return leaf

    leaves, td = jax.tree_util.tree_flatten_with_path(vs["params"])
    params = jax.tree_util.tree_unflatten(td, [rnd_params(p, l)
                                               for p, l in leaves])
    return {"params": params, "batch_stats": bs}


@pytest.mark.parametrize(
    "h,w,c4,m,dil,nb",
    [(6, 8, 256, 64, 1, 2),       # layer1 shape class
     (5, 10, 512, 128, 1, 3),     # layer2 (non-square grid)
     (6, 8, 512, 128, 2, 2)])     # dilation-2 ring (layer3 class)
def test_stage_matches_flax(h, w, c4, m, dil, nb):
    mod = _stack(m, nb, dil)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c4), jnp.float32)
    vs = _randomized_variables(mod, x, 7)
    ref = mod.apply(vs, x)

    st = pb.stack_stage_params(vs["params"], vs["batch_stats"],
                               [f"b{i}" for i in range(nb)], jnp.float32)
    out = pb.stage_apply(x, dil, st["w1"], st["b1"], st["w2"], st["b2"],
                         st["w3"], st["b3"], interpret=True)
    # dense in / dense out; the halo layout (whose zero-ring and
    # junk-column invariants the taps depend on) is kernel-internal
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_backbone_matches_flax():
    """fused_backbone_apply (stem + folded-BN b0 convs + whole-stage
    kernels) == DilatedResNet50.apply(train=False) from shared
    variables, at a small geometry where every stage has one uniform
    block behind the kernel (layers=(2,2,2,2))."""
    from scanpaths_tpu.models.resnet import (DilatedResNet50,
                                             fused_backbone_apply)

    layers = (2, 2, 2, 2)
    mod = DilatedResNet50(layers=layers)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 64, 3),
                          jnp.float32)
    vs = _randomized_variables(mod, x, 11)
    ref = mod.apply(vs, x, train=False)
    out = fused_backbone_apply(vs, x, layers=layers, dtype=jnp.float32,
                               interpret=True)
    assert out.shape == ref.shape == (2, 6, 8, 2048)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fold_bn_is_exact():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16))
    gamma = 1.0 + jax.random.normal(jax.random.PRNGKey(1), (16,)) * 0.3
    beta = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.2
    mean = jax.random.normal(jax.random.PRNGKey(3), (16,)) * 0.1
    var = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (16,))) + 0.5
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 6, 8))

    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_ref = gamma * (y_ref - mean) / jnp.sqrt(var + 1e-5) + beta

    kf, bf = pb.fold_bn(k, gamma, beta, mean, var)
    y = jax.lax.conv_general_dilated(
        x, kf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
