"""--remat (jax.checkpoint on the decode-scan body and the ResNet
bottlenecks) must change memory behaviour only.

The comparison runs in a SUBPROCESS with a plain single-device CPU
config: under a fixed compilation strategy, remat gradients match the
plain model's to float-exactness (measured max abs diff ~1e-13 across
all leaves).  It cannot run under the test session's own env —
conftest forces 8 virtual devices, which changes XLA's reduction
partitioning between the two traces, and the stem-BN bias gradient is
cancellation-prone enough in f32 that noise between *compilation
strategies* reaches ~25% on near-zero elements (measured: plain-eager
vs plain-jit differs 12x relative on that leaf)."""

import os
import subprocess
import sys
from pathlib import Path

_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np
from scanpaths_tpu.models.scanpath_model import create_model

KW = dict(seq_len=3, map_h=10, map_w=12, embed=16,
          backbone_layers=(1, 1, 1, 1))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(2, 80, 96, 3)), jnp.float32)
plain = create_model("osie", **KW)
variables = plain.init(jax.random.PRNGKey(0), images, train=False)

def loss(model, params):
    out = model.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      images, train=True, mutable=["batch_stats"])[0]
    return (out["actions"].sum() + out["log_normal_mu"].sum()
            + out["log_normal_sigma2"].sum())

# every remat mode reuses the SAME param tree (wrapping only the scan
# body / bottleneck blocks).  "all" and "policy" between them exercise
# every wrapper the other modes compose (backbone / scan /
# scan_policy), kept to two variants so the test stays compile-bounded.
l_p, g_p = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
flat_p = jax.tree_util.tree_leaves_with_path(g_p)
for mode in (True, "policy"):
    remat = create_model("osie", remat=mode, **KW)
    l_r, g_r = jax.value_and_grad(lambda p: loss(remat, p))(
        variables["params"])
    assert float(l_p) == float(l_r), (mode, float(l_p), float(l_r))
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    assert len(flat_p) == len(flat_r)
    worst = 0.0
    for (kp, vp), (kr, vr) in zip(flat_p, flat_r):
        assert kp == kr
        d = float(np.abs(np.asarray(vp) - np.asarray(vr)).max())
        m = float(np.abs(np.asarray(vp)).max())
        worst = max(worst, d / max(m, 1e-6))
        # absolute 1e-6 for near-zero leaves, else single-ulp-scale
        # relative: the fused conditioner+head composition
        # (components.fuse_cond_head) gives the remat trace a second,
        # differently-associated backward through the composed kernels,
        # so bit-exactness is no longer guaranteed on large-magnitude
        # grads (measured drift ~7e-8 relative)
        assert d <= 1e-6 + 1e-5 * m, (mode, kp, d, m)
    print("OK", mode, "max_rel_diff:", worst)
"""


def test_remat_identical_forward_and_grads():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single device, default partitioning
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent) \
        + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                          capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("max_rel_diff") == 2, proc.stdout
