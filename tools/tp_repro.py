"""Checked-in reproducer for the XLA-partitioner miscompile that forces
the training path's gather-at-entry (ZeRO-3) design under
``--model_parallel`` (train/mesh.py:26-47).

Two sections, each printing one JSON line per (partitioner, config)
cell with expected-vs-got:

1. **Toy scan** — ``lax.scan`` over a gated-conv cell whose kernel is a
   scan-broadcast constant sharded along its contraction (input
   channel) dimension on a 2-D (data x model) mesh.  This simple case
   is compiled CORRECTLY by both partitioners (narrowing evidence: the
   trigger is not bare scan+sharded-contraction).

2. **Tiny real model** — the repo's actual ``ScanpathModel`` (decode
   scan with history attention, factorized signal gates, fused or
   unfused conditioner+head) at 10x12 geometry, params sharded by
   ``train.mesh.state_sharding`` (the row-parallel spec used under
   ``--model_parallel``), supervised loss differentiated with the
   SHARDED compute (no gather-at-entry).  Measured on jax 0.9.0 /
   CPU backend, 2x2 mesh (identical for both mesh axis orders):

   =============  =========  =============================================
   cell           loss       gradients (vs replicated)
   =============  =========  =============================================
   gspmd/fused    exact      ConvLSTM gate kernel exactly ~2.0x, xgates
                             ~1.1 rel err; non-scan leaves match
   shardy/fused   WRONG      loss_duration off by 0.083 inside
                             value_and_grad (forward-only is fine)
   gspmd/nofuse   WRONG      loss off 0.070; gate kernel ~4.4x
   shardy/nofuse  WRONG      loss off 0.088; gate kernel ~2.1x
   =============  =========  =============================================

The gather-at-entry training step (steps.supervised_step
``params_gather``) sidesteps every failing cell because its internal
program is the replicated one — that equivalence is pinned by
tests/test_mesh.py.  Run this script after a jax/XLA upgrade: exit 0
(all cells correct) means the upstream bug is fixed and the sharded
compute path can be re-evaluated; exit 1 means the status quo stands.

The persistent compilation cache is disabled in-process so a stale
AOT artifact can never masquerade as a miscompile.

Usage:
    python tools/tp_repro.py          # ~5 min on a 1-core CPU host
"""

from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import (Mesh, NamedSharding,  # noqa: E402
                          PartitionSpec as P)

# sitecustomize may have pre-imported jax with the TPU plugin; the
# config update wins as long as no backend has been used yet
# (tests/conftest.py documents the same race)
jax.config.update("jax_platforms", "cpu")
# no persistent cache: every cell must be compiled fresh by the
# partitioner under test
jax.config.update("jax_compilation_cache_dir", None)

REL_TOL = 1e-4


def _mesh22(order=("data", "model")) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), order)


def _grad_cell(tag, loss_fn, params, param_shardings, ref, extra_leaves):
    """Run value_and_grad under the current partitioner with sharded-
    compute params; compare against the replicated reference."""
    ref_loss, ref_grads = ref
    m = param_shardings
    rep = NamedSharding(next(iter(jax.tree.leaves(m))).mesh, P())
    f = jax.jit(jax.value_and_grad(loss_fn),
                in_shardings=(m,), out_shardings=(rep, m))
    loss, grads = f(jax.device_put(params, m))
    loss = float(loss)
    cell = {"cell": tag, "expected_loss": round(float(ref_loss), 6),
            "got_loss": round(loss, 6),
            "loss_ok": bool(abs(loss - float(ref_loss))
                            <= REL_TOL * max(abs(float(ref_loss)), 1.0))}
    worst = 0.0
    for (kp, vp), (_, vr) in zip(jax.tree_util.tree_leaves_with_path(grads),
                                 jax.tree_util.tree_leaves_with_path(
                                     ref_grads)):
        d = float(np.abs(np.asarray(vp) - np.asarray(vr)).max())
        mx = float(np.abs(np.asarray(vr)).max())
        worst = max(worst, d / max(mx, 1e-6))
    cell["grad_worst_rel_err"] = round(worst, 4)
    for name, (got_leaf, ref_leaf) in extra_leaves(grads, ref_grads).items():
        g, r = np.asarray(got_leaf), np.asarray(ref_leaf)
        sel = np.abs(r) > 0.1 * max(np.abs(r).max(), 1e-12)
        ratio = float((g[sel] / r[sel]).mean()) if sel.any() else float("nan")
        cell[f"{name}_grad_ratio"] = round(ratio, 4)
    cell["correct"] = bool(cell["loss_ok"] and worst <= REL_TOL)
    print(json.dumps(cell))
    return cell["correct"]


# ---------------------------------------------------------------------------
# Section 1: toy scan + contraction-sharded broadcast kernel (passes)
# ---------------------------------------------------------------------------

def toy_section() -> bool:
    N, H, W, C, T = 4, 8, 8, 8, 3

    def loss_fn(kernel, x=None):
        def body(h, _):
            g = jax.lax.conv_general_dilated(
                h, kernel, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            i, o = jnp.split(g, 2, axis=-1)
            h2 = jax.nn.sigmoid(i) * jnp.tanh(o) + h
            return h2, h2.mean()

        h, ys = jax.lax.scan(body, loss_fn.x, None, length=T)
        return ys.sum() + (h * h).mean()

    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(0, 0.3, (3, 3, C, 2 * C)), jnp.float32)
    loss_fn.x = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.float32)
    ref = jax.jit(jax.value_and_grad(loss_fn))(kernel)

    ok = True
    for shardy in (False, True):
        jax.config.update("jax_use_shardy_partitioner", shardy)
        mesh = _mesh22()
        k_sh = NamedSharding(mesh, P(None, None, "model", None))
        ok &= _grad_cell(
            f"toy/{'shardy' if shardy else 'gspmd'}", loss_fn, kernel,
            k_sh, ref, lambda g, r: {"kernel": (g, r)})
    jax.config.update("jax_use_shardy_partitioner", False)
    return ok


# ---------------------------------------------------------------------------
# Section 2: the repo's model at tiny geometry (fails today)
# ---------------------------------------------------------------------------

def model_section() -> bool:
    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.train import losses
    from scanpaths_tpu.train import mesh as meshmod

    KW = dict(seq_len=3, map_h=10, map_w=12, embed=16,
              backbone_layers=(1, 1, 1, 1))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(4, 80, 96, 3)), jnp.float32)
    a = 10 * 12 + 1
    scan = jax.nn.one_hot(jnp.asarray(rng.integers(0, a, (4, 3))), a,
                          dtype=jnp.float32)
    dur = jnp.asarray(rng.uniform(0.1, 0.6, (4, 3)), jnp.float32)
    ones = jnp.ones((4, 3), jnp.float32)

    ok = True
    for fuse in (True, False):
        model = create_model("osie", fuse_head=fuse, **KW)
        variables = model.init(jax.random.PRNGKey(0), images, train=False)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, train=True, mutable=["batch_stats"])
            la = losses.cross_entropy_loss(out["actions"], scan, ones)
            ld = losses.mlp_log_normal_distribution(
                out["log_normal_mu"], out["log_normal_sigma2"], dur, ones)
            return la + ld

        ref = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        for shardy in (False, True):
            jax.config.update("jax_use_shardy_partitioner", shardy)
            psh = meshmod.state_sharding(_mesh22(), variables["params"])
            ok &= _grad_cell(
                f"model/{'shardy' if shardy else 'gspmd'}"
                f"/{'fused' if fuse else 'nofuse'}",
                loss_fn, variables["params"], psh, ref,
                lambda g, r: {
                    "lstm_gate_kernel": (g["lstm"]["gates_h"]["kernel"],
                                         r["lstm"]["gates_h"]["kernel"]),
                    "xgates_kernel": (g["xgates"]["gates_x"]["kernel"],
                                      r["xgates"]["gates_x"]["kernel"]),
                })
        jax.config.update("jax_use_shardy_partitioner", False)
    return ok


def main():
    assert jax.device_count() >= 4, jax.devices()
    toy_ok = toy_section()
    model_ok = model_section()
    verdict = {
        "toy_scan_correct": toy_ok,
        "model_correct": model_ok,
        "verdict": (
            "NOT REPRODUCED: sharded-compute training matches the "
            "replicated program — re-evaluate train/mesh.py's "
            "gather-at-entry design" if model_ok else
            "REPRODUCED: the partitioners miscompile value_and_grad of "
            "the decode scan with contraction-sharded kernels (while "
            "the toy scan case is fine) — gather-at-entry stands"),
    }
    print(json.dumps(verdict))
    return 0 if model_ok else 1


if __name__ == "__main__":
    sys.exit(main())
