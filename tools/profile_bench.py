"""Component-level timing breakdown of the flagship bench step.

VERDICT r1 asked where the non-MXU time of the decode benchmark goes;
trace parsing through the tunneled backend is unreliable, so this tool
answers it with component-scoped jits timed under the same honesty
protocol as bench.py (device-side checksums materialized on the host
inside the timed window).  Components:

  backbone   dilated ResNet-50 -> [N, 30, 40, 2048]
  hoisted    sal_conv + relu + xgates (once-per-forward decoder work)
  forward    the full model forward (backbone + hoisted + 16-step scan)
  step       forward + 10 stochastic decodes (the bench.py unit)

`scan = forward - backbone - hoisted` and `sampling = step - forward`
are derived; residuals against the analytic FLOP model localize the
MFU gap.  Prints one JSON line; run on a TPU host:

  BENCH_BATCH=512 python tools/profile_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BATCH = int(os.environ.get("BENCH_BATCH", "512"))
SAMPLES = 10
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def timed(fn, args, iters=ITERS, warmup=2):
    """Median wall time with a host-materialized scalar barrier per
    iteration (same honesty rule as bench.py: on the tunneled backend
    only host materialization truly waits)."""
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from bench import model_flops_per_image, peak_flops
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.ops.sampling import random_sample, sample_checksum

    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    model = create_model("osie", dtype=dtype)
    grid = GridSpec()
    images = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, 240, 320, 3), jnp.float32))(jax.random.PRNGKey(42))
    variables = jax.jit(lambda k: model.init(k, images, train=False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def backbone_only(v, im):
        f = model.apply(v, im, train=False,
                        method=lambda m, x, train: m.backbone(x, train=train))
        return jnp.sum(f.astype(jnp.float32))

    @jax.jit
    def hoisted_only(v, im):
        def run(m, x, train):
            import flax.linen as nn
            feats = m.backbone(x, train=train)
            visual = nn.relu(m.sal_conv(feats))
            return m.xgates(visual)
        xg = model.apply(v, im, train=False, method=run)
        return jnp.sum(xg.astype(jnp.float32))

    @jax.jit
    def forward_only(v, im):
        out = model.apply(v, im, train=False)
        return jnp.sum(out["all_actions_prob"])

    @jax.jit
    def full_step(v, im, key):
        out = model.apply(v, im, train=False)
        keys = jax.random.split(key, SAMPLES)
        samples = jax.vmap(lambda k: random_sample(
            k, out["all_actions_prob"], out["log_normal_mu"],
            out["log_normal_sigma2"], grid))(keys)
        return sample_checksum(samples)

    key = jax.random.PRNGKey(1)
    t_bb = timed(backbone_only, (variables, images))
    t_ho = timed(hoisted_only, (variables, images))
    t_fw = timed(forward_only, (variables, images))
    t_st = timed(full_step, (variables, images, key))

    # analytic FLOP split (mirrors bench.model_flops_per_image)
    f_total = model_flops_per_image()
    f_fw_ideal = f_total * BATCH / peak_flops(DTYPE)

    out = {
        "metric": "bench_component_breakdown",
        "batch": BATCH,
        "dtype": DTYPE,
        "ms": {
            "backbone": round(t_bb * 1e3, 1),
            "hoisted(sal_conv+xgates)": round((t_ho - t_bb) * 1e3, 1),
            "decode_scan": round((t_fw - t_ho) * 1e3, 1),
            "sampling_x10": round((t_st - t_fw) * 1e3, 1),
            "full_step": round(t_st * 1e3, 1),
        },
        "mfu_full_step": round(f_fw_ideal / t_st, 4),
        "note": ("components are nested jits timed independently; "
                 "derived rows are differences, so fusion boundaries "
                 "shift a few ms between scopes"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
