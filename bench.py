"""Flagship benchmark: scanpath generation throughput on the OSIE model
(full 240x320 geometry, T=16, 10 stochastic scanpaths per image —
the reference evaluation setting, eval_repeat_num=10).

Prints ONE JSON line:
  {"metric": "scanpaths_per_sec_per_chip", "value": N,
   "unit": "scanpaths/s/chip", "vs_baseline": N / 2500}

Baseline: the north-star target (BASELINE.md) is >2000 images/s at
>=8 samples/image on a v5e-8, i.e. 250 images/s/chip x 10 samples =
2500 scanpaths/s/chip.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SAMPLES = 10
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main():
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.ops.sampling import random_sample

    n_chips = max(jax.device_count(), 1)
    model = create_model("osie")
    grid = GridSpec()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BATCH, 240, 320, 3)), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, images, train=False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def step(variables, images, key):
        out = model.apply(variables, images, train=False)
        keys = jax.random.split(key, SAMPLES)
        samples = jax.vmap(lambda k: random_sample(
            k, out["all_actions_prob"], out["log_normal_mu"],
            out["log_normal_sigma2"], grid))(keys)
        return samples.fix, samples.fix_len

    key = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        fix, _ = step(variables, images, sub)
    jax.block_until_ready(fix)

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, sub = jax.random.split(key)
        fix, fl = step(variables, images, sub)
    jax.block_until_ready(fix)
    dt = time.perf_counter() - t0

    scanpaths = BATCH * SAMPLES * ITERS
    per_sec = scanpaths / dt
    per_sec_per_chip = per_sec / n_chips
    print(json.dumps({
        "metric": "scanpaths_per_sec_per_chip",
        "value": round(per_sec_per_chip, 2),
        "unit": "scanpaths/s/chip",
        "vs_baseline": round(per_sec_per_chip / 2500.0, 4),
    }))


if __name__ == "__main__":
    main()
