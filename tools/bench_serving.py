"""Serving-latency benchmark: single-image greedy decode
(BASELINE.json config 1) on the current backend.

Prints one JSON line with p50/p95 latency and images/s for batch-1 and
a small serving batch.  Same honesty rules as bench.py: every timed
iteration materializes a device-computed scalar on the host (the only
true barrier on a tunneled backend).

Usage: python tools/bench_serving.py            # current backend
       JAX_PLATFORMS=cpu python tools/bench_serving.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_bench_cache")

import jax
import jax.numpy as jnp

# sitecustomize pre-imports jax, so the env var above is read too late;
# set the config directly so repeat runs hit the persistent cache
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def main():
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.ops.sampling import greedy_sample, sample_checksum

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32
    model = create_model("osie", dtype=dtype)
    grid = GridSpec()
    rng = np.random.default_rng(0)
    # params are batch-shape-independent: init ONCE, reuse per batch size
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 240, 320, 3), jnp.float32), train=False))(
        jax.random.PRNGKey(0))

    results = {}
    for batch in (1, 8):
        images = jnp.asarray(rng.normal(size=(batch, 240, 320, 3)),
                             jnp.float32)

        @jax.jit
        def step(variables, images):
            out = model.apply(variables, images, train=False)
            s = greedy_sample(out["all_actions_prob"],
                              out["log_normal_mu"],
                              out["log_normal_sigma2"], grid)
            return s.fix, s.fix_len, sample_checksum(s)

        for _ in range(3):  # warmup / compile
            fix, fl, chk = step(variables, images)
        float(np.asarray(chk))

        lat = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            _, _, chk = step(variables, images)
            float(np.asarray(chk))  # true barrier
            lat.append(time.perf_counter() - t0)
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        results[f"batch{batch}"] = {
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
            "images_per_sec": round(batch / float(np.median(lat)), 2),
        }

    print(json.dumps({
        "metric": "greedy_serving_latency",
        "platform": jax.devices()[0].platform,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                     else dtype),
        **results,
    }))


if __name__ == "__main__":
    main()
