"""Serving-latency benchmark: single-image greedy decode
(BASELINE.json config 1) on the current backend.

Prints one JSON line per-batch with BOTH serving disciplines:

* ``p50_ms``/``p95_ms``/``images_per_sec`` — strict request/response:
  dispatch, wait for the result, repeat.  On this box's tunneled
  backend that includes a ~30 ms host<->device dispatch RTT per
  request, which is a property of the tunnel, not the chip.
* ``pipelined_images_per_sec``/``device_ms_per_batch`` — dispatch-
  ahead serving (the loop a real server runs): ITERS requests
  enqueued, results drained inside the timed window.  Dispatch
  overlaps compute, so the per-batch time converges to DEVICE time;
  ``dispatch_overhead_ms`` = sequential p50 - device time isolates
  the tunnel's share of the request/response number.

Same honesty rules as bench.py: every timed iteration materializes a
device-computed scalar on the host (the only true barrier on a
tunneled backend).

Usage: python tools/bench_serving.py            # live model, random init
       python tools/bench_serving.py --bundle DIR   # exported AOT bundle
       JAX_PLATFORMS=cpu python tools/bench_serving.py

With --bundle the step is the deserialized StableHLO module from
serve/export.py (`load_bundle`) — the deployment artifact itself is
what gets timed, no flax or model source in the serving process path.
The bundle must be greedy-decode; batch sizes come from the manifest
("sym" bundles are timed at 1 and 8).

Tunnel caveat: a full-geometry bundle bakes the weights in as module
constants (~270 MB), which exceeds THIS box's axon remote_compile
request cap (HTTP 413) — on a directly-attached TPU or the CPU
backend the bundle compiles and serves normally
(`JAX_PLATFORMS=cpu python tools/bench_serving.py --bundle DIR`).
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

# sitecustomize pre-imports jax, so env vars above are read too late;
# set the configs directly so repeat runs hit the persistent cache and
# `JAX_PLATFORMS=cpu python tools/bench_serving.py` really lands on the
# CPU backend (same treatment as tests/conftest.py)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def _live_step(dtype):
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.ops.sampling import greedy_sample, sample_checksum

    model = create_model("osie", dtype=dtype)
    grid = GridSpec()
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 240, 320, 3), jnp.float32), train=False))(
        jax.random.PRNGKey(0))

    # variables must stay a runtime ARGUMENT: closing over them bakes
    # ~100 MB of weights into the lowered module as constants, which
    # the axon tunnel's remote_compile endpoint rejects (HTTP 413)
    @jax.jit
    def _step(variables, images):
        out = model.apply(variables, images, train=False)
        s = greedy_sample(out["all_actions_prob"], out["log_normal_mu"],
                          out["log_normal_sigma2"], grid)
        return s.fix, s.fix_len, sample_checksum(s)

    # batch 32 pushes the batched-serving number toward the decode-
    # bench rate (the tunnel dispatch floor amortizes over the batch)
    return lambda images: _step(variables, images), (1, 8, 32), (240, 320)


def _bundle_step(bundle_dir: str):
    from scanpaths_tpu.serve.export import load_bundle

    fn, mf = load_bundle(bundle_dir)
    assert mf["decode"] == "greedy", (
        f"serving-latency bench times greedy bundles; this one is "
        f"{mf['decode']!r}")
    assert mf["task"] == "osie", mf["task"]
    geo = mf["geometry"]
    batches = (1, 8) if mf["batch"] == "sym" else (int(mf["batch"]),)

    def step(images):
        out = fn(images)
        return (out["fix"], out["fix_len"],
                jnp.sum(out["fix"] * (out["fix_len"] > 0)[:, None, None]))

    return step, batches, (geo["height"], geo["width"]), mf


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    bundle = argv[argv.index("--bundle") + 1] if "--bundle" in argv else ""

    if bundle:
        step, batches, (h, w), mf = _bundle_step(bundle)
        # the bundle's compute dtype is baked in at export; the live
        # backend says nothing about what is being timed
        dtype_name = mf.get("model_dtype", "baked")
    else:
        dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
            else jnp.float32
        step, batches, (h, w) = _live_step(dtype)
        dtype_name = np.dtype(dtype).name
    rng = np.random.default_rng(0)

    results = {}
    for batch in batches:
        images = jnp.asarray(rng.normal(size=(batch, h, w, 3)),
                             jnp.float32)
        for _ in range(3):  # warmup / compile
            fix, fl, chk = step(images)
        float(np.asarray(chk))

        lat = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            _, _, chk = step(images)
            float(np.asarray(chk))  # true barrier
            lat.append(time.perf_counter() - t0)
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        p50 = float(np.percentile(lat_ms, 50))

        # pipelined discipline: enqueue every request, drain at the end
        # (each checksum still host-materialized INSIDE the window)
        chks = []
        t0 = time.perf_counter()
        for _ in range(ITERS):
            _, _, chk = step(images)
            chks.append(chk)
        for chk in chks:
            float(np.asarray(chk))
        dt = time.perf_counter() - t0
        device_ms = dt / ITERS * 1e3

        results[f"batch{batch}"] = {
            "p50_ms": round(p50, 2),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
            "images_per_sec": round(batch / float(np.median(lat)), 2),
            "pipelined_images_per_sec": round(batch * ITERS / dt, 2),
            "device_ms_per_batch": round(device_ms, 2),
            "dispatch_overhead_ms": round(max(p50 - device_ms, 0.0), 2),
        }

    print(json.dumps({
        "metric": "greedy_serving_latency",
        "source": "bundle" if bundle else "live_model",
        "platform": jax.devices()[0].platform,
        "dtype": dtype_name,
        **results,
    }))


if __name__ == "__main__":
    main()
