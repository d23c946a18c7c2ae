"""Stem-in-isolation probe: is the backbone stem bandwidth-floor-bound?

docs/PERF.md's stage table shows the stem at ~11% MFU (8.5 ms vs a
0.9 ms compute ideal at batch 512) — the largest *relative* MFU pocket
in the backbone.  The MLPerf space-to-depth transform
(models/resnet.py::s2d_stem_conv) raises the MXU contraction width
from 3 to 12, so IF the stem were MXU-bound it would win up to ~4x.
This tool measures, at bench geometry (batch 512, bf16):

  conv7        the pixel-space 7x7/s2 stem convolution alone
  s2d          the exact space-to-depth reformulation alone
  stem_conv    conv7 + BN(inference algebra) + relu + ceil-maxpool
  stem_s2d     same epilogue on the s2d conv

and prints the analytic HBM floor of each variant (bytes that MUST
move at least once / v5e's ~819 GB/s), so the verdict is a measured
statement: when the measured time sits at the traffic floor, feeding
the MXU better cannot help.  One JSON line; run on a TPU host:

  BENCH_BATCH=512 python tools/profile_stem.py
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
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
INNER = int(os.environ.get("BENCH_INNER", "16"))
H, W = 240, 320
HBM_GBPS = 819e9          # v5e HBM bandwidth (public spec)


def timed_scan(fn, x, k7, iters=ITERS, warmup=2):
    """Per-call time of ``fn(x, k7)`` amortized over an INNER-step
    ``lax.scan`` inside ONE jitted program: a single host round-trip
    through the tunnel costs ~30 ms, which would swamp a <10 ms op if
    timed per dispatch (the isolated-stage measurement trap recorded in
    docs/PERF.md).  Each scan step perturbs the KERNEL by the carry so
    XLA cannot CSE the steps; the input stays the same HBM buffer (its
    read is what the floor charges)."""

    @jax.jit
    def run(x, k7):
        def body(carry, eps):
            y = fn(x, k7 + (carry * 0 + eps).astype(k7.dtype))
            s = jnp.sum(y, dtype=jnp.float32)
            return s * 1e-30, s
        _, sums = jax.lax.scan(body, jnp.float32(0),
                               jnp.linspace(0, 1e-6, INNER))
        return jnp.sum(sums)

    for _ in range(warmup):
        out = run(x, k7)
    float(np.asarray(out))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(x, k7)
        float(np.asarray(out))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / INNER


def main():
    from scanpaths_tpu.models.resnet import _ceil_maxpool, s2d_stem_conv

    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, H, W, 3), jnp.float32))(key)
    k7 = jax.jit(lambda k: 0.05 * jax.random.normal(
        k, (7, 7, 3, 64), jnp.float32))(jax.random.PRNGKey(1))
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    def conv7(x, k7):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k7.astype(jnp.bfloat16), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def epilogue(y, scale, bias):
        y = jnp.maximum(y * scale.astype(y.dtype) + bias.astype(y.dtype),
                        0)
        return _ceil_maxpool(y)

    fns = {
        "conv7": conv7,
        "s2d": lambda x, k: s2d_stem_conv(x, k, jnp.bfloat16),
        "stem_conv": lambda x, k: epilogue(conv7(x, k), scale, bias),
        "stem_s2d": lambda x, k: epilogue(
            s2d_stem_conv(x, k, jnp.bfloat16), scale, bias),
    }

    # analytic HBM floors (bytes that must cross HBM at least once):
    # f32 input read + bf16 conv output write; the fused stem also
    # writes the pooled output (the conv intermediate may stay fused
    # in the ideal case, so the floor charges it once, not twice).
    in_b = BATCH * H * W * 3 * 4
    conv_b = BATCH * (H // 2) * (W // 2) * 64 * 2
    hp = -(-(H // 2 - 3) // 2) + 1
    wp = -(-(W // 2 - 3) // 2) + 1
    pool_b = BATCH * hp * wp * 64 * 2
    floors = {
        "conv7": (in_b + conv_b) / HBM_GBPS,
        "s2d": (in_b + conv_b) / HBM_GBPS,
        # fusion cannot elide the conv->pool intermediate at this size
        # (windows cross tile rows), so charge it read+write once
        "stem_conv": (in_b + 2 * conv_b + pool_b) / HBM_GBPS,
        "stem_s2d": (in_b + 2 * conv_b + pool_b) / HBM_GBPS,
    }

    out = {"batch": BATCH, "dtype": "bfloat16", "inner": INNER,
           "hbm_gbps": HBM_GBPS}
    for name, fn in fns.items():
        ms = timed_scan(fn, x, k7) * 1e3
        out[name + "_ms"] = round(ms, 2)
        out[name + "_floor_ms"] = round(floors[name] * 1e3, 2)
        out[name + "_floor_frac"] = round(floors[name] * 1e3 / ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
