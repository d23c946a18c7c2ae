"""Decode-scan decomposition: localize the per-step non-MXU slack.

`tools/profile_bench.py` splits the bench step into backbone / hoisted
convs / decode scan / sampling; this tool goes one level deeper and
times scan VARIANTS that disable parts of the step body, so the scan's
own residual (vs the gate conv's analytic ideal) is attributed among
the cell, the factorized signal gates, the fused head, and the history
attention.  Variants (each a 16-step `lax.scan` over fixed hoisted
inputs, timed under the bench.py honesty rules):

  cell        ConvLSTM cell only (no signals, no head, no history)
  cell+sig    + live factorized signal gates (fixed smem/cmem inputs)
  cell+head   + fused conditioner+head (no signal, no history update)
  full        the real step (attention + history writes + head)

Findings at bench geometry (batch 512 bf16, one v5e chip) are recorded
in docs/PERF.md.  Run on a TPU host:

  BENCH_BATCH=512 python tools/profile_scan.py
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
T = 16
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def main():
    from scanpaths_tpu.models.components import (apply_fused_cond_head,
                                                 fuse_cond_head)
    from scanpaths_tpu.models.scanpath_model import create_model

    dtype = jnp.bfloat16
    model = create_model("osie", dtype=dtype)

    images = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, 240, 320, 3), jnp.float32))(jax.random.PRNGKey(42))
    variables = jax.jit(lambda k: model.init(k, images, train=False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def hoist(v, im):
        def run(m, x):
            feats = m.backbone(x, train=False)
            visual = jax.nn.relu(m.sal_conv(feats))
            xg = m.xgates(visual)
            head_raw = m.head.raw()
            (k1, b1), = m.conditioner.kernels()
            fused = fuse_cond_head(k1, b1, head_raw, m.map_h, m.map_w)
            return visual, xg, fused
        return model.apply(v, im, method=run)

    visual, xg, fused = hoist(variables, images)

    def timed(fn, *args, iters=ITERS, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        float(np.asarray(out))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out))  # host materialization = true barrier
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def scan_program(kind):
        @jax.jit
        def run(v, visual, xg):
            def prog(m, visual, xg):
                n = visual.shape[0]
                amap0 = jnp.zeros((n, m.map_h, m.map_w), m.dtype)
                vismean = jnp.mean(visual, axis=-1)
                entry0 = m._new_stream_entry(amap0, visual, vismean)
                stream0 = m._init_stream(entry0, n)
                smem0 = entry0["spat"].astype(m.dtype)
                cmem0 = entry0["sem"].astype(m.dtype)
                h0 = jnp.zeros_like(visual)

                def body(carry, _):
                    h, c, stream, step = carry
                    valid = jnp.arange(m.seq_len + 1) <= step
                    if kind == "full":
                        smem, cmem = m._attend(stream, valid)
                    else:
                        smem, cmem = smem0, cmem0
                    if kind == "cell":
                        sig = []
                    else:
                        sig = [(smem.reshape(n, m.map_h, m.map_w), cmem)]
                    h, c = m.lstm(xg, h, c, sig)
                    out = jnp.float32(0)
                    if kind in ("cell+head", "full"):
                        sl, amap, d = apply_fused_cond_head(h, fused,
                                                            m.dtype)
                        mu, s2 = m.head.finish_duration(d)
                        out = (jnp.sum(sl) + jnp.sum(mu) + jnp.sum(s2)
                               + jnp.sum(amap[:, 0, 0]))
                        if kind == "full":
                            entry = m._new_stream_entry(
                                amap.astype(m.dtype), visual, vismean)
                            stream = m._write(stream, entry, step + 1)
                    return (h, c, stream, step + 1), out

                (h, c, _, _), outs = jax.lax.scan(
                    body, (h0, h0, stream0, jnp.int32(0)), None, length=T)
                return (jnp.sum(h.astype(jnp.float32)[:, 0, 0])
                        + jnp.sum(outs))
            return model.apply(v, visual, xg, method=prog)
        return run

    out = {"batch": BATCH, "t": T}
    for kind in ("cell", "cell+sig", "cell+head", "full"):
        dt = timed(scan_program(kind), variables, visual, xg)
        out[kind + "_ms_per_step"] = round(dt * 1e3 / T, 2)
    out["signal_ms_per_step"] = round(
        out["cell+sig_ms_per_step"] - out["cell_ms_per_step"], 2)
    out["head_ms_per_step"] = round(
        out["cell+head_ms_per_step"] - out["cell_ms_per_step"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
