"""Pallas TPU kernel: fused ResNet bottleneck stages (inference).

The dilated ResNet-50's early stages are BANDWIDTH-bound under XLA:
stage-level profiling at bench geometry (docs/PERF.md) measures layer1
at 23% MFU and layer2 at 52% against wide activation tensors
([512, 60, 80, 512] is 2.5 GB in bf16), and the per-block HBM traffic
matches XLA's fusion roofline exactly — every conv reads its input
from HBM and writes its output back, because XLA does not fuse ACROSS
convolutions.  This kernel does: one grid program per image runs ALL
the uniform (non-downsample) bottleneck blocks of a stage with every
intermediate resident in VMEM, so a whole stage costs one activation
read + one write of HBM traffic instead of ~6 per block.

Structure (same flat padded-row layout as ops/pallas_cell, generalized
to a dilation-wide zero ring):

* HBM stays dense NHWC on both sides; the kernel packs each image
  into a ``[rh, C]`` flat padded-row halo buffer in VMEM scratch —
  body pixel (y, x) at row ``bo + y*w2 + x`` with ``w2 = w + 2*dil``,
  zero ring + zeroed junk columns making a conv tap (dy, dx) a STATIC
  row-shifted slice at offset ``((dy*w2) + dx) * dil``.  (An earlier
  revision did this packing as XLA pads/reshapes around the call; the
  forced retiling copies of the 1-2.5 GB activations cost +17..35 ms
  per stage and erased the kernel's win — keeping HBM dense is what
  makes the fusion profitable);
* each block is three MXU matmuls per row chunk: 1x1 reduce
  ``[cs, C] @ [C, M]``, im2col 3x3 ``[cs, 9M] @ [9M, M]``, 1x1 expand
  ``[cs, M] @ [M, C]`` with the residual added from the input rows,
  with BatchNorm folded into the weights (inference semantics:
  ``W' = W * gamma/sqrt(var+eps)``, bias from beta/mean) and biases
  applied in f32 before each ReLU;
* two passes per block: pass A materializes ``t1 = relu(bn(conv1(x)))``
  for the WHOLE image into a VMEM halo scratch (the 3x3 needs its
  neighbors), pass B computes conv2+conv3+residual chunk by chunk,
  writing the block output into the output buffer that the next
  block's pass A reads (read-before-write per chunk keeps it safe).

Like ops/pallas_cell this is an inference-path kernel (no VJP):
training keeps the flax formulation.  Numerics: matmuls accumulate in
f32; BN folding is algebraically exact in f32 parameter precision.
Equivalence with the flax stage is pinned in tests/test_pallas_block.py
(interpret mode, all stage shapes incl. dilation 2).

Reference for the stage structure being fused:
OSIE/models/resnet.py:57-130 (Caffe-style bottleneck) with the SAM
dilation patch of OSIE/models/baseline_attention.py:212-224.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def stage_geometry(h: int, w: int, dil: int = 1) -> dict:
    """Flat halo-layout geometry for an h x w grid with a dil-wide ring.

    Mirrors ops/pallas_cell.geometry (dil=1) with the ring scaled to
    the dilation so every 3x3 tap read lands inside the buffer.  (A
    probed variant rounded w2 up to the 8-row sublane tile to align
    the pack/unpack row copies — the extra junk-column FLOPs cost more
    than the alignment saved: 270 vs 260 ms whole-backbone.)
    """
    w2 = w + 2 * dil
    rb = h * w2
    nch = max(1, -(-rb // 512))
    cs128 = _round_up(-(-rb // nch), 128)
    cs = (cs128 if cs128 * nch <= rb * 1.1
          else _round_up(-(-rb // nch), 16))
    rp = cs * nch
    bo = _round_up(dil * (w2 + 1), 16)
    shift = bo - dil * (w2 + 1)
    rh = _round_up(bo + rp + dil * (w2 + 1), 16)
    taps = tuple((dy * w2 + dx) * dil for dy in range(3) for dx in range(3))
    return dict(w2=w2, rb=rb, cs=cs, nch=nch, rp=rp, bo=bo, shift=shift,
                rh=rh, taps=taps, h=h, w=w, dil=dil)


def fold_bn(kernel: jnp.ndarray, scale, beta, mean, var,
            eps: float = 1e-5):
    """Fold inference BatchNorm into the preceding bias-free conv:
    W' = W * s, b' = beta - mean * s with s = gamma / sqrt(var + eps)
    (algebraically exact; kernel is HWIO, s broadcasts over Cout)."""
    s = scale / jnp.sqrt(var + eps)
    return kernel * s, beta - mean * s


def stack_stage_params(params: dict, batch_stats: dict, blocks: list[str],
                       dtype) -> dict:
    """Fold BN and stack the uniform blocks of a stage for the kernel.

    ``blocks`` are the flax submodule names (e.g. ["layer2_block1",
    ...]); every block must have identical channel shapes and no
    downsample.  Returns the stacked arrays the kernel consumes:
    w1 [B, C, M], w2 [B, 9M, M] (tap-major rows), w3 [B, M, C] and the
    f32 biases b1/b2 [B, M], b3 [B, C].
    """
    w1s, b1s, w2s, b2s, w3s, b3s = [], [], [], [], [], []
    for name in blocks:
        p, s = params[name], batch_stats[name]
        k1, bb1 = fold_bn(p["conv1"]["kernel"], p["bn1"]["scale"],
                          p["bn1"]["bias"], s["bn1"]["mean"],
                          s["bn1"]["var"])
        k2, bb2 = fold_bn(p["conv2"]["kernel"], p["bn2"]["scale"],
                          p["bn2"]["bias"], s["bn2"]["mean"],
                          s["bn2"]["var"])
        k3, bb3 = fold_bn(p["conv3"]["kernel"], p["bn3"]["scale"],
                          p["bn3"]["bias"], s["bn3"]["mean"],
                          s["bn3"]["var"])
        c, m = k1.shape[2], k1.shape[3]
        w1s.append(k1.reshape(c, m))
        w2s.append(k2.reshape(9 * m, m))      # HWIO -> tap-major rows
        w3s.append(k3.reshape(k3.shape[2], k3.shape[3]))
        b1s.append(bb1)
        b2s.append(bb2)
        b3s.append(bb3)
    return dict(
        w1=jnp.stack(w1s).astype(dtype), b1=jnp.stack(b1s).astype(jnp.float32),
        w2=jnp.stack(w2s).astype(dtype), b2=jnp.stack(b2s).astype(jnp.float32),
        w3=jnp.stack(w3s).astype(dtype), b3=jnp.stack(b3s).astype(jnp.float32))


def _stage_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  y_ref, ah_ref, bh_ref, t1_ref, strip_ref, *, geo: dict,
                  n_blocks: int, feat: int, mid: int, out_dtype):
    c, m = feat, mid
    cs, nch, bo, rp, rh = (geo["cs"], geo["nch"], geo["bo"], geo["rp"],
                           geo["rh"])
    h, w, w2 = geo["h"], geo["w"], geo["w2"]
    # The halo layouts exist ONLY in VMEM: the kernel packs the dense
    # NHWC input into the flat padded-row buffer itself (per-row VMEM
    # copies), so the HBM side stays dense and XLA inserts no relayout
    # copies around the call (measured +17..35 ms per stage when the
    # transforms ran as XLA pads/reshapes).
    #
    # Only t1's rings need zeroing: the 3x3 taps read ONLY t1, and
    # every masked write (pass A into t1's body, pass B into dst's
    # body) zeroes the junk rows/columns it covers, so uninitialized
    # regions of ah/bh are never observable (jnp.where SELECTS — even
    # NaN garbage cannot propagate through the mask).
    t1_ref[0:bo, :] = jnp.zeros((bo, m), out_dtype)
    t1_ref[bo + rp:rh, :] = jnp.zeros((rh - bo - rp, m), out_dtype)
    for yrow in range(h):
        ah_ref[bo + yrow * w2:bo + yrow * w2 + w, :] = x_ref[0, yrow]

    rowsv = []
    for k in range(nch):
        r0 = k * cs
        rows = jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0) + r0
        rowsv.append((rows < geo["rb"]) & (rows % w2 < w))

    src, dst = ah_ref, bh_ref
    for b in range(n_blocks):
        # pass A: t1 = relu(x @ W1 + b1) over the whole image
        for k in range(nch):
            r0 = k * cs
            a = jnp.dot(src[bo + r0:bo + r0 + cs, :], w1_ref[b],
                        preferred_element_type=jnp.float32)
            a = jax.nn.relu(a + b1_ref[b])
            t1_ref[bo + r0:bo + r0 + cs, :] = jnp.where(
                rowsv[k], a, 0.0).astype(out_dtype)
        # pass B: y = relu(x + (relu(im2col(t1) @ W2 + b2)) @ W3 + b3)
        for k in range(nch):
            r0 = k * cs
            for t, d in enumerate(geo["taps"]):
                strip_ref[:, t * m:(t + 1) * m] = (
                    t1_ref[r0 + d + geo["shift"]:
                           r0 + d + geo["shift"] + cs, :])
            t2 = jnp.dot(strip_ref[:], w2_ref[b],
                         preferred_element_type=jnp.float32)
            t2 = jax.nn.relu(t2 + b2_ref[b]).astype(out_dtype)
            y = jnp.dot(t2, w3_ref[b],
                        preferred_element_type=jnp.float32)
            y = y + b3_ref[b] + src[bo + r0:bo + r0 + cs, :].astype(
                jnp.float32)
            y = jax.nn.relu(y)
            dst[bo + r0:bo + r0 + cs, :] = jnp.where(
                rowsv[k], y, 0.0).astype(out_dtype)
        src, dst = dst, src

    for yrow in range(h):
        y_ref[0, yrow] = src[bo + yrow * w2:bo + yrow * w2 + w, :]


@functools.partial(jax.jit, static_argnums=(1,),
                   static_argnames=("interpret",))
def stage_apply(x: jnp.ndarray, dil: int,
                w1, b1, w2, b2, w3, b3, interpret: bool = False):
    """Run a stack of uniform bottleneck blocks on a dense NHWC input.

    x: [N, h, w, C]; weights stacked per block (stack_stage_params).
    Returns the stage output, dense [N, h, w, C] — the halo layout is
    kernel-internal (VMEM scratch), so no HBM relayouts happen.
    """
    n, h, w, c = x.shape
    geo = stage_geometry(h, w, dil)
    nb, _, m = w1.shape
    dt = x.dtype
    img = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    flops = 2 * n * nb * geo["rp"] * (c * m + 9 * m * m + m * c)
    return pl.pallas_call(
        functools.partial(_stage_kernel, geo=geo, n_blocks=nb, feat=c,
                          mid=m, out_dtype=dt),
        grid=(n,),
        in_specs=[img,
                  whole((nb, c, m)), whole((nb, m)),
                  whole((nb, 9 * m, m)), whole((nb, m)),
                  whole((nb, m, c)), whole((nb, c))],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        scratch_shapes=[pltpu.VMEM((geo["rh"], c), dt),
                        pltpu.VMEM((geo["rh"], c), dt),
                        pltpu.VMEM((geo["rh"], m), dt),
                        pltpu.VMEM((geo["cs"], 9 * m), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=x.size * 2 * dt.itemsize),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)


# ---------------------------------------------------------------------------
# Availability probe (same contract as ops/pallas_cell.available)
# ---------------------------------------------------------------------------


def _probe_once() -> bool:
    h, w, c, m, n = 6, 8, 128, 128, 1
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (n, h, w, c), dt)
    w1 = jax.random.normal(ks[1], (1, c, m), dt) * 0.05
    w2 = jax.random.normal(ks[2], (1, 9 * m, m), dt) * 0.05
    w3 = jax.random.normal(ks[3], (1, m, c), dt) * 0.05
    zb = jnp.zeros((1, m), jnp.float32)
    zc = jnp.zeros((1, c), jnp.float32)
    y = stage_apply(x, 1, w1, zb, w2, zb, w3, zc)
    return bool(np.isfinite(np.asarray(y, np.float32)).all())


@functools.lru_cache(maxsize=1)
def available() -> bool:
    """One-time probe with the daemon-thread escape of
    ops/pallas_cell.available (eager even mid-trace; a hung remote
    backend must not block the process)."""
    import queue
    import sys
    import threading

    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    last = None
    for _ in range(2):
        q: queue.Queue = queue.Queue(maxsize=1)

        def run(q=q):
            try:
                q.put(("ok", _probe_once()))
            except Exception as e:  # noqa: BLE001
                q.put(("err", e))

        t = threading.Thread(target=run, daemon=True)
        t.start()
        try:
            kind, val = q.get(timeout=600)
        except queue.Empty:
            last = TimeoutError("pallas block probe exceeded 600s")
            continue
        if kind == "ok" and val:
            return True
        last = val if kind == "err" else RuntimeError("probe returned False")
    print(f"[pallas_block] probe failed, using the XLA backbone path: "
          f"{type(last).__name__}: {last}", file=sys.stderr)
    return False
