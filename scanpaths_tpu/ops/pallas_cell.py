"""Pallas TPU kernel: one fused ConvLSTM decode step.

The decode scan's dominant cost is the per-step ConvLSTM update
(reference OSIE/models/baseline_attention.py:33-48): a 3x3 C->4C gate
conv over the 30x40 grid, the factorized task-signal gate taps
(components.SignalGates), and the i/f/o/g nonlinearities + cell/state
update.  Under XLA these are three separate stages: the gate conv
materializes a [N, H, W, 4C] pre-activation tensor in HBM (~2.5 GB at
bench geometry), the 9 signal broadcast-FMAs run on the VPU (~7 ms per
step measured — the VPU is the bottleneck for 9-tap rank-1 work), and
the gate fusion re-reads everything.

This kernel computes the WHOLE update for one image per grid program
with every intermediate resident in VMEM:

* the feature grid lives in a FLAT PADDED-ROW layout ``[RH, C]`` where
  body pixel (y, x) sits at row ``BO + y*(w+2) + x`` and the zero
  padding ring occupies the in-between rows.  A conv tap (dy, dx) is
  then a STATIC row-shifted slice at offset ``dy*(w+2) + dx``, so the
  3x3 conv becomes 9 shifted copies assembled into an im2col strip
  ``[rows, 9C]`` feeding ONE ``[rows, 9C] @ [9C, 4C]`` MXU matmul per
  row chunk (K = 9C = 4608 — perfectly MXU-shaped, vs XLA's halo
  handling at ~78% MFU).  Rows whose x falls in the pad columns compute
  garbage and are masked to zero on write-out, which simultaneously
  maintains the padding ring for the next step.
* the task-signal contribution is an OUTER PRODUCT structure
  (spatial map x per-sample contracted kernel, see SignalGates); here
  it is one tiny ``[rows, 16] @ [16, 3C]`` MXU matmul per chunk —
  measured ~6x cheaper than the VPU broadcast emission it replaces.
* gates are computed in f32 and the new (h, c) are written straight
  back out in the flat layouts, so the [N, H, W, 4C] pre-activation
  tensor never exists in HBM.

The kernel is an OPT-IN alternative for the no-gradient decode paths
(``cell_impl="pallas"`` / ``SP_CELL_IMPL=pallas``); training keeps the
XLA formulation (the kernel defines no VJP).  Measured on one v5e chip
at bench geometry (batch 512) the fused step runs the 16-step decode
scan at 78.2 ms/step vs the XLA cell's 76.6 — the VPU savings are real
(epilogue +0.5 ms isolated) but the flat layout pays ~6.7% junk-row
matmul FLOPs and misaligned-row im2col reads that XLA's conv emitter
avoids, so the XLA cell stays the default until this wins (see
docs/PERF.md for the full breakdown).  Numerics: identical sums up to
float reassociation, with gate nonlinearities in f32 (the XLA bf16
path computes them in bf16 — the kernel is slightly MORE precise).
Equivalence vs the XLA cell is pinned in tests/test_pallas_cell.py
(interpret mode on CPU, tight f32 tolerances).
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
def geometry(h: int, w: int) -> dict:
    """Static flat-layout geometry for an h x w feature grid.

    w2:    padded row width (w + 2)
    rb:    body rows (h * w2) — output pixel (y, x) at row y*w2 + x
           (rows with x >= w are junk, masked to zero)
    cs:    row-chunk size the kernel processes per matmul (mult of 16)
    nch:   number of chunks; rp = cs * nch >= rb (padded body rows)
    bo:    row offset of the body inside the halo buffer (mult of 16 so
           output stores are sublane-aligned)
    shift: bo - (w2 + 1): tap (dy, dx) for output row r reads halo row
           r + dy*w2 + dx + shift
    rh:    halo buffer rows (covers the max tap read, mult of 16)
    """
    import os
    w2 = w + 2
    rb = h * w2
    chunk = int(os.environ.get("SP_CELL_CHUNK", "320"))
    nch = max(1, -(-rb // chunk))
    # chunk rows align to the 128-row MXU tile when that costs <10%
    # junk rows (at bench geometry nch=1 -> cs=1280 = exactly 10 MXU
    # tiles; the 16-row fallback at nch=4 -> cs=320 wastes 1/6 of the
    # last tile)
    cs128 = _round_up(-(-rb // nch), 128)
    cs = (cs128 if cs128 * nch <= rb * 1.1
          else _round_up(-(-rb // nch), 16))
    rp = cs * nch
    bo = _round_up(w2 + 1, 16)
    shift = bo - (w2 + 1)
    rh = _round_up(rp + 2 * w2 + 2 + shift, 16)
    taps = tuple(dy * w2 + dx for dy in range(3) for dx in range(3))
    return dict(w2=w2, rb=rb, cs=cs, nch=nch, rp=rp, bo=bo, shift=shift,
                rh=rh, taps=taps, h=h, w=w)


# ---------------------------------------------------------------------------
# Layout transforms (XLA side; cheap relative to the step they feed)
# ---------------------------------------------------------------------------


def grid_to_body(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[N, h, w, F] -> [N, rp, F] flat body layout (junk rows zero)."""
    g = geometry(h, w)
    n, _, _, f = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 2), (0, 0)))
    x = x.reshape(n, g["rb"], f)
    return jnp.pad(x, ((0, 0), (0, g["rp"] - g["rb"]), (0, 0)))


def body_to_grid(xb: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[N, rp, F] -> [N, h, w, F]."""
    g = geometry(h, w)
    n, _, f = xb.shape
    return xb[:, :g["rb"]].reshape(n, h, g["w2"], f)[:, :, :w]


def halo_to_grid(hh: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[N, rh, C] halo layout -> [N, h, w, C] dense grid."""
    g = geometry(h, w)
    n, _, c = hh.shape
    body = hh[:, g["bo"]:g["bo"] + g["rb"]]
    return body.reshape(n, h, g["w2"], c)[:, :, :w]


def zeros_halo(n: int, c: int, h: int, w: int, dtype) -> jnp.ndarray:
    g = geometry(h, w)
    return jnp.zeros((n, g["rh"], c), dtype)


def zeros_body(n: int, c: int, h: int, w: int, dtype) -> jnp.ndarray:
    g = geometry(h, w)
    return jnp.zeros((n, g["rp"], c), dtype)


def gate_kernel_flat(kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """gates_h conv kernel [3, 3, C, 4C] -> [9C, 4C] tap-major strip
    matching the kernel's im2col layout (tap t occupies rows tC..tC+C)."""
    kh, kw, cin, cout = kernel.shape
    return kernel.reshape(kh * kw * cin, cout).astype(dtype)


def signal_taps(smem: jnp.ndarray, h: int, w: int, dtype) -> jnp.ndarray:
    """Spatial signal map [N, h, w] -> tap strip [N, rp, 16]: column t
    holds the map value at tap offset t for each body row (taps 9..15
    are zero — lane padding so the matmul K dim is 16)."""
    g = geometry(h, w)
    n = smem.shape[0]
    sp = jnp.pad(smem, ((0, 0), (1, 1), (1, 1))).reshape(n, -1)
    sp = jnp.pad(sp, ((0, 0), (0, 16)))  # tap overrun for junk rows
    cols = jnp.stack([sp[:, d:d + g["rb"]] for d in g["taps"]], axis=-1)
    cols = jnp.pad(cols, ((0, 0), (0, g["rp"] - g["rb"]), (0, 7)))
    return cols.astype(dtype)


def signal_kp_pad(kp: jnp.ndarray, dtype) -> jnp.ndarray:
    """Per-sample signal kernels [N, 9, 3C] -> [N, 16, 3C] (zero rows
    for the padded taps)."""
    return jnp.pad(kp, ((0, 0), (0, 7), (0, 0))).astype(dtype)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _cell_kernel(h_ref, c_ref, xg_ref, s_ref, kp_ref, kt_ref,
                 ho_ref, co_ref, lhs_ref, acc_ref, *,
                 geo: dict, feat: int, out_dtype):
    c = feat
    cs, nch, bo, rp, rh = (geo["cs"], geo["nch"], geo["bo"], geo["rp"],
                           geo["rh"])
    # border zeros: the halo ring the body writes don't cover
    ho_ref[0, 0:bo, :] = jnp.zeros((bo, c), out_dtype)
    ho_ref[0, bo + rp:rh, :] = jnp.zeros((rh - bo - rp, c), out_dtype)

    for k in range(nch):
        r0 = k * cs
        # im2col strip: 9 row-shifted slices of the halo buffer
        for t, d in enumerate(geo["taps"]):
            lhs_ref[:, t * c:(t + 1) * c] = (
                h_ref[0, r0 + d + geo["shift"]:
                      r0 + d + geo["shift"] + cs, :])
        acc_ref[:] = jnp.dot(lhs_ref[:], kt_ref[:],
                             preferred_element_type=jnp.float32)
        # signal contribution accumulates INTO the gate pre-activations
        # (i/f/o slots only, reference :40-48) — no separate f32
        # scratch round-trip for the sg tensor
        acc_ref[:, :3 * c] = acc_ref[:, :3 * c] + jnp.dot(
            s_ref[0, r0:r0 + cs, :], kp_ref[0],
            preferred_element_type=jnp.float32)

        def pre(gi):
            return acc_ref[:, gi * c:(gi + 1) * c] + (
                xg_ref[0, r0:r0 + cs, gi * c:(gi + 1) * c]
                .astype(jnp.float32))

        i = jax.nn.sigmoid(pre(0))
        f = jax.nn.sigmoid(pre(1))
        o = jax.nn.sigmoid(pre(2))
        g_ = jnp.tanh(pre(3))
        cn = f * c_ref[0, r0:r0 + cs, :].astype(jnp.float32) + i * g_
        hn = o * cn  # reference quirk: no tanh on c

        rows = jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0) + r0
        valid = (rows < geo["rb"]) & (rows % geo["w2"] < geo["w"])
        cn = jnp.where(valid, cn, 0.0)
        hn = jnp.where(valid, hn, 0.0)
        co_ref[0, r0:r0 + cs, :] = cn.astype(out_dtype)
        ho_ref[0, bo + r0:bo + r0 + cs, :] = hn.astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(6, 7),
                   static_argnames=("interpret",))
def cell_step(h_halo: jnp.ndarray, c_body: jnp.ndarray,
              xg_body: jnp.ndarray, s_taps: jnp.ndarray,
              kp: jnp.ndarray, kt_flat: jnp.ndarray,
              h: int, w: int, interpret: bool = False):
    """One fused ConvLSTM step on flat-layout state.

    h_halo:  [N, rh, C]   hidden state, halo layout (zero ring)
    c_body:  [N, rp, C]   cell state, body layout (junk rows zero)
    xg_body: [N, rp, 4C]  hoisted x-gate pre-activations + ALL constant
                          biases (gates_x bias is inside, fold gates_h
                          and signal biases in before calling)
    s_taps:  [N, rp, 16*S]  signal-map tap strips, one 16-lane group
                            per signal stream (signal_taps / concat)
    kp:      [N, 16*S, 3C]  per-sample contracted signal kernels
    kt_flat: [9C, 4C]     gates_h kernel strip (gate_kernel_flat)

    Returns (h_halo', c_body') in the same layouts/dtype.
    """
    geo = geometry(h, w)
    n, rh, c = h_halo.shape
    sw = s_taps.shape[-1]
    dt = h_halo.dtype
    row = lambda r, f: pl.BlockSpec(  # noqa: E731
        (1, r, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    flops = 2 * n * geo["rp"] * (9 * c + sw) * 4 * c
    out = pl.pallas_call(
        functools.partial(_cell_kernel, geo=geo, feat=c, out_dtype=dt),
        grid=(n,),
        in_specs=[row(rh, c), row(geo["rp"], c), row(geo["rp"], 4 * c),
                  row(geo["rp"], sw), row(sw, 3 * c),
                  pl.BlockSpec((9 * c, 4 * c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(row(rh, c), row(geo["rp"], c)),
        out_shape=(jax.ShapeDtypeStruct((n, rh, c), dt),
                   jax.ShapeDtypeStruct((n, geo["rp"], c), dt)),
        scratch_shapes=[pltpu.VMEM((geo["cs"], 9 * c), dt),
                        pltpu.VMEM((geo["cs"], 4 * c), jnp.float32)],
        # the h/c carries alias their outputs: inside the decode scan
        # this lets XLA update the state in place instead of copying
        # ~1.4GB of carry buffers per step
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=n * geo["rp"] * 4 * c,
            bytes_accessed=(h_halo.size * 2 + c_body.size * 2
                            + xg_body.size) * dt.itemsize),
        interpret=interpret,
    )(h_halo, c_body, xg_body, s_taps, kp, kt_flat)
    return out


# ---------------------------------------------------------------------------
# Availability probe (same contract as ops/pallas_nw.available)
# ---------------------------------------------------------------------------


def _probe_once() -> bool:
    h, w, c, n = 4, 8, 128, 1
    geo = geometry(h, w)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    dt = jnp.bfloat16
    hh = zeros_halo(n, c, h, w, dt).at[:, geo["bo"]:geo["bo"] + 8].set(
        jax.random.normal(ks[0], (n, 8, c), dt))
    cb = zeros_body(n, c, h, w, dt)
    xg = jax.random.normal(ks[1], (n, geo["rp"], 4 * c), dt)
    st = jax.random.normal(ks[2], (n, geo["rp"], 16), dt)
    kp = jax.random.normal(ks[3], (n, 16, 3 * c), dt)
    kt = jax.random.normal(ks[4], (9 * c, 4 * c), dt)
    ho, co = cell_step(hh, cb, xg, st, kp, kt, h, w)
    ok = np.isfinite(np.asarray(ho, np.float32)).all()
    return bool(ok and np.isfinite(np.asarray(co, np.float32)).all())


@functools.lru_cache(maxsize=1)
def available() -> bool:
    """One-time probe: is the fused-cell Pallas path usable here?

    Same daemon-thread escape as ops/pallas_nw.available (the probe
    must run eagerly even when reached during a consumer's trace, and
    a hung remote backend must not block the process)."""
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
            last = TimeoutError("pallas cell probe exceeded 600s")
            continue
        if kind == "ok" and val:
            return True
        last = val if kind == "err" else RuntimeError("probe returned False")
    print(f"[pallas_cell] probe failed, using the XLA cell path: "
          f"{type(last).__name__}: {last}", file=sys.stderr)
    return False
