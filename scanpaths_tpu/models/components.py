"""Decoder building blocks: fused ConvLSTM cell, history attentions,
prediction head, task conditioners.

Structural contract is the reference decoder
(OSIE/models/baseline_attention.py:14-177 and the AiR/COCO variants);
the TPU-first re-design changes *how*, not *what*:

* the ConvLSTM's 11 (OSIE/COCO) or 14 (AiR) per-gate 3x3 convs become
  3-4 wide fused convs (one per input stream, gates stacked on the
  output-channel axis) — mathematically identical, far better MXU
  utilisation;
* the conv over the constant visual feature is hoisted out of the
  16-step loop (it does not depend on the step);
* the growing history lists become fixed [T+1] ring-less buffers with
  masked softmax; the per-entry projections (3x3 conv / Dense) are
  computed once at write time instead of every step;
* the spatial attention's full-map (30, 40) scoring conv is expressed
  as a Dense over the flattened map (identical arithmetic, one matmul).

Weight-init parity: convs use per-gate Xavier-normal (mmcv
``xavier_init`` semantics), Dense layers use normal(std=0.01), biases
zero (reference baseline_attention.py:50-57).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

EPSILON = 1e-7
NEG_INF = -1e9


def _impl_flag(name: str, default: str) -> str:
    """Emission-strategy switch, read at trace time.  Every strategy
    computes the SAME sum (equality-tested); the switch only picks which
    HLO the hot loop emits, so it is an env var rather than a config
    field — benchmarks A/B it, production uses the measured default."""
    return os.environ.get(name, default)


def xavier_conv_init(key, shape, dtype=jnp.float32):
    """Xavier-normal for a conv kernel [kh, kw, cin, cout]."""
    kh, kw, cin, cout = shape
    std = math.sqrt(2.0 / (kh * kw * cin + kh * kw * cout))
    return jax.random.normal(key, shape, dtype) * std


def grouped_xavier_conv_init(groups: int):
    """Xavier-normal applied per gate group of a fused conv kernel
    [kh, kw, cin, groups*c]: each group keeps the fan (and therefore the
    init distribution) of the reference's separate per-gate convs."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout_total = shape
        cout = cout_total // groups
        std = math.sqrt(2.0 / (kh * kw * cin + kh * kw * cout))
        return jax.random.normal(key, shape, dtype) * std

    return init


dense_init = nn.initializers.normal(stddev=0.01)


# ---------------------------------------------------------------------------
# Manual tensor-parallel boundaries (Megatron-style f/g collectives)
# ---------------------------------------------------------------------------
# Used by the shard_map row-parallel training step (train/tp_step.py),
# which bypasses the XLA partitioners entirely (they miscompile the
# decode scan's backward with contraction-sharded kernels —
# tools/tp_repro.py).  ``tp_enter`` marks a replicated tensor's entry
# into a TP block: identity forward, psum backward (the per-device
# partial cotangents of the channel-sliced uses sum to the true full
# cotangent).  ``tp_exit`` closes the block: psum forward (the
# row-parallel partial contractions sum to the full output), identity
# backward.  Everything outside the block stays replicated compute with
# replicated cotangents, so replicated parameters receive full,
# identical gradients on every model-axis device (no post-hoc psum
# bookkeeping per leaf).

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_enter(x, axis: str):
    return x


def _tp_enter_fwd(x, axis):
    return x, None


def _tp_enter_bwd(axis, _, ct):
    return (jax.lax.psum(ct, axis),)


tp_enter.defvjp(_tp_enter_fwd, _tp_enter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_exit(x, axis: str):
    return jax.lax.psum(x, axis)


def _tp_exit_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _tp_exit_bwd(axis, _, ct):
    return (ct,)


tp_exit.defvjp(_tp_exit_fwd, _tp_exit_bwd)


def tp_row_conv(x, kernel, bias, axis: str, dtype=None,
                padding=((1, 1), (1, 1))):
    """Row-parallel convolution inside a ``shard_map``: ``kernel`` is
    this device's contraction-dim slice [kh, kw, Cin/T, Cout]; the
    replicated input's matching channel block is sliced locally, the
    partial contraction is reduced over ``axis`` (one psum), and the
    replicated bias is added once after the reduction."""
    shard = kernel.shape[2]
    idx = jax.lax.axis_index(axis) * shard
    xs = jax.lax.dynamic_slice_in_dim(tp_enter(x, axis), idx, shard,
                                      axis=-1)
    out = tp_exit(conv2d(xs, kernel, None, padding=padding, dtype=dtype),
                  axis)
    return out + (bias.astype(out.dtype) if dtype is None
                  else bias.astype(dtype))


class ConvParams(nn.Module):
    """Parameter holder with the exact tree of an ``nn.Conv``
    ({kernel [kh, kw, cin, cout], bias [cout]}) but no application
    logic: calling it returns the raw (kernel, bias) so the model can
    choose between the literal per-layer convs (the parity oracle) and
    the algebraically fused evaluation (:func:`fuse_cond_head`).
    Checkpoints are interchangeable with the ``nn.Conv`` it replaces."""

    shape: tuple                  # (kh, kw, cin, cout)
    kernel_init: Any = xavier_conv_init

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


def conv2d(x, kernel, bias=None, strides=(1, 1), padding=((0, 0), (0, 0)),
           dtype=None):
    """NHWC/HWIO conv mirroring ``nn.Conv`` semantics (inputs and kernel
    cast to the compute dtype, output in that dtype)."""
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + (bias.astype(out.dtype) if dtype is not None else bias)
    return out


class SignalGates(nn.Module):
    """3x3 conv over the rank-1 task signal ``s (x) cv`` — factorized.

    The ConvLSTM's task-signal stream is an OUTER PRODUCT of a spatial
    map ``s`` [N, H, W] and a semantic vector ``cv`` [N, C] (reference
    baseline_attention.py:40-41 builds ``spatial.unsqueeze(1) *
    semantic``), so the dense conv over the materialized [N, H, W, C]
    tensor factorizes EXACTLY:

        sum_c K[dy,dx,c,o] * s[y+dy,x+dx] * cv[c]
          = sum_{dy,dx} s[y+dy,x+dx] * (sum_c K[dy,dx,c,o] * cv[c])

    i.e. contract the kernel with the semantic vector first (a tiny
    [9C, G] matmul per sample), then correlate the SCALAR spatial map
    with the per-sample [3, 3, G] kernel.  This removes ~2*9*HW*C*G
    FLOPs per step (17 GFLOP/sample at reference geometry — ~27% of
    the whole model) and replaces them with ~47 MFLOP, bit-compatible
    up to float reassociation.

    The parameter tree ({kernel [3,3,C,G], bias [G]}) is identical to
    the ``nn.Conv`` it replaces, so checkpoints are unaffected.
    """

    features: int           # G = 3*embed (i/f/o gate stack)
    in_features: int        # C = embed
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", grouped_xavier_conv_init(3),
                                 (3, 3, self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def kp(self, cv):
        """Per-sample contracted kernels [N, 9, G]: the semantic vector
        folded into the conv kernel (the tiny matmul of the
        factorization; bias NOT included)."""
        k = self.kernel.astype(self.dtype)
        cv = cv.astype(self.dtype)
        return jnp.einsum("hwco,nc->nhwo", k, cv).reshape(
            cv.shape[0], 9, self.features)

    def __call__(self, s, cv):
        s = s.astype(self.dtype)
        n, hh, ww = s.shape
        # per-sample effective kernel: [N, 9, G]
        kp = self.kp(cv)
        spad = jnp.pad(s, ((0, 0), (1, 1), (1, 1)))
        if _impl_flag("SP_SIGNAL_IMPL", "bcast") == "einsum":
            # batched matmul over the 9 shifted copies of the map:
            # one MXU contraction, but its [N, H, W, G] output picks up
            # an XLA relayout copy feeding the gate fusion (measured
            # 5.8 ms/step at bench geometry)
            patches = jnp.stack(
                [spad[:, dy:dy + hh, dx:dx + ww]
                 for dy in range(3) for dx in range(3)], axis=-1)
            out = jnp.einsum("nyxk,nko->nyxo", patches, kp)
        else:
            # the same sum as 9 broadcast multiply-adds: pure elementwise
            # HLO that XLA fuses INTO the gate-nonlinearity consumer, so
            # the [N, H, W, G] signal tensor never round-trips HBM
            out = jnp.zeros((n, hh, ww, self.features), self.dtype)
            for idx, (dy, dx) in enumerate(
                    (dy, dx) for dy in range(3) for dx in range(3)):
                out = out + (spad[:, dy:dy + hh, dx:dx + ww, None]
                             * kp[:, None, None, idx, :])
        return out + self.bias.astype(self.dtype)


class FusedConvLSTMCell(nn.Module):
    """ConvLSTM over the feature grid with task-signal gate injection.

    Reference semantics (OSIE baseline_attention.py:33-48):
      i = sigm(Wxi*x + Whi*h + Wsi*ss)     (ss = spatial (x) semantic)
      f, o likewise; g = tanh(Wxg*x + Whg*h)
      c' = f*c + i*g;  h' = o * c'         (NOTE: no tanh on c' — a
                                            reference quirk, preserved)
    AiR variant (AiR baseline_attention.py:37-56) injects two task
    signals (pos/neg) into i/f/o.

    The x-dependent gate pre-activations are constant across steps:
    they arrive precomputed as ``xg`` (:class:`XGates`).  Task signals
    arrive UNMATERIALIZED as (spatial [N, H, W], semantic [N, C])
    pairs; their gate convs run factorized (:class:`SignalGates`).
    """

    embed: int = 512
    num_signals: int = 1  # 1 = OSIE/COCO, 2 = AiR pos+neg
    dtype: Any = jnp.float32
    # set (to the mesh axis name) ONLY when running inside the manual
    # row-parallel shard_map step (train/tp_step.py): the h-gate conv
    # then expects its kernel to arrive as this device's contraction-
    # dim slice (1/tp_shards of the channels — flax validates param
    # shapes, so the slice shape is declared) and computes via
    # tp_row_conv
    tp_axis: Any = None
    tp_shards: int = 1

    def setup(self):
        e = self.embed
        cin = e // (self.tp_shards if self.tp_axis is not None else 1)
        # ConvParams holder: same {kernel, bias} tree as the nn.Conv it
        # replaces (checkpoints unaffected); raw access lets the fused
        # Pallas step (ops/pallas_cell.py) consume the kernel directly
        self.gates_h = ConvParams((3, 3, cin, 4 * e),
                                  kernel_init=grouped_xavier_conv_init(4))
        self.gates_s0 = SignalGates(3 * e, e, dtype=self.dtype)
        if self.num_signals == 2:
            self.gates_s1 = SignalGates(3 * e, e, dtype=self.dtype)

    def _sgate(self, idx) -> SignalGates:
        return self.gates_s0 if idx == 0 else self.gates_s1

    def gate_params(self):
        """Raw (kernel [3, 3, C, 4C], bias [4C]) of the h-gate conv."""
        return self.gates_h()

    def pallas_signals(self, signals: Sequence[tuple], map_h, map_w):
        """Pack the signal streams for the fused Pallas step: the tap
        strips of each stream's SPATIAL map concatenated on the lane
        axis [N, rp, 16*S], and the matching per-sample contracted
        kernels [N, 16*S, 3C] (stream i occupies lanes 16i..16i+9, so
        the single kernel matmul sums every stream's contribution)."""
        from ..ops import pallas_cell as pcell
        st = jnp.concatenate(
            [pcell.signal_taps(s, map_h, map_w, self.dtype)
             for s, _ in signals], axis=-1)
        kp = jnp.concatenate(
            [pcell.signal_kp_pad(self._sgate(i).kp(cv), self.dtype)
             for i, (_, cv) in enumerate(signals)], axis=1)
        return st, kp

    def signal_bias(self):
        """Summed signal-conv biases [3C] (folded into the hoisted xg
        by the Pallas path; the XLA path adds them per call)."""
        return sum(self._sgate(i).bias for i in range(self.num_signals))

    def __call__(self, xg, h, c, signals: Sequence[tuple]):
        k, b = self.gates_h()
        if self.tp_axis is not None:
            hg = tp_row_conv(h, k, b, self.tp_axis, dtype=self.dtype)
        else:
            hg = conv2d(h, k, b, padding=((1, 1), (1, 1)),
                        dtype=self.dtype)
        acc = xg + hg
        # split pre-activations: [i, f, o, g]
        i_pre, f_pre, o_pre, g_pre = jnp.split(acc, 4, axis=-1)
        for idx, (s, cv) in enumerate(signals):
            sg = self._sgate(idx)(s, cv)
            si, sf, so = jnp.split(sg, 3, axis=-1)
            i_pre, f_pre, o_pre = i_pre + si, f_pre + sf, o_pre + so
        # checkpoint_name tags make the gate pre-activations saveable
        # under remat mode "scan_policy"/"policy" (scanpath_model.py):
        # the gate conv above is ~99% of per-step FLOPs, so a policy
        # that saves these four [N, H, W, C] tensors (and recomputes
        # the cheap attention/head/elementwise tail) gets full-remat
        # memory behaviour on everything else at ~zero recompute cost.
        # Inert (identity) under every other mode.
        from jax.ad_checkpoint import checkpoint_name
        i = nn.sigmoid(checkpoint_name(i_pre, "lstm_gates"))
        f = nn.sigmoid(checkpoint_name(f_pre, "lstm_gates"))
        o = nn.sigmoid(checkpoint_name(o_pre, "lstm_gates"))
        g = jnp.tanh(checkpoint_name(g_pre, "lstm_gates"))
        c_next = f * c + i * g
        h_next = o * c_next  # reference quirk: no tanh
        return h_next, c_next


class XGates(nn.Module):
    """The hoisted x-dependent ConvLSTM gate pre-activations.

    The parameters live in a :class:`ConvParams` holder with the exact
    ``nn.Conv`` tree ({kernel, bias} under "gates_x" — checkpoints
    unchanged) so the same module can run the conv replicated (the
    default) or row-parallel under the shard_map TP step
    (``tp_axis``, train/tp_step.py)."""

    embed: int = 512
    dtype: Any = jnp.float32
    tp_axis: Any = None
    tp_shards: int = 1

    @nn.compact
    def __call__(self, visual):
        cin = self.embed // (self.tp_shards if self.tp_axis is not None
                             else 1)
        k, b = ConvParams((3, 3, cin, 4 * self.embed),
                          kernel_init=grouped_xavier_conv_init(4),
                          name="gates_x")()
        if self.tp_axis is not None:
            return tp_row_conv(visual, k, b, self.tp_axis,
                               dtype=self.dtype)
        return conv2d(visual, k, b, padding=((1, 1), (1, 1)),
                      dtype=self.dtype)


class SemanticAttention(nn.Module):
    """Additive attention over the channel-semantic history
    (reference baseline_attention.py:60-89).

    ``project`` is applied once per entry at write time; ``__call__``
    scores the projected history against the projected current vector.
    """

    embed: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.lists = nn.Dense(self.embed, kernel_init=dense_init,
                              dtype=self.dtype)
        self.cur = nn.Dense(self.embed, kernel_init=dense_init,
                            dtype=self.dtype)
        self.att = nn.Dense(1, kernel_init=dense_init, dtype=self.dtype)

    def project(self, feat):
        return self.lists(feat)

    def __call__(self, hist_feat, hist_proj, cur_feat, valid):
        """hist_feat/hist_proj: [N, T1, E]; cur_feat: [N, E];
        valid: [T1] bool."""
        scores = self.att(hist_proj + self.cur(cur_feat)[:, None, :])[..., 0]
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        w = jax.nn.softmax(scores, axis=1)
        return jnp.einsum("nt,nte->ne", w, hist_feat)


class SpatialAttention(nn.Module):
    """Attention over the spatial-map history
    (reference baseline_attention.py:92-125).

    The reference's (30, 40)-kernel scoring conv is a Dense over the
    flattened map.  ``project`` (the per-entry 3x3 conv) runs at write
    time.
    """

    map_h: int = 30
    map_w: int = 40
    dtype: Any = jnp.float32

    def setup(self):
        self.lists_conv = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                  kernel_init=xavier_conv_init,
                                  dtype=self.dtype)
        self.cur_conv = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                kernel_init=xavier_conv_init,
                                dtype=self.dtype)
        self.att = nn.Dense(1, kernel_init=dense_init, dtype=self.dtype)

    def project(self, feat_flat):
        """[N, HW] -> 3x3-conv'd [N, HW]."""
        n = feat_flat.shape[0]
        m = feat_flat.reshape(n, self.map_h, self.map_w, 1)
        return self.lists_conv(m).reshape(n, -1)

    def __call__(self, hist_feat, hist_conv, cur_feat, valid):
        """hist_*: [N, T1, HW]; cur_feat: [N, HW]; valid: [T1]."""
        n, t1, hw = hist_feat.shape
        cur = self.cur_conv(
            cur_feat.reshape(n, self.map_h, self.map_w, 1)).reshape(n, 1, hw)
        scores = self.att(hist_conv + cur)[..., 0]  # [N, T1]
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        w = jax.nn.softmax(scores, axis=1)
        return jnp.einsum("nt,nth->nh", w, hist_feat)


class PredictHead(nn.Module):
    """Action logits + LogNormal duration head
    (reference baseline_attention.py:128-166).

    Returns raw logits ``z`` [N, A] (A = H*W + 1, STOP at index 0; the
    caller softmaxes in eval mode), duration (mu, sigma2) [N], and the
    relu saliency map [N, H, W] that feeds back into the history.

    Parameters live in :class:`ConvParams` holders with the same names
    and trees as the ``nn.Conv`` layers they used to be, so both the
    literal path (``__call__``) and the fused conditioner+head path
    (:func:`fuse_cond_head` / :func:`apply_fused_cond_head`) read the
    same checkpoint.
    """

    map_h: int = 30
    map_w: int = 40
    embed: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        e = self.embed
        self.sal_layer_2 = ConvParams((1, 1, e, 1))
        self.drt_layer_1 = ConvParams((7, 7, e, 1))
        self.drt_layer_2 = ConvParams((self.map_h // 5, self.map_w // 5,
                                       1, 2))
        self.sal_layer_3 = ConvParams((1, 1, e, 1))

    def raw(self):
        """Materialize every head parameter (also forces creation under
        the fused path, keeping init trees identical)."""
        return {"w2": self.sal_layer_2(), "kd": self.drt_layer_1(),
                "kd2": self.drt_layer_2(), "w3": self.sal_layer_3()}

    def finish_duration(self, d):
        """relu -> drt_layer_2 -> (mu, sigma2); ``d`` [N, h5, w5] is the
        raw drt_layer_1 output (reference baseline_attention.py:144-147).
        Shared by the literal and fused paths."""
        n = d.shape[0]
        k2, b2 = self.drt_layer_2()
        t = nn.relu(d)[..., None]
        t = conv2d(t, k2, b2, dtype=self.dtype)
        t = t.reshape(n, 2).astype(jnp.float32)
        return t[:, 0], jnp.exp(t[:, 1])

    def __call__(self, feat):
        """The literal per-layer path (parity oracle; also what runs
        when the model is built with ``fuse_head=False``)."""
        n = feat.shape[0]
        w2k, w2b = self.sal_layer_2()
        stop_map = conv2d(feat, w2k, w2b, dtype=self.dtype)
        stop_logit = jnp.mean(
            stop_map.reshape(n, -1).astype(jnp.float32), axis=-1,
            keepdims=True)  # global avg pool
        kdk, kdb = self.drt_layer_1()
        d = conv2d(feat, kdk, kdb, strides=(5, 5),
                   padding=((2, 2), (2, 2)), dtype=self.dtype)[..., 0]
        # duration params and logits leave the mixed-precision region in
        # f32: exp() range and the categorical sampling need it
        mu, sigma2 = self.finish_duration(d)
        w3k, w3b = self.sal_layer_3()
        amap = nn.relu(conv2d(feat, w3k, w3b,
                              dtype=self.dtype))[..., 0]  # [N,H,W]
        z = jnp.concatenate(
            [stop_logit, amap.reshape(n, -1).astype(jnp.float32)], axis=-1)
        return z, mu, sigma2, amap


class Conditioner(nn.Module):
    """Task-conditioned 5x5 feature transform ahead of the shared head.

    * mode="single":   one conv (OSIE, baseline_attention.py:202)
    * mode="dual":     True/False performance convs (AiR, :212-215);
                       both streams are produced every step
    * mode="bank":     an 18-category conv bank indexed per sample by
                       task id (COCO multihead :203-211) — a single
                       [K, 5, 5, C, C] parameter tensor gathered per
                       sample and applied as a vmapped conv, replacing
                       the reference's per-sample Python dispatch loop
                       (multihead :285-289).  Gradients flow only to the
                       gathered slices, matching ModuleDict behaviour.
    """

    mode: str = "single"
    embed: int = 512
    num_heads: int = 18
    dtype: Any = jnp.float32

    def setup(self):
        e = self.embed
        if self.mode == "single":
            self.sal_layer = ConvParams((5, 5, e, e))
        elif self.mode == "dual":
            self.sal_layer_true = ConvParams((5, 5, e, e))
            self.sal_layer_false = ConvParams((5, 5, e, e))
        else:  # bank
            self.bank_kernel = self.param(
                "bank_kernel",
                lambda key, shape: jnp.stack([
                    xavier_conv_init(k, shape[1:])
                    for k in jax.random.split(key, shape[0])]),
                (self.num_heads, 5, 5, e, e))
            self.bank_bias = self.param("bank_bias", nn.initializers.zeros,
                                        (self.num_heads, e))

    def kernels(self):
        """Raw (kernel, bias) per stream — the fusion inputs.  For
        mode="bank" returns the whole [K, 5, 5, C, C] / [K, C] bank."""
        if self.mode == "single":
            return [self.sal_layer()]
        if self.mode == "dual":
            return [self.sal_layer_true(), self.sal_layer_false()]
        return [(self.bank_kernel, self.bank_bias)]

    def __call__(self, h, task_ids=None):
        """The literal path: materialize the 5x5 512->512 conv output
        per stream (parity oracle / ``fuse_head=False``)."""
        if self.mode == "single":
            k, b = self.sal_layer()
            return (conv2d(h, k, b, padding=((2, 2), (2, 2)),
                           dtype=self.dtype),)
        if self.mode == "dual":
            kt, bt = self.sal_layer_true()
            kf, bf = self.sal_layer_false()
            return (conv2d(h, kt, bt, padding=((2, 2), (2, 2)),
                           dtype=self.dtype),
                    conv2d(h, kf, bf, padding=((2, 2), (2, 2)),
                           dtype=self.dtype))
        # bank: gather per-sample kernels, vmapped conv — gradients flow
        # only to the gathered slices, matching ModuleDict behaviour
        k_sel = self.bank_kernel[task_ids].astype(self.dtype)  # [N,5,5,C,C]
        b_sel = self.bank_bias[task_ids].astype(self.dtype)    # [N, C]
        h = h.astype(self.dtype)

        def one(hi, ki, bi):
            out = jax.lax.conv_general_dilated(
                hi[None], ki, (1, 1), [(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
            return out + bi
        return (jax.vmap(one)(h, k_sel, b_sel),)


# ---------------------------------------------------------------------------
# Fused conditioner+head evaluation
#
# The reference feeds the 5x5 512->512 conditioner conv output straight
# into predict_head with NO nonlinearity in between
# (OSIE/models/baseline_attention.py:281-282 `feature =
# self.performance_sal_layer(output); self.object_head(feature)`), and
# every head consumer of that feature is itself a LINEAR 512->1 conv
# (sal_layer_2 1x1, sal_layer_3 1x1, drt_layer_1 7x7 stride 5 —
# baseline_attention.py:130-135) with nonlinearities only afterwards.
# The chain therefore composes algebraically: contract the conditioner
# kernel with each head kernel ONCE per forward (hoisted out of the
# 16-step scan) and apply only 512->1 convs per step.  This removes the
# per-step 512->512 channel mixing — ~15.7 GFLOP/step, ~35% of total
# model FLOPs at reference geometry — EXACTLY (up to float
# reassociation).
#
# Border handling: the 1x1 compositions are exact everywhere.  The drt
# composition (7x7 stride-5 after 5x5, both zero-padded) is an 11x11
# stride-5 conv on the zero-extended input PLUS corrections for windows
# that overlap the conditioner's zero padding — with kernel 7, padding
# 2, stride 5 on an H,W divisible-by-5 grid these occur only at output
# row 0 (input rows -2, -1) and output column 0 (input cols -2, -1).
# The corrections are tiny 512->1 convs over the 2-row / 2-col border
# strips, derived below and verified bit-tight against the two-stage
# oracle in tests/test_fused_head.py.
# ---------------------------------------------------------------------------


def _rowcomp(k1row, kdrow):
    """1-D kernel composition: out[q, i] = sum_{b+dx=q} kdrow[b, o] *
    k1row[dx, i, o], with dx in 0..4, b in 0..6, q in 0..10."""
    parts = jnp.einsum("xio,bo->bxi", k1row, kdrow)   # [7, 5, C]
    out = jnp.zeros((11, k1row.shape[1]), k1row.dtype)
    for b in range(7):
        out = out.at[b:b + 5].add(parts[b])
    return out


def fuse_cond_head(k1, b1, head_raw, map_h, map_w):
    """Compose a [5,5,C,C] conditioner kernel/bias with the head's three
    512->1 convs.  All math in the params' dtype (f32).  Returns a dict
    of composed tensors consumed by :func:`apply_fused_cond_head`."""
    c = k1.shape[2]
    w2k, w2b = head_raw["w2"]
    w3k, w3b = head_raw["w3"]
    kdk, kdb = head_raw["kd"]
    w2 = w2k[0, 0, :, 0]
    w3 = w3k[0, 0, :, 0]
    kd = kdk[..., 0]                                   # [7, 7, Co]

    # --- 1x1 head convs compose exactly (stop-map + action-map) ---
    k_sa = jnp.stack([jnp.einsum("yxco,o->yxc", k1, w2),
                      jnp.einsum("yxco,o->yxc", k1, w3)],
                     axis=-1)                          # [5, 5, C, 2]
    b_sa = jnp.stack([b1 @ w2 + w2b[0], b1 @ w3 + w3b[0]])

    # --- drt main term: 11x11 composite kernel via a "full" conv of the
    # conditioner kernel (as a C-batch of 5x5xCo images) with the
    # spatially flipped drt kernel ---
    lhs = jnp.transpose(k1, (2, 0, 1, 3))              # [C, 5, 5, Co]
    rhsf = kd[::-1, ::-1, :, None]                     # [7, 7, Co, 1]
    keff = jax.lax.conv_general_dilated(
        lhs, rhsf, (1, 1), ((6, 6), (6, 6)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # [C, 11, 11, 1]
    keff = jnp.transpose(keff[..., 0], (1, 2, 0))[..., None]  # [11,11,C,1]

    # --- border-correction kernels (virtual conditioner rows -2/-1 and
    # cols -2/-1 that the zero-extended main term wrongly includes).
    # Row r=-2 of the virtual conditioner output reads only input row 0
    # (kernel row 4); r=-1 reads rows 0-1 (kernel rows 3-4); drt kernel
    # rows 0/1 pair with r=-2/-1 at output row 0. ---
    wr = jnp.stack([_rowcomp(k1[4], kd[0]) + _rowcomp(k1[3], kd[1]),
                    _rowcomp(k1[4], kd[1])])           # [2(y), 11(q), C]
    wc0 = _rowcomp(k1[:, 4], kd[:, 0]) + _rowcomp(k1[:, 3], kd[:, 1])
    wc1 = _rowcomp(k1[:, 4], kd[:, 1])
    wc = jnp.stack([wc0, wc1], axis=1)                 # [11(p), 2(x), C]

    # corner (rows AND cols virtual — double-subtracted, add back once)
    def cc_term(y, x):
        acc = jnp.zeros((c,), k1.dtype)
        for j in range(y, 2):
            for k in range(x, 2):
                acc = acc + jnp.einsum("o,io->i", kd[j, k],
                                       k1[y + 4 - j, x + 4 - k])
        return acc
    wcc = jnp.stack([jnp.stack([cc_term(0, 0), cc_term(0, 1)]),
                     jnp.stack([cc_term(1, 0), cc_term(1, 1)])])  # [2,2,C]

    # conditioner bias flowing through the drt window, clipped to the
    # in-bounds region: a geometry-dependent [h5, w5] constant map
    k2b1 = jnp.einsum("abo,o->ab", kd, b1)
    ones = jnp.ones((1, map_h, map_w, 1), k1.dtype)
    b1map = jax.lax.conv_general_dilated(
        ones, k2b1[..., None, None], (5, 5), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]

    # --- tap decomposition of the same two kernels (SP_HEAD_IMPL=taps):
    # the 5x5 C->2 and 11x11-stride-5 C->1 convs are MXU-hostile (2 and
    # 1 output channels against a 128-lane systolic array).  Split each
    # into (a) a 1x1 C->(50|121) channel contraction — one well-shaped
    # MXU matmul emitted jointly for both — and (b) a per-tap spatial
    # gather applied as shifted-slice adds (pure elementwise, fusable).
    # Channel layouts: sa tap-major with the 2 outputs innermost
    # (c1 = 2*(5*dy+dx) + o), drt c2 = 11*dy + dx.
    c_sa = jnp.transpose(k_sa.reshape(25, c, 2), (1, 0, 2)).reshape(c, 50)
    c_kd = jnp.transpose(keff.reshape(121, c), (1, 0))
    k_taps = jnp.concatenate([c_sa, c_kd], axis=-1)[None, None]  # [1,1,C,171]

    return {"k_sa": k_sa, "b_sa": b_sa, "keff": keff, "k_taps": k_taps,
            "wr": wr, "wc": wc, "wcc": wcc, "b1map": b1map, "bd": kdb[0]}


@functools.cache
def _sel_kernel_sa():
    """One-hot [5, 5, 50, 2] gather kernel: output o at offset (dy, dx)
    selects partial-product channel 2*(5*dy+dx) + o.  Cached as NUMPY —
    caching a jnp array would capture a tracer when the first call
    happens under jit."""
    import numpy as np
    sel = np.zeros((5, 5, 50, 2), np.float32)
    for dy in range(5):
        for dx in range(5):
            for o in range(2):
                sel[dy, dx, 2 * (5 * dy + dx) + o, o] = 1.0
    return sel


@functools.cache
def _sel_kernel_drt():
    """One-hot [11, 11, 121, 1] gather kernel: offset (dy, dx) selects
    partial-product channel 11*dy + dx.  Cached as numpy (see
    :func:`_sel_kernel_sa`)."""
    import numpy as np
    sel = np.zeros((11, 11, 121, 1), np.float32)
    for dy in range(11):
        for dx in range(11):
            sel[dy, dx, 11 * dy + dx, 0] = 1.0
    return sel


def apply_fused_cond_head(h, fused, dtype):
    """Apply the composed conditioner+head to the ConvLSTM state ``h``
    [N, H, W, C].  Returns (stop_logit [N, 1] f32, amap [N, H, W] f32,
    drt_raw [N, h5, w5] f32 — the pre-relu drt_layer_1 output to feed
    :meth:`PredictHead.finish_duration`)."""
    n = h.shape[0]
    # f32 normally (the head's documented exit precision), f64 when the
    # whole computation runs double (the exactness tests)
    hi_t = jnp.promote_types(jnp.float32, h.dtype)
    hc = h.astype(dtype)
    if _impl_flag("SP_HEAD_IMPL", "taps") == "taps":
        # one MXU-shaped 1x1 C->171 conv for both head kernels, then a
        # one-hot "selection conv" per kernel that sums each tap's
        # partial product at its spatial offset (channel layouts in
        # fuse_cond_head).  Exactly the original convs' sums; the
        # selection convs touch 50/121-channel maps (66/150 MB at bench
        # geometry) instead of re-reading the 512-channel state twice.
        m = conv2d(hc, fused["k_taps"], dtype=dtype)
        sa = conv2d(m[..., :50], _sel_kernel_sa(), padding=((2, 2), (2, 2)),
                    dtype=dtype)
        sa = sa.astype(hi_t) + fused["b_sa"]
        main = conv2d(m[..., 50:], _sel_kernel_drt(), strides=(5, 5),
                      padding=((4, 2), (4, 2)),
                      dtype=dtype)[..., 0].astype(hi_t)
    else:
        sa = conv2d(hc, fused["k_sa"], padding=((2, 2), (2, 2)), dtype=dtype)
        sa = sa.astype(hi_t) + fused["b_sa"]
        main = conv2d(hc, fused["keff"], strides=(5, 5),
                      padding=((4, 2), (4, 2)),
                      dtype=dtype)[..., 0].astype(hi_t)
    stop_logit = jnp.mean(sa[..., 0].reshape(n, -1), axis=-1, keepdims=True)
    amap = nn.relu(sa[..., 1])                         # [N, H, W] f32
    # corrections run on tiny border strips — full precision throughout
    h32 = h.astype(hi_t)
    crow = conv2d(h32[:, :2], fused["wr"].astype(hi_t)[..., None],
                  strides=(1, 5),
                  padding=((0, 0), (4, 2)))[:, 0, :, 0]      # [N, w5]
    ccol = conv2d(h32[:, :, :2], fused["wc"].astype(hi_t)[..., None],
                  strides=(5, 1),
                  padding=((4, 2), (0, 0)))[:, :, 0, 0]      # [N, h5]
    ccorn = jnp.einsum("nyxc,yxc->n", h32[:, :2, :2], fused["wcc"])
    d = main + fused["b1map"][None] + fused["bd"]
    d = d.at[:, 0, :].add(-crow)
    d = d.at[:, :, 0].add(-ccol)
    d = d.at[:, 0, 0].add(ccorn)
    return stop_logit, amap, d
