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

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

EPSILON = 1e-7
NEG_INF = -1e9


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

    @nn.compact
    def __call__(self, s, cv):
        kernel = self.param("kernel", grouped_xavier_conv_init(3),
                            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        s = s.astype(self.dtype)
        cv = cv.astype(self.dtype)
        n, hh, ww = s.shape
        # per-sample effective kernel: [N, 9, G]
        kp = jnp.einsum("hwco,nc->nhwo", k, cv).reshape(n, 9, self.features)
        # 9 shifted copies of the zero-padded scalar map: [N, H, W, 9]
        spad = jnp.pad(s, ((0, 0), (1, 1), (1, 1)))
        patches = jnp.stack(
            [spad[:, dy:dy + hh, dx:dx + ww]
             for dy in range(3) for dx in range(3)], axis=-1)
        out = jnp.einsum("nyxk,nko->nyxo", patches, kp)
        return out + bias.astype(self.dtype)


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

    def _conv(self, feats, groups, name):
        return nn.Conv(feats, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=grouped_xavier_conv_init(groups),
                       dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, xg, h, c, signals: Sequence[tuple]):
        e = self.embed
        hg = self._conv(4 * e, 4, "gates_h")(h)
        acc = xg + hg
        # split pre-activations: [i, f, o, g]
        i_pre, f_pre, o_pre, g_pre = jnp.split(acc, 4, axis=-1)
        for idx, (s, cv) in enumerate(signals):
            sg = SignalGates(3 * e, e, dtype=self.dtype,
                             name=f"gates_s{idx}")(s, cv)
            si, sf, so = jnp.split(sg, 3, axis=-1)
            i_pre, f_pre, o_pre = i_pre + si, f_pre + sf, o_pre + so
        i = nn.sigmoid(i_pre)
        f = nn.sigmoid(f_pre)
        o = nn.sigmoid(o_pre)
        g = jnp.tanh(g_pre)
        c_next = f * c + i * g
        h_next = o * c_next  # reference quirk: no tanh
        return h_next, c_next


class XGates(nn.Module):
    """The hoisted x-dependent ConvLSTM gate pre-activations."""

    embed: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, visual):
        return nn.Conv(4 * self.embed, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=grouped_xavier_conv_init(4),
                       dtype=self.dtype, name="gates_x")(visual)


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
    """

    map_h: int = 30
    map_w: int = 40
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        n = feat.shape[0]
        stop_map = nn.Conv(1, (1, 1), kernel_init=xavier_conv_init,
                           dtype=self.dtype, name="sal_layer_2")(feat)
        stop_logit = jnp.mean(
            stop_map.reshape(n, -1).astype(jnp.float32), axis=-1,
            keepdims=True)  # global avg pool
        t = nn.Conv(1, (7, 7), strides=(5, 5), padding=[(2, 2), (2, 2)],
                    kernel_init=xavier_conv_init, dtype=self.dtype,
                    name="drt_layer_1")(feat)
        t = nn.relu(t)
        t = nn.Conv(2, (self.map_h // 5, self.map_w // 5), padding="VALID",
                    kernel_init=xavier_conv_init, dtype=self.dtype,
                    name="drt_layer_2")(t)
        # duration params and logits leave the mixed-precision region in
        # f32: exp() range and the categorical sampling need it
        t = t.reshape(n, 2).astype(jnp.float32)
        mu = t[:, 0]
        sigma2 = jnp.exp(t[:, 1])
        amap = nn.relu(nn.Conv(1, (1, 1), kernel_init=xavier_conv_init,
                               dtype=self.dtype,
                               name="sal_layer_3")(feat))[..., 0]  # [N,H,W]
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

    @nn.compact
    def __call__(self, h, task_ids=None):
        e = self.embed
        if self.mode == "single":
            return (nn.Conv(e, (5, 5), padding=[(2, 2), (2, 2)],
                            kernel_init=xavier_conv_init, dtype=self.dtype,
                            name="sal_layer")(h),)
        if self.mode == "dual":
            good = nn.Conv(e, (5, 5), padding=[(2, 2), (2, 2)],
                           kernel_init=xavier_conv_init, dtype=self.dtype,
                           name="sal_layer_true")(h)
            poor = nn.Conv(e, (5, 5), padding=[(2, 2), (2, 2)],
                           kernel_init=xavier_conv_init, dtype=self.dtype,
                           name="sal_layer_false")(h)
            return good, poor
        # bank
        kernel = self.param(
            "bank_kernel",
            lambda key, shape: jnp.stack([
                xavier_conv_init(k, shape[1:])
                for k in jax.random.split(key, shape[0])]),
            (self.num_heads, 5, 5, e, e))
        bias = self.param("bank_bias", nn.initializers.zeros,
                          (self.num_heads, e))
        k_sel = kernel[task_ids].astype(self.dtype)   # [N, 5, 5, C, C]
        b_sel = bias[task_ids].astype(self.dtype)     # [N, C]
        h = h.astype(self.dtype)

        def one(hi, ki, bi):
            out = jax.lax.conv_general_dilated(
                hi[None], ki, (1, 1), [(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
            return out + bi
        return (jax.vmap(one)(h, k_sel, b_sel),)
