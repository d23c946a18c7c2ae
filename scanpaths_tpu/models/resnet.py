"""Dilated ResNet-50 backbone (flax.linen, NHWC).

Structural contract (reference OSIE/models/resnet.py:57-130 plus the
SAM-style dilation patch applied in
OSIE/models/baseline_attention.py:212-224):

* Caffe-style bottleneck: the stride sits on the 1x1 ``conv1`` of each
  block (not on conv2 as in modern torchvision);
* stem maxpool is kernel 3, stride 2, padding 0, ``ceil_mode=True``;
* the dilation patch removes the stride of layer2[0] and layer4[0]
  (conv1 + downsample) and dilates every 3x3 conv of layer3 (rate 2)
  and layer4 (rate 4), so a 240x320 input yields a stride-8 feature
  grid of 30x40 with 2048 channels;
* the classifier head (avgpool + fc) is dropped.

Pretrained weights: `load_torch_state_dict` converts a torchvision-era
``resnet50`` state dict (e.g. resnet50-19c8e357.pth) into this module's
parameter tree (OIHW->HWIO transpose, BN stats into ``batch_stats``).
With no checkpoint on disk the backbone initializes with the reference
scheme: He-normal convs, unit-gamma BN (resnet.py:113-119).

Acquisition (the reference fetches the same file through model_zoo,
AiR/models/resnet.py:179 ``resnet50(pretrained=True)``):

    wget https://download.pytorch.org/models/resnet50-19c8e357.pth
    python -m scanpaths_tpu.cli.train --checkpoint resnet50-19c8e357.pth ...

The 8-hex suffix in the filename is the sha256 prefix (torchvision's
integrity scheme); :func:`verify_torchvision_sha` checks it before
loading and the trainer refuses a corrupted file.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def verify_torchvision_sha(path: str) -> bool:
    """Torchvision checkpoint filenames embed the first 8 hex chars of
    the file's sha256 (``resnet50-19c8e357.pth``).  Returns True when
    the file content matches its name's digest; files without the
    ``-hex8`` pattern pass trivially (custom checkpoints)."""
    import hashlib
    import os
    import re

    m = re.search(r"-([0-9a-f]{8})\.pth$", os.path.basename(path))
    if not m:
        return True
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest().startswith(m.group(1))


def he_conv_init(key, shape, dtype=jnp.float32):
    """normal(0, sqrt(2 / (kh*kw*out))) — the reference's conv init."""
    kh, kw, _, out = shape
    n = kh * kw * out
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / n)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32
    # flax BatchNorm axis_name: set to the data axis inside shard_map
    # steps so training stats are computed over the GLOBAL batch (the
    # pjit path gets this from GSPMD automatically)
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(d * (k - 1) // 2,) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
            kernel_init=he_conv_init, name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name, axis_name=self.bn_axis)

        residual = x
        # stride on conv1 (Caffe-style, reference resnet.py:63)
        out = conv(self.planes, 1, self.stride, 1, "conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.planes, 3, 1, self.dilation, "conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = conv(self.planes * self.expansion, 1, 1, 1, "conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride, 1,
                            "downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


def s2d_stem_conv(x: jnp.ndarray, k7: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    """The stem's 7x7/stride-2/pad-3 convolution computed as
    space-to-depth(2) + a 4x4/stride-1 convolution (the MLPerf ResNet
    "conv0 space-to-depth" transform) — EXACT, not an approximation.

    The pixel-space conv reads 3 input channels, which leaves the MXU's
    128-wide contraction lanes ~98% idle; packing 2x2 pixel blocks into
    channels raises the contraction to 12 and cuts the stem's HBM
    rounds.  Derivation: zero-pad the kernel to 8x8 at the top-left so
    output pixel i reads rows 2i-4..2i+3 — exactly four stride-2 cells
    i-2..i+1 — then regroup kernel taps by (row phase r, col phase s):

        out[i,j] = sum_{a,b in [0,8)} K8[a,b,c] X[2i-4+a, 2j-4+b, c]
                 = sum_{u,v in [0,4)} K4[u,v,(r,s,c)] X2[i-2+u, j-2+v,
                                                          (r,s,c)]
        with X2[p,q,(r,s,c)] = X[2p+r, 2q+s, c],
             K4[u,v,(r,s,c)] = K8[2u+r, 2v+s, c].

    The extra zero row/col of K8 multiplies the one extra padded input
    row/col, so every term matches the original sum.  Requires even
    H, W (true of every supported geometry).  The parameter stays the
    standard [7,7,3,64] kernel — checkpoints port unchanged in both
    directions."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    co = k7.shape[-1]
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = k8.reshape(4, 2, 4, 2, c, co).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 4 * c, co)
    return jax.lax.conv_general_dilated(
        x2.astype(dtype), k4.astype(dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _StemKernel(nn.Module):
    """Param holder so the s2d stem shares the conv path's exact
    parameter tree (params["conv1"]["kernel"], shape [7,7,3,64])."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", he_conv_init, (7, 7, 3, 64))


def _ceil_maxpool(x, window=3, stride=2):
    """MaxPool2d(kernel=3, stride=2, padding=0, ceil_mode=True)."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])


class DilatedResNet50(nn.Module):
    """Stride-8 ResNet-50 trunk; input NHWC [N, 240, 320, 3] ->
    [N, 30, 40, 2048].

    ``remat=True`` checkpoints every bottleneck block
    (jax.checkpoint): backprop holds block BOUNDARY activations only,
    recomputing block internals — the standard trade for large train
    batches.  Parameter tree unchanged."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    remat: bool = False
    # "conv" = the pixel-space 7x7/s2 stem; "s2d" = the exact
    # space-to-depth reformulation (s2d_stem_conv) — same parameter
    # tree, same numbers up to conv-sum reassociation, fewer idle MXU
    # lanes on the 3-channel input
    stem_impl: str = "conv"
    bn_axis: Any = None  # see Bottleneck.bn_axis

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stem_impl == "s2d":
            k7 = _StemKernel(name="conv1")()
            x = s2d_stem_conv(x, k7, dtype=self.dtype)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, kernel_init=he_conv_init,
                        name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1",
                         axis_name=self.bn_axis)(x)
        x = nn.relu(x)
        x = _ceil_maxpool(x)

        # (planes, first-block stride, dilation) per stage after the
        # dilation patch (baseline_attention.py:212-224)
        # train must be STATIC under remat (it selects the BatchNorm
        # branch with a python bool) — hence positional + static_argnums.
        # prevent_cse stays at its default True: the blocks run in
        # straight-line jitted code (not inside a scan), where CSE could
        # otherwise merge the recompute back into the forward pass and
        # silently restore full activation memory.
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) \
            if self.remat else Bottleneck
        stages = [(64, 1, 1), (128, 1, 1), (256, 2, 2), (512, 1, 4)]
        for si, ((planes, stride, dilation), blocks) in enumerate(
                zip(stages, self.layers), start=1):
            for bi in range(blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=(bi == 0),
                    dtype=self.dtype,
                    bn_axis=self.bn_axis,
                    name=f"layer{si}_block{bi}",
                )(x, train)
        return x


# ---------------------------------------------------------------------------
# Fused inference path (Pallas whole-stage bottleneck kernel)
# ---------------------------------------------------------------------------

# (planes, first-block stride, dilation) per stage — the SAME table as
# DilatedResNet50.__call__ after the dilation patch
_STAGES = ((64, 1, 1), (128, 1, 1), (256, 2, 2), (512, 1, 4))


def fused_backbone_apply(variables: dict, images: jnp.ndarray,
                         layers: Sequence[int] = (3, 4, 6, 3),
                         dtype=jnp.bfloat16, interpret: bool = False,
                         use_kernels=True):
    """Inference forward of :class:`DilatedResNet50` with the uniform
    bottleneck blocks of layers 1-3 fused into whole-stage Pallas
    kernels (ops/pallas_block.py) and BatchNorm folded into the conv
    weights (exact eval semantics).

    The early stages are HBM-bandwidth-bound under XLA (per-conv
    fusion only); the whole-stage kernel keeps every intermediate in
    VMEM, measured 1.70x / 1.44x / 1.20x the XLA stage for layer2 /
    layer1 / layer3 at bench geometry (docs/PERF.md).  Layer4 is
    already compute-bound at 89% MFU (the dilation-4 ring would add
    16.7% junk-row FLOPs), so it and every downsample block stay on
    the XLA path as plain folded convolutions.

    ``variables`` is the model's {"params", "batch_stats"} pair with
    the backbone subtree at the usual names; output matches
    ``DilatedResNet50().apply(..., train=False)`` up to bf16
    reassociation (f32-exact in f32 — tests/test_pallas_block.py).
    No VJP: training keeps the flax module.
    """
    from ..ops import pallas_block as pb

    params, stats = variables["params"], variables["batch_stats"]

    def fold(p, s, conv, bn):
        k, b = pb.fold_bn(p[conv]["kernel"], p[bn]["scale"], p[bn]["bias"],
                          s[bn]["mean"], s[bn]["var"])
        return k.astype(dtype), b.astype(dtype)

    def conv(x, k, b, stride=1, pad=0, dil=1):
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), k, (stride, stride), [(pad, pad)] * 2,
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b

    k1, b1 = fold(params, stats, "conv1", "bn1")
    x = jax.nn.relu(conv(images, k1, b1, stride=2, pad=3))
    x = _ceil_maxpool(x)

    for si, ((planes, stride, dil), blocks) in enumerate(
            zip(_STAGES, layers), start=1):
        # block 0 (downsample) as plain folded convs
        name = f"layer{si}_block0"
        p, s = params[name], stats[name]
        kc1, bc1 = fold(p, s, "conv1", "bn1")
        kc2, bc2 = fold(p, s, "conv2", "bn2")
        kc3, bc3 = fold(p, s, "conv3", "bn3")
        kd, bd = fold(p, s, "downsample_conv", "downsample_bn")
        out = jax.nn.relu(conv(x, kc1, bc1, stride=stride))
        out = jax.nn.relu(conv(out, kc2, bc2, pad=dil, dil=dil))
        out = conv(out, kc3, bc3)
        x = jax.nn.relu(out + conv(x, kd, bd, stride=stride))

        rest = [f"layer{si}_block{bi}" for bi in range(1, blocks)]
        fuse_this = (use_kernels if isinstance(use_kernels, bool)
                     else si in use_kernels)
        if si <= 3 and rest and fuse_this:
            st = pb.stack_stage_params(params, stats, rest, dtype)
            x = pb.stage_apply(x, dil, st["w1"], st["b1"], st["w2"],
                               st["b2"], st["w3"], st["b3"],
                               interpret=interpret)
        else:
            for name in rest:
                p, s = params[name], stats[name]
                kc1, bc1 = fold(p, s, "conv1", "bn1")
                kc2, bc2 = fold(p, s, "conv2", "bn2")
                kc3, bc3 = fold(p, s, "conv3", "bn3")
                out = jax.nn.relu(conv(x, kc1, bc1))
                out = jax.nn.relu(conv(out, kc2, bc2, pad=dil, dil=dil))
                x = jax.nn.relu(conv(out, kc3, bc3) + x)
    return x


# ---------------------------------------------------------------------------
# torchvision-era state-dict conversion
# ---------------------------------------------------------------------------

def load_torch_state_dict(state_dict: dict[str, Any],
                          layers: Sequence[int] = (3, 4, 6, 3)):
    """Convert a torch ``resnet50`` state dict (old torchvision naming:
    conv1/bn1/layer{1-4}.{i}.{conv,bn}{1-3}/downsample.{0,1}) into
    (params, batch_stats) pytrees for :class:`DilatedResNet50`."""

    def t(w):  # torch OIHW conv -> flax HWIO
        return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))

    def v(w):
        return jnp.asarray(np.asarray(w))

    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def put_bn(dst_p, dst_s, prefix):
        dst_p["scale"] = v(state_dict[prefix + ".weight"])
        dst_p["bias"] = v(state_dict[prefix + ".bias"])
        dst_s["mean"] = v(state_dict[prefix + ".running_mean"])
        dst_s["var"] = v(state_dict[prefix + ".running_var"])

    params["conv1"] = {"kernel": t(state_dict["conv1.weight"])}
    params["bn1"] = {}
    stats["bn1"] = {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    for si, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            name = f"layer{si}_block{bi}"
            src = f"layer{si}.{bi}"
            p: dict[str, Any] = {}
            s: dict[str, Any] = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {"kernel": t(state_dict[f"{src}.conv{ci}.weight"])}
                p[f"bn{ci}"] = {}
                s[f"bn{ci}"] = {}
                put_bn(p[f"bn{ci}"], s[f"bn{ci}"], f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {
                    "kernel": t(state_dict[f"{src}.downsample.0.weight"])}
                p["downsample_bn"] = {}
                s["downsample_bn"] = {}
                put_bn(p["downsample_bn"], s["downsample_bn"],
                       f"{src}.downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats
