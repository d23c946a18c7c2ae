"""The scanpath prediction model: dilated ResNet-50 encoder + ConvLSTM
decoder, with the whole T-step decode expressed as one ``lax.scan``
program.

This is ONE model with three task plugins, replacing the reference's
three near-clone modules:

* task="osie": no conditioning, single head stream
  (reference OSIE/models/baseline_attention.py:179-414)
* task="air":  machine-attention conditioning, dual good/poor streams
  driving a shared ConvLSTM (reference AiR/models/baseline_attention.py:179-510)
* task="coco": detector-attention conditioning + per-category head bank
  (reference COCO_Search18/models/baseline_attention_multihead.py:179-424)

Behavioural contract preserved from the reference:
* softmax over actions is applied ONLY in eval mode; training returns
  raw logits and the CE loss applies its own softmax
  (baseline_attention.py:153-154, loss.py:12);
* the action/saliency map fed back into the history attention is the
  relu'd pre-softmax map;
* histories grow by one entry per step and are re-attended with the
  current step's features (here: fixed [T+1] buffers + masked softmax);
* the AiR training forward selects the good/poor stream per sample by
  the ground-truth performance flag (AiR baseline_attention.py:360-374,
  vectorized here with a select).

All tensors are NHWC.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .components import (
    Conditioner,
    FusedConvLSTMCell,
    PredictHead,
    SemanticAttention,
    SpatialAttention,
    XGates,
    apply_fused_cond_head,
    dense_init,
    fuse_cond_head,
    xavier_conv_init,
)
from .resnet import DilatedResNet50
from ..ops import pallas_cell


class ScanpathModel(nn.Module):
    task: str = "osie"
    embed: int = 512
    seq_len: int = 16
    map_h: int = 30
    map_w: int = 40
    num_categories: int = 18  # coco head bank size
    dtype: Any = jnp.float32  # compute dtype (params stay f32)
    # blocks per ResNet stage; (3, 4, 6, 3) = ResNet-50.  Smaller values
    # give structurally identical tiny models for CPU-hosted tests and
    # the multi-chip dryrun.
    backbone_layers: tuple = (3, 4, 6, 3)
    # rematerialization mode for backprop (bool or str):
    #   False | "none"  — save every intermediate (fastest, most HBM)
    #   True  | "all"   — jax.checkpoint on every ResNet bottleneck AND
    #                     the decode-scan body: backprop holds only
    #                     block/step boundaries, recomputing internals
    #                     (~1 extra full forward; the round-3 escape
    #                     hatch that ran batch 64 at 45% MFU)
    #   "backbone"      — checkpoint the bottlenecks only (the trunk is
    #                     14% of forward FLOPs but ~half of activation
    #                     memory at full geometry — cheap recompute)
    #   "scan"          — checkpoint the decode-scan body only
    #   "scan_policy"   — scan-body checkpoint with a save_only_these_
    #                     names policy keeping the ConvLSTM gate
    #                     pre-activations (components.py tags them
    #                     "lstm_gates"): the 3x3 512->2048 gate conv is
    #                     ~99% of per-step FLOPs, so saving its output
    #                     makes the step's recompute nearly free while
    #                     still dropping the attention/head/elementwise
    #                     residuals — measured fastest at EVERY batch
    #                     and the CLI default (docs/PERF.md round-5
    #                     campaign)
    #   "policy"        — "backbone" + "scan_policy" combined (the
    #                     large-batch default: batch 64+ fits with a
    #                     recompute bill of only the 14% trunk)
    remat: Any = False
    # ConvLSTM step implementation for the decode scan:
    #   "xla"     — the fused-conv flax cell (default; differentiable,
    #               used by every training path)
    #   "pallas"  — the fused Pallas TPU step (ops/pallas_cell.py):
    #               gate conv + signal taps + state update in one
    #               VMEM-resident program, h/c carried in flat padded
    #               layouts.  No-gradient decode paths only (the kernel
    #               defines no VJP); same math up to reassociation
    #               (tests/test_pallas_cell.py).
    #   "interpret" — the Pallas step in interpreter mode (CPU tests)
    cell_impl: str = "xla"
    # evaluate the conditioner+head chain via exact kernel composition
    # (components.fuse_cond_head): the reference applies predict_head to
    # the 5x5 conditioner output with no nonlinearity in between and
    # every head consumer is a linear 512->1 conv, so the per-step
    # 512->512 channel mixing (~35% of model FLOPs) folds into three
    # tiny 512->1 convs hoisted-composed once per forward.  Exact up to
    # float reassociation (tests/test_fused_head.py); same checkpoint.
    fuse_head: bool = True
    # backbone stem implementation ("conv" | "s2d"); see
    # resnet.DilatedResNet50.stem_impl
    stem_impl: str = "conv"
    # manual tensor parallelism (train/tp_step.py): when set to a mesh
    # axis name the model expects to run INSIDE a shard_map over that
    # axis with the heavy decode kernels (h-gate conv, xgates) arriving
    # as contraction-dim slices; they compute row-parallel with
    # explicit psums (components.tp_row_conv).  None = normal
    # replicated/GSPMD execution.  tp_shards must equal the model-axis
    # size (flax validates parameter shapes, so the slice shape is
    # declared up front).
    tp_axis: Any = None
    tp_shards: int = 1
    # cross-device BatchNorm axis (flax axis_name) — set to the data
    # axis inside shard_map steps so batch stats match the global-batch
    # stats the pjit path computes
    bn_axis: Any = None

    @property
    def hw(self) -> int:
        return self.map_h * self.map_w

    @property
    def remat_mode(self) -> str:
        if self.remat is True:
            return "all"
        if self.remat in (False, None, "none"):
            return "none"
        assert self.remat in ("all", "backbone", "scan", "scan_policy",
                              "policy"), self.remat
        return self.remat

    def setup(self):
        self.backbone = DilatedResNet50(
            layers=self.backbone_layers, dtype=self.dtype,
            remat=self.remat_mode in ("all", "backbone", "policy"),
            stem_impl=self.stem_impl, bn_axis=self.bn_axis)
        self.sal_conv = nn.Conv(self.embed, (3, 3), padding=[(1, 1), (1, 1)],
                                kernel_init=xavier_conv_init,
                                dtype=self.dtype)
        self.xgates = XGates(self.embed, dtype=self.dtype,
                             tp_axis=self.tp_axis,
                             tp_shards=self.tp_shards)
        self.lstm = FusedConvLSTMCell(
            self.embed, num_signals=2 if self.task == "air" else 1,
            dtype=self.dtype, tp_axis=self.tp_axis,
            tp_shards=self.tp_shards)
        self.semantic_embed = nn.Dense(self.embed, kernel_init=dense_init,
                                       dtype=self.dtype)
        self.spatial_embed = nn.Dense(self.hw, kernel_init=dense_init,
                                      dtype=self.dtype)
        self.semantic_att = SemanticAttention(self.embed, dtype=self.dtype)
        self.spatial_att = SpatialAttention(self.map_h, self.map_w,
                                            dtype=self.dtype)
        mode = {"osie": "single", "air": "dual", "coco": "bank"}[self.task]
        self.conditioner = Conditioner(mode=mode, embed=self.embed,
                                       num_heads=self.num_categories,
                                       dtype=self.dtype)
        self.head = PredictHead(self.map_h, self.map_w, embed=self.embed,
                                dtype=self.dtype)

    # -- feature extraction -------------------------------------------------

    def _features_from_map(self, amap, visual, vismean=None):
        """Saliency/attention map [N, H, W] + visual [N, H, W, C] ->
        (embedded spatial [N, HW], embedded semantic [N, C]).

        Mirrors get_spatial_semantic / get_channel_semantic + relu +
        embed (reference baseline_attention.py:226-236, 263-268).

        The two reductions of the product ``amap (x) visual`` factor
        exactly (up to float reassociation): the channel mean is
        ``amap * mean_c(visual)`` — and ``mean_c(visual)`` is
        step-invariant, hoisted once per forward (``vismean``) — while
        the spatial mean is one ``[N, HW] @ [N, HW, C]`` contraction.
        This runs once per scan step per stream, so skipping the
        materialized [N, H, W, C] product saves its HBM round-trips in
        the decode hot loop (SP_FEAT_IMPL=prod keeps the literal
        two-mean emission; equality tested in tests/test_model.py)."""
        from .components import _impl_flag
        hw = self.map_h * self.map_w
        if vismean is None or _impl_flag("SP_FEAT_IMPL", "factored") \
                == "prod":
            prod = amap[..., None] * visual
            spatial = nn.relu(jnp.mean(prod, axis=-1))      # [N, H, W]
            semantic = nn.relu(jnp.mean(prod, axis=(1, 2)))  # [N, C]
        else:
            spatial = nn.relu(amap * vismean)               # [N, H, W]
            semantic = nn.relu(
                jnp.einsum("nhw,nhwc->nc", amap, visual) / hw)
        spatial = self.spatial_embed(spatial.reshape(spatial.shape[0], -1))
        semantic = self.semantic_embed(semantic)
        return spatial, semantic

    def _new_stream_entry(self, amap, visual, vismean=None):
        spat, sem = self._features_from_map(amap, visual, vismean)
        return {
            "spat": spat,
            "spat_conv": self.spatial_att.project(spat),
            "sem": sem,
            "sem_proj": self.semantic_att.project(sem),
        }

    def _init_stream(self, entry, n):
        t1 = self.seq_len + 1

        def buf(x):
            out = jnp.zeros((x.shape[0], t1) + x.shape[1:], x.dtype)
            return out.at[:, 0].set(x)

        return {"hist": jax.tree.map(buf, entry), "cur": entry}

    def _attend(self, stream, valid):
        """Compute (spatial_mem [N, HW], semantic_mem [N, C])."""
        h = stream["hist"]
        spatial_mem = self.spatial_att(h["spat"], h["spat_conv"],
                                       stream["cur"]["spat"], valid)
        semantic_mem = self.semantic_att(h["sem"], h["sem_proj"],
                                         stream["cur"]["sem"], valid)
        return spatial_mem, semantic_mem

    def _write(self, stream, entry, slot):
        hist = {k: stream["hist"][k].at[:, slot].set(entry[k])
                for k in stream["hist"]}
        return {"hist": hist, "cur": entry}

    # -- decode step --------------------------------------------------------

    def _fused_head_out(self, h, fu):
        """One stream's fused conditioner+head evaluation."""
        n = h.shape[0]
        if self.task == "coco":
            # per-sample composed kernels (gathered from the bank)
            def one(hi, fi):
                sl, am, d = apply_fused_cond_head(hi[None], fi, self.dtype)
                return sl[0], am[0], d[0]
            stop_logit, amap, d = jax.vmap(one)(h, fu)
        else:
            stop_logit, amap, d = apply_fused_cond_head(h, fu, self.dtype)
        mu, sigma2 = self.head.finish_duration(d)
        z = jnp.concatenate([stop_logit, amap.reshape(n, -1)], axis=-1)
        return z, mu, sigma2, amap.astype(self.dtype)

    def _step(self, carry, _, fused=None, ctx=None):
        """One decode step.  ``carry`` holds only the step-VARYING
        state (h, c, history streams, step index); the loop-invariant
        tensors (visual features, hoisted gate pre-activations, task
        ids, Pallas kernels) live in ``ctx``, closed over by the scan
        body so they become scan CONSTANTS — lax.scan's backward saves
        constants once, whereas anything in the carry is saved (or,
        under remat, re-saved as a body residual) per step: keeping the
        ~6 MB/image of invariants out of the carry saves ~100 MB/image
        of training residuals at T=16."""
        n = carry["h"].shape[0]
        step = carry["step"]
        valid = jnp.arange(self.seq_len + 1) <= step

        signals = []
        for stream in carry["streams"]:
            smem, cmem = self._attend(stream, valid)
            # the task signal is the OUTER PRODUCT spatial (x) semantic
            # (reference baseline_attention.py:40-41); it is passed
            # unmaterialized so the gate conv can run factorized
            # (components.SignalGates)
            signals.append((smem.reshape(n, self.map_h, self.map_w), cmem))

        if self.cell_impl == "xla":
            h, c = self.lstm(ctx["xg"], carry["h"], carry["c"], signals)
            h_dense = h
        else:
            # fused Pallas step on flat-layout state (ops/pallas_cell);
            # carry["h"]/["c"] and ctx["xg"] are in halo/body layouts
            st, kp = self.lstm.pallas_signals(signals, self.map_h,
                                              self.map_w)
            h, c = pallas_cell.cell_step(
                carry["h"], carry["c"], ctx["xg"], st, kp,
                ctx["cell_kt"], self.map_h, self.map_w,
                interpret=self.cell_impl == "interpret")
            h_dense = pallas_cell.halo_to_grid(h, self.map_h, self.map_w)

        if fused is not None:
            heads = [self._fused_head_out(h_dense, fu) for fu in fused]
        else:
            feats = self.conditioner(h_dense, ctx.get("task_ids"))
            heads = [self.head(feat) for feat in feats]

        outs = []
        new_streams = []
        for (z, mu, sigma2, amap), stream in zip(heads, carry["streams"]):
            outs.append({"z": z, "mu": mu, "sigma2": sigma2, "amap": amap})
            entry = self._new_stream_entry(amap, ctx["visual"],
                                           ctx["vismean"])
            new_streams.append(self._write(stream, entry, step + 1))

        carry = dict(carry, h=h, c=c, streams=new_streams, step=step + 1)
        ys = outs[0] if len(outs) == 1 else {"good": outs[0], "poor": outs[1]}
        return carry, ys

    # -- full forward -------------------------------------------------------

    def __call__(self, images, attention_maps=None, performances=None,
                 task_ids=None, train: bool = False, features=None):
        """images: [N, 240, 320, 3] NHWC.  attention_maps: [N, H, W, 1]
        (air/coco) or None (osie -> zeros).  performances: [N] bool
        (air training).  task_ids: [N] int32 (coco).

        ``features`` (optional [N, H, W, 2048]): precomputed trunk
        features — used by the joint multi-task model, which runs ONE
        shared backbone and feeds several task heads; when given, this
        module's own backbone is bypassed (and, at init time, never
        creates parameters)."""
        if features is None:
            x = self.backbone(images, train=train)
        else:
            x = features
        n = x.shape[0]
        visual = nn.relu(self.sal_conv(x))                  # [N, H, W, C]

        if attention_maps is None:
            amap0 = jnp.zeros((n, self.map_h, self.map_w), self.dtype)
        else:
            amap0 = attention_maps[..., 0].astype(self.dtype)

        n_streams = 2 if self.task == "air" else 1
        # step-invariant channel mean of the visual features (hoisted
        # factor of the per-step spatial reduction, _features_from_map)
        vismean = jnp.mean(visual, axis=-1)
        entry0 = self._new_stream_entry(amap0, visual, vismean)
        streams = [self._init_stream(entry0, n) for _ in range(n_streams)]

        xg = self.xgates(visual)
        cell_kt = None
        if self.cell_impl == "xla":
            h0, c0 = jnp.zeros_like(visual), jnp.zeros_like(visual)
        else:
            # flat-layout state for the fused Pallas step; the constant
            # per-channel biases (h-gate conv + signal convs) fold into
            # the hoisted xg once per forward (the kernel adds none)
            mh, mw = self.map_h, self.map_w
            h0 = pallas_cell.zeros_halo(n, self.embed, mh, mw, self.dtype)
            c0 = pallas_cell.zeros_body(n, self.embed, mh, mw, self.dtype)
            kh, bh = self.lstm.gate_params()
            bias = bh + jnp.pad(self.lstm.signal_bias(), (0, self.embed))
            xg = pallas_cell.grid_to_body(xg, mh, mw) \
                + bias.astype(self.dtype)
            cell_kt = pallas_cell.gate_kernel_flat(kh, self.dtype)

        carry = {
            "h": h0,
            "c": c0,
            "streams": streams,
            "step": jnp.int32(0),
        }
        # loop-invariants ride as scan constants, NOT carry (see _step)
        ctx = {"xg": xg, "visual": visual, "vismean": vismean,
               "cell_kt": cell_kt}
        if self.task == "coco":
            ctx["task_ids"] = task_ids

        fused = None
        if self.fuse_head:
            # hoisted once per forward (params-only): composed
            # conditioner+head kernels, one entry per stream
            head_raw = self.head.raw()
            ks = self.conditioner.kernels()
            if self.task == "coco":
                bank_k, bank_b = ks[0]
                fb = jax.vmap(lambda k, b: fuse_cond_head(
                    k, b, head_raw, self.map_h, self.map_w))(bank_k, bank_b)
                fused = [jax.tree.map(lambda x: x[task_ids], fb)]
            else:
                fused = [fuse_cond_head(k, b, head_raw,
                                        self.map_h, self.map_w)
                         for (k, b) in ks]

        body = lambda mdl, c, xs: mdl._step(c, xs, fused,  # noqa: E731
                                            ctx)
        mode = self.remat_mode
        if mode in ("all", "scan"):
            body = nn.remat(body, prevent_cse=False)
        elif mode in ("policy", "scan_policy"):
            # keep the gate pre-activations (the gate conv is ~99% of
            # per-step FLOPs), recompute the cheap attention/head/
            # elementwise tail — near-no-remat speed at close to
            # full-remat scan memory (docs/PERF.md)
            body = nn.remat(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "lstm_gates"))
        # SP_SCAN_UNROLL=k emits k decode steps per scan iteration so
        # XLA can overlap their non-MXU tails (same math — scan
        # unrolling only changes scheduling).  Measured neutral-to-
        # negative at bench geometry (docs/PERF.md), default 1.
        from .components import _impl_flag
        scan = nn.scan(body,
                       variable_broadcast="params",
                       split_rngs={"params": False, "dropout": False},
                       length=self.seq_len,
                       unroll=int(_impl_flag("SP_SCAN_UNROLL", "1")))
        _, ys = scan(self, carry, None)

        def stack(seq_outs):
            # ys leaves are [T, N, ...] -> [N, T, ...]; everything leaves
            # the model in f32 (z/mu/sigma2 already are, amap may be bf16)
            z = jnp.swapaxes(seq_outs["z"], 0, 1)           # [N, T, A]
            mu = jnp.swapaxes(seq_outs["mu"], 0, 1)         # [N, T]
            sigma2 = jnp.swapaxes(seq_outs["sigma2"], 0, 1)
            amap = jnp.swapaxes(seq_outs["amap"], 0, 1)     # [N, T, H, W]
            return z, mu, sigma2, amap.astype(jnp.float32)

        if self.task != "air":
            z, mu, sigma2, amap = stack(ys)
            if train:
                # raw logits; CE applies its own softmax (reference
                # loss.py:12, baseline_attention.py:153-154)
                return {"actions": z, "log_normal_mu": mu,
                        "log_normal_sigma2": sigma2}
            probs = jax.nn.softmax(z, axis=-1)
            return {"all_actions_prob": probs, "log_normal_mu": mu,
                    "log_normal_sigma2": sigma2, "action_map": amap}

        gz, gmu, gs2, gmap = stack(ys["good"])
        pz, pmu, ps2, pmap = stack(ys["poor"])
        if train and performances is not None:
            sel = performances.astype(bool)
            z = jnp.where(sel[:, None, None], gz, pz)
            mu = jnp.where(sel[:, None], gmu, pmu)
            sigma2 = jnp.where(sel[:, None], gs2, ps2)
            return {"all_actions_prob": z, "log_normal_mu": mu,
                    "log_normal_sigma2": sigma2}
        out = {
            "good_all_actions_prob": gz if train else jax.nn.softmax(gz, -1),
            "good_log_normal_mu": gmu, "good_log_normal_sigma2": gs2,
            "good_action_map": gmap,
            "poor_all_actions_prob": pz if train else jax.nn.softmax(pz, -1),
            "poor_log_normal_mu": pmu, "poor_log_normal_sigma2": ps2,
            "poor_action_map": pmap,
        }
        return out


class JointScanpathModel(nn.Module):
    """Joint multi-task model: ONE shared dilated-ResNet-50 trunk
    feeding the three task heads (OSIE free viewing, AiR VQA, COCO
    visual search).

    The reference has no joint training — its three directories are
    independent clones — so this is a new capability of the rebuild
    (BASELINE.json config 5): the 23M-parameter backbone is shared and
    receives gradients from every task, while each ~13M-parameter head
    (decoder + conditioner) is task-private.  ``task`` is static per
    call; training round-robins task batches (train/joint.py).
    """

    seq_len: int = 16
    map_h: int = 30
    map_w: int = 40
    embed: int = 512
    num_categories: int = 18
    dtype: Any = jnp.float32
    backbone_layers: tuple = (3, 4, 6, 3)
    remat: Any = False  # same modes as ScanpathModel.remat
    fuse_head: bool = True
    stem_impl: str = "conv"

    def setup(self):
        kw = dict(seq_len=self.seq_len, map_h=self.map_h, map_w=self.map_w,
                  embed=self.embed, num_categories=self.num_categories,
                  dtype=self.dtype, backbone_layers=self.backbone_layers,
                  remat=self.remat, fuse_head=self.fuse_head)
        remat_bb = (self.remat is True
                    or self.remat in ("all", "backbone", "policy"))
        self.backbone = DilatedResNet50(layers=self.backbone_layers,
                                        dtype=self.dtype, remat=remat_bb,
                                        stem_impl=self.stem_impl)
        self.osie = ScanpathModel(task="osie", **kw)
        self.air = ScanpathModel(task="air", **kw)
        self.coco = ScanpathModel(task="coco", **kw)

    def __call__(self, images, task: str = "osie", attention_maps=None,
                 performances=None, task_ids=None, train: bool = False):
        feats = self.backbone(images, train=train)
        head: ScanpathModel = getattr(self, task)
        return head(None, attention_maps=attention_maps,
                    performances=performances, task_ids=task_ids,
                    train=train, features=feats)

    def init_all(self, images, attention_maps, task_ids):
        """Initialization entry point: traces every head once so all
        parameters exist (flax creates params lazily along the traced
        path).  Use ``model.init(key, ..., method="init_all")``."""
        feats = self.backbone(images, train=False)
        outs = {}
        outs["osie"] = self.osie(None, features=feats)
        outs["air"] = self.air(None, attention_maps=attention_maps,
                               features=feats)
        outs["coco"] = self.coco(None, attention_maps=attention_maps,
                                 task_ids=task_ids, features=feats)
        return outs


class TaskView:
    """Adapter giving a :class:`JointScanpathModel` the single-task
    ``(model.task, model.apply)`` interface the train-step functions
    expect, with ``task`` statically bound."""

    def __init__(self, joint: JointScanpathModel, task: str):
        self._joint = joint
        self.task = task

    def apply(self, variables, images, *args, **kw):
        return self._joint.apply(variables, images, *args,
                                 task=self.task, **kw)


def create_model(task: str, **kw) -> ScanpathModel:
    assert task in ("osie", "air", "coco"), task
    return ScanpathModel(task=task, **kw)
