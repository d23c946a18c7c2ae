"""Full-model weight porting between the reference's torch checkpoints
and this framework's flax parameter trees.

Two directions:

* :func:`import_reference_checkpoint` — load a checkpoint produced by
  the reference (its released Google-Drive models or anything saved by
  its CheckpointManager: ``{"model": state_dict, "optimizer": ...}`` or
  a bare ``state_dict`` — reference utils/checkpointing.py:85-97) into
  (params, batch_stats) for :class:`ScanpathModel`.  A reference user
  switching frameworks keeps their trained models.
* :func:`export_reference_state_dict` — emit a torch-naming state dict
  from flax params, used by tools/parity_run.py to start the executed
  reference and the rebuild from IDENTICAL weights.

Name map (reference OSIE/models/baseline_attention.py; AiR/COCO
variants noted inline):

  torch                                  flax (ScanpathModel)
  -------------------------------------  -----------------------------
  resnet.{0,1,4,5,6,7}...                backbone/... (Sequential
                                         renumbering of conv1, bn1,
                                         layer1-4 after the strip at
                                         baseline_attention.py:193)
  sal_conv                               sal_conv
  lstm.{input,forget,output,memory}_x    xgates/gates_x   (stack i,f,o,g)
  lstm.{input,forget,output,memory}_h    lstm/gates_h     (stack i,f,o,g)
  lstm.{input,forget,output}             lstm/gates_s0    (stack i,f,o)
  lstm.{input,forget,output}_pos         lstm/gates_s0    (AiR)
  lstm.{input,forget,output}_neg         lstm/gates_s1    (AiR)
  semantic_embed / spatial_embed         semantic_embed / spatial_embed
  semantic_att.semantic_{lists,cur,      semantic_att/{lists,cur,att}
    attention}
  spatial_att.spatial_{lists,cur}        spatial_att/{lists_conv,cur_conv}
  spatial_att.spatial_attention          spatial_att/att ((30,40) conv
                                         flattened row-major to a Dense)
  performance_sal_layer                  conditioner/sal_layer (OSIE)
  performance_sal_layer.{True,False}     conditioner/sal_layer_{true,false}
  object_sal_layer.<category>            conditioner/bank_{kernel,bias}[k]
  object_head.{sal_layer_2,sal_layer_3,  head/...
    drt_layer_1,drt_layer_2}
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..data.datasets import COCO_OBJECT_NAMES
from .resnet import load_torch_state_dict

GATES_XH = ("input", "forget", "output", "memory")   # flax order i,f,o,g
GATES_S = ("input", "forget", "output")              # flax order i,f,o


def _t_conv(w):
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_lin(w):
    """torch Linear [out,in] -> flax Dense kernel [in,out]."""
    return np.transpose(np.asarray(w), (1, 0))


def _resnet_subdict(sd: dict) -> dict:
    """Un-renumber the stripped ``nn.Sequential`` trunk: child indices
    0,1,4,5,6,7 back to conv1,bn1,layer1..layer4 so the backbone
    converter (models/resnet.py) can consume it."""
    remap = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
             "6": "layer3", "7": "layer4"}
    out = {}
    for k, v in sd.items():
        if not k.startswith("resnet."):
            continue
        idx, rest = k[len("resnet."):].split(".", 1)
        out[f"{remap[idx]}.{rest}"] = np.asarray(v)
    return out


def _stack_gates(sd: dict, names: list[str]):
    """Concatenate per-gate torch convs along the output-channel axis
    (the fused cell splits the same axis back into gates)."""
    kernel = np.concatenate([_t_conv(sd[n + ".weight"]) for n in names],
                            axis=-1)
    bias = np.concatenate([np.asarray(sd[n + ".bias"]) for n in names])
    return {"kernel": kernel, "bias": bias}


def import_reference_checkpoint(ckpt, task: str, map_hw=(30, 40)):
    """torch checkpoint (CheckpointManager dict or bare state dict) ->
    (params, batch_stats) for ``ScanpathModel(task=task)``."""
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    as_np = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
             for k, v in sd.items()}

    b_params, b_stats = load_torch_state_dict(_resnet_subdict(as_np))
    params: dict[str, Any] = {"backbone": b_params}
    stats: dict[str, Any] = {"backbone": b_stats}

    params["sal_conv"] = {"kernel": _t_conv(as_np["sal_conv.weight"]),
                          "bias": as_np["sal_conv.bias"]}
    params["xgates"] = {"gates_x": _stack_gates(
        as_np, [f"lstm.{g}_x" for g in GATES_XH])}
    lstm = {"gates_h": _stack_gates(
        as_np, [f"lstm.{g}_h" for g in GATES_XH])}
    if task == "air":
        lstm["gates_s0"] = _stack_gates(
            as_np, [f"lstm.{g}_pos" for g in GATES_S])
        lstm["gates_s1"] = _stack_gates(
            as_np, [f"lstm.{g}_neg" for g in GATES_S])
    else:
        lstm["gates_s0"] = _stack_gates(
            as_np, [f"lstm.{g}" for g in GATES_S])
    params["lstm"] = lstm

    params["semantic_embed"] = {
        "kernel": _t_lin(as_np["semantic_embed.weight"]),
        "bias": as_np["semantic_embed.bias"]}
    params["spatial_embed"] = {
        "kernel": _t_lin(as_np["spatial_embed.weight"]),
        "bias": as_np["spatial_embed.bias"]}
    params["semantic_att"] = {
        "lists": {"kernel": _t_lin(as_np["semantic_att.semantic_lists.weight"]),
                  "bias": as_np["semantic_att.semantic_lists.bias"]},
        "cur": {"kernel": _t_lin(as_np["semantic_att.semantic_cur.weight"]),
                "bias": as_np["semantic_att.semantic_cur.bias"]},
        "att": {"kernel": _t_lin(as_np["semantic_att.semantic_attention.weight"]),
                "bias": as_np["semantic_att.semantic_attention.bias"]},
    }
    # the (30,40)-kernel scoring conv becomes a Dense over the
    # row-major-flattened map: [1, 1, H, W] -> [H*W, 1]
    att_w = np.asarray(as_np["spatial_att.spatial_attention.weight"])
    params["spatial_att"] = {
        "lists_conv": {"kernel": _t_conv(as_np["spatial_att.spatial_lists.weight"]),
                       "bias": as_np["spatial_att.spatial_lists.bias"]},
        "cur_conv": {"kernel": _t_conv(as_np["spatial_att.spatial_cur.weight"]),
                     "bias": as_np["spatial_att.spatial_cur.bias"]},
        "att": {"kernel": att_w.reshape(1, -1).T,
                "bias": as_np["spatial_att.spatial_attention.bias"]},
    }

    if task == "osie":
        params["conditioner"] = {"sal_layer": {
            "kernel": _t_conv(as_np["performance_sal_layer.weight"]),
            "bias": as_np["performance_sal_layer.bias"]}}
    elif task == "air":
        params["conditioner"] = {
            "sal_layer_true": {
                "kernel": _t_conv(as_np["performance_sal_layer.True.weight"]),
                "bias": as_np["performance_sal_layer.True.bias"]},
            "sal_layer_false": {
                "kernel": _t_conv(as_np["performance_sal_layer.False.weight"]),
                "bias": as_np["performance_sal_layer.False.bias"]},
        }
    else:  # coco bank, ModuleDict keyed by category name
        ks = [_t_conv(as_np[f"object_sal_layer.{n}.weight"])
              for n in COCO_OBJECT_NAMES]
        bs = [np.asarray(as_np[f"object_sal_layer.{n}.bias"])
              for n in COCO_OBJECT_NAMES]
        params["conditioner"] = {"bank_kernel": np.stack(ks),
                                 "bank_bias": np.stack(bs)}

    params["head"] = {
        name: {"kernel": _t_conv(as_np[f"object_head.{name}.weight"]),
               "bias": as_np[f"object_head.{name}.bias"]}
        for name in ("sal_layer_2", "sal_layer_3", "drt_layer_1",
                     "drt_layer_2")}
    import jax.numpy as jnp
    import jax
    to_j = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return to_j(params), to_j(stats)


def export_reference_state_dict(params, batch_stats, task: str) -> dict:
    """flax (params, batch_stats) -> torch-naming state dict (numpy
    values) accepted by the executed reference's ``load_state_dict``
    after tensor conversion."""
    import jax

    p = jax.tree.map(np.asarray, params)
    s = jax.tree.map(np.asarray, batch_stats)
    sd: dict[str, np.ndarray] = {}

    def put_conv(name, leaf):
        sd[name + ".weight"] = np.transpose(leaf["kernel"], (3, 2, 0, 1))
        if "bias" in leaf:
            sd[name + ".bias"] = leaf["bias"]

    def put_lin(name, leaf):
        sd[name + ".weight"] = np.transpose(leaf["kernel"], (1, 0))
        sd[name + ".bias"] = leaf["bias"]

    # --- backbone -> stripped-Sequential numbering ---
    bp, bs = p["backbone"], s["backbone"]
    remap = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
             "layer3": "6", "layer4": "7"}
    sd["resnet.0.weight"] = np.transpose(bp["conv1"]["kernel"], (3, 2, 0, 1))
    sd["resnet.1.weight"] = bp["bn1"]["scale"]
    sd["resnet.1.bias"] = bp["bn1"]["bias"]
    sd["resnet.1.running_mean"] = bs["bn1"]["mean"]
    sd["resnet.1.running_var"] = bs["bn1"]["var"]
    for key in bp:
        if not key.startswith("layer"):
            continue
        stage, block = key.split("_block")     # layer{si}_block{bi}
        pre = f"resnet.{remap[stage]}.{block}"
        blk_p, blk_s = bp[key], bs[key]
        for ci in (1, 2, 3):
            sd[f"{pre}.conv{ci}.weight"] = np.transpose(
                blk_p[f"conv{ci}"]["kernel"], (3, 2, 0, 1))
            sd[f"{pre}.bn{ci}.weight"] = blk_p[f"bn{ci}"]["scale"]
            sd[f"{pre}.bn{ci}.bias"] = blk_p[f"bn{ci}"]["bias"]
            sd[f"{pre}.bn{ci}.running_mean"] = blk_s[f"bn{ci}"]["mean"]
            sd[f"{pre}.bn{ci}.running_var"] = blk_s[f"bn{ci}"]["var"]
        if "downsample_conv" in blk_p:
            sd[f"{pre}.downsample.0.weight"] = np.transpose(
                blk_p["downsample_conv"]["kernel"], (3, 2, 0, 1))
            sd[f"{pre}.downsample.1.weight"] = blk_p["downsample_bn"]["scale"]
            sd[f"{pre}.downsample.1.bias"] = blk_p["downsample_bn"]["bias"]
            sd[f"{pre}.downsample.1.running_mean"] = \
                blk_s["downsample_bn"]["mean"]
            sd[f"{pre}.downsample.1.running_var"] = \
                blk_s["downsample_bn"]["var"]

    put_conv("sal_conv", p["sal_conv"])

    def split_gates(leaf, names, suffix):
        ks = np.split(leaf["kernel"], len(names), axis=-1)
        bs_ = np.split(leaf["bias"], len(names))
        for n, k, b in zip(names, ks, bs_):
            sd[f"lstm.{n}{suffix}.weight"] = np.transpose(k, (3, 2, 0, 1))
            sd[f"lstm.{n}{suffix}.bias"] = b

    split_gates(p["xgates"]["gates_x"], list(GATES_XH), "_x")
    split_gates(p["lstm"]["gates_h"], list(GATES_XH), "_h")
    if task == "air":
        split_gates(p["lstm"]["gates_s0"], list(GATES_S), "_pos")
        split_gates(p["lstm"]["gates_s1"], list(GATES_S), "_neg")
    else:
        split_gates(p["lstm"]["gates_s0"], list(GATES_S), "")

    put_lin("semantic_embed", p["semantic_embed"])
    put_lin("spatial_embed", p["spatial_embed"])
    put_lin("semantic_att.semantic_lists", p["semantic_att"]["lists"])
    put_lin("semantic_att.semantic_cur", p["semantic_att"]["cur"])
    put_lin("semantic_att.semantic_attention", p["semantic_att"]["att"])
    put_conv("spatial_att.spatial_lists", p["spatial_att"]["lists_conv"])
    put_conv("spatial_att.spatial_cur", p["spatial_att"]["cur_conv"])
    att_k = p["spatial_att"]["att"]["kernel"]      # [H*W, 1]
    h, w = 30, 40
    sd["spatial_att.spatial_attention.weight"] = \
        att_k.T.reshape(1, 1, h, w)
    sd["spatial_att.spatial_attention.bias"] = p["spatial_att"]["att"]["bias"]

    if task == "osie":
        put_conv("performance_sal_layer", p["conditioner"]["sal_layer"])
    elif task == "air":
        put_conv("performance_sal_layer.True",
                 p["conditioner"]["sal_layer_true"])
        put_conv("performance_sal_layer.False",
                 p["conditioner"]["sal_layer_false"])
    else:
        bank_k = p["conditioner"]["bank_kernel"]
        bank_b = p["conditioner"]["bank_bias"]
        for k, name in enumerate(COCO_OBJECT_NAMES):
            sd[f"object_sal_layer.{name}.weight"] = np.transpose(
                bank_k[k], (3, 2, 0, 1))
            sd[f"object_sal_layer.{name}.bias"] = bank_b[k]

    for name in ("sal_layer_2", "sal_layer_3", "drt_layer_1",
                 "drt_layer_2"):
        put_conv(f"object_head.{name}", p["head"][name])
    return sd
