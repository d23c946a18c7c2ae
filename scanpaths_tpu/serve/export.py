"""AOT serving export: the whole decode path (backbone -> ConvLSTM scan
-> head -> sampler) compiled to ONE self-contained StableHLO artifact
via ``jax.export``.

The reference's deployment story is "clone the repo and torch.load the
checkpoint" (reference AiR/test.py:91-96) — the model code, the exact
torch version, and the .pth file all travel together.  An exported
bundle here needs none of that: the trained weights are baked into the
serialized module as constants, the artifact is a versioned byte
string (StableHLO + a pinned calling convention), and a serving host
runs it with ``jax.export.deserialize(blob).call`` — no flax, no model
source, no checkpoint-restore path, and (with ``platforms=["tpu",
"cpu"]``) one artifact that runs on both backends.

Bundle layout (a directory):

    serve.jaxexport   serialized jax.export.Exported (weights inline)
    manifest.json     task / decode / geometry / signature / versions

The serve function's positional signature is fixed per task (mirroring
``train/steps._model_inputs``):

    osie:  (images,)                        greedy
           (seed, images)                   sample
    air:   (images, attention_maps)         + seed first when sampling
    coco:  (images, attention_maps, tasks)  + seed first when sampling

with ``images`` [B, H, W, 3] float32 (ImageNet-normalized, as produced
by ``data.transforms.load_image``), ``attention_maps`` [B, mh, mw, 1]
float32 max-normalized, ``tasks`` [B] int32 category ids, and ``seed``
a uint32 scalar.  Outputs are a dict of ``fix`` [(R,) B, T, 3] pixel
fixations (x, y, duration-seconds), ``fix_len`` [(R,) B], and
``action_probs`` [(R,) B, T] — the reference prediction-schema fields
(reference AiR/test.py:153-191) are derivable from these on the host.

The batch dimension can be a fixed int or SYMBOLIC (``batch="sym"``):
the artifact then serves any batch size with one compiled module per
size, traced once at export time.
"""

from __future__ import annotations

import json
import os
from os.path import join
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import GridSpec
from ..ops.sampling import greedy_sample, random_sample

_BLOB = "serve.jaxexport"
_MANIFEST = "manifest.json"


def build_serve_fn(model, variables: dict, grid: GridSpec, *,
                   decode: str = "greedy", num_samples: int = 1,
                   stream: str = "good") -> Callable:
    """Close the eval forward + decoder over trained ``variables``.

    ``model`` is any module with the ``ScanpathModel`` apply contract
    (incl. a joint-checkpoint ``TaskView``); ``stream`` picks the AiR
    output stream ("good" = correct-answer, like cli/predict.py).
    """
    task = model.task
    prefix = f"{stream}_" if task == "air" else ""

    def _forward(images, attention_maps=None, tasks=None):
        kw = {}
        if task in ("air", "coco"):
            kw["attention_maps"] = attention_maps
        if task == "coco":
            kw["task_ids"] = tasks
        out = model.apply(variables, images, train=False, **kw)
        return (out[f"{prefix}all_actions_prob"],
                out[f"{prefix}log_normal_mu"],
                out[f"{prefix}log_normal_sigma2"])

    def _pack(s):
        return {"fix": s.fix, "fix_len": s.fix_len,
                "action_probs": s.action_probs}

    if decode == "greedy":
        def serve(*args):
            probs, mu, sigma2 = _forward(*args)
            return _pack(greedy_sample(probs, mu, sigma2, grid))
    else:
        def serve(seed, *args):
            probs, mu, sigma2 = _forward(*args)
            keys = jax.random.split(jax.random.PRNGKey(seed), num_samples)
            return _pack(jax.vmap(
                lambda k: random_sample(k, probs, mu, sigma2, grid))(keys))

    return serve


def _arg_specs(task: str, decode: str, batch, grid: GridSpec,
               map_h: int, map_w: int):
    """ShapeDtypeStructs of the serve signature (names for manifest)."""
    if batch == "sym":
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch)
    specs, names = [], []
    if decode == "sample":
        specs.append(jax.ShapeDtypeStruct((), jnp.uint32))
        names.append("seed")
    specs.append(jax.ShapeDtypeStruct((b, grid.height, grid.width, 3),
                                      jnp.float32))
    names.append("images")
    if task in ("air", "coco"):
        specs.append(jax.ShapeDtypeStruct((b, map_h, map_w, 1),
                                          jnp.float32))
        names.append("attention_maps")
    if task == "coco":
        specs.append(jax.ShapeDtypeStruct((b,), jnp.int32))
        names.append("tasks")
    return specs, names


def export_bundle(out_dir: str, model, variables: dict, grid: GridSpec,
                  *, decode: str = "greedy", num_samples: int = 1,
                  stream: str = "good", batch: Any = 1,
                  platforms: Sequence[str] | None = None,
                  map_h: int = 30, map_w: int = 40) -> dict:
    """Export the serving path and write the bundle.  Returns the
    manifest dict.  ``batch`` is an int or "sym"; ``platforms`` is a
    list of lowering targets.  The default is ``["cpu", "tpu"]`` so the
    artifact is backend-portable out of the box: the serve path is pure
    XLA (no Pallas), so multi-platform lowering costs only bundle bytes,
    and a bundle exported on a TPU host then loads on a CPU serving box
    (and vice versa) without re-export."""
    assert decode in ("greedy", "sample"), decode
    serve = build_serve_fn(model, variables, grid, decode=decode,
                           num_samples=num_samples, stream=stream)
    specs, names = _arg_specs(model.task, decode, batch, grid,
                              map_h, map_w)
    if platforms is None:
        platforms = ("cpu", "tpu")
    exp = jax.export.export(jax.jit(serve),
                            platforms=list(platforms))(*specs)

    manifest = {
        "format": "scanpaths_tpu.serve/1",
        "task": model.task,
        "decode": decode,
        "num_samples": num_samples if decode == "sample" else 1,
        "stream": stream if model.task == "air" else None,
        "batch": "sym" if batch == "sym" else int(batch),
        "platforms": list(exp.platforms),
        # the compute dtype BAKED into the exported module — the
        # serving process can't change it, so record it for benches
        # and deployment inventories
        "model_dtype": np.dtype(model.dtype).name,
        "geometry": {"height": grid.height, "width": grid.width,
                     "map_height": map_h, "map_width": map_w,
                     "max_length": grid.max_length,
                     "min_length": grid.min_length},
        "inputs": [{"name": n,
                    "shape": [str(d) for d in s.shape],
                    "dtype": str(s.dtype)}
                   for n, s in zip(names, specs)],
        "outputs": ["fix", "fix_len", "action_probs"],
        "jax_version": jax.__version__,
        "calling_convention_version": exp.calling_convention_version,
    }
    os.makedirs(out_dir, exist_ok=True)
    blob = exp.serialize()
    tmp = join(out_dir, _BLOB + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, join(out_dir, _BLOB))
    with open(join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    manifest["bytes"] = len(blob)
    return manifest


def load_bundle(bundle_dir: str):
    """Load an exported bundle.  Returns ``(fn, manifest)`` where ``fn``
    is the jitted deserialized module — callable with the positional
    signature recorded in ``manifest["inputs"]``, no model code or
    checkpoint needed."""
    with open(join(bundle_dir, _BLOB), "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    with open(join(bundle_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    return jax.jit(exp.call), manifest
