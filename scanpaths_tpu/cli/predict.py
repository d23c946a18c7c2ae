"""Serving entry point: predict scanpaths for arbitrary image files
from a trained run directory.

The reference has no standalone inference path — its test drivers
require a full dataset split on disk (reference AiR/test.py:60-104).
This CLI serves any images (BASELINE.json config 1: deterministic
greedy decode of a single image on CPU; also batched stochastic
sampling on TPU):

    python -m scanpaths_tpu.cli.predict --task osie \
        --evaluation_dir assets/log_... \
        --predict_images img1.jpg,img2.jpg [--decode sample \
        --num_samples 10] [--predict_out scanpaths.json]

Conditioning inputs: AiR/COCO checkpoints take an optional machine-
attention map per image (``--predict_att`` .npy files; zeros when
omitted, the ``--ablate_attention_info`` regime); COCO additionally
takes the search-target category name(s) via ``--target_category``.

Output records use the reference prediction schema
(AiR/test.py:153-191): X/Y in pixel coordinates of the model grid
geometry (default 320x240), T in milliseconds, one record per
(image, sample).
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

from ..core.config import parse_opt


def _expand_images(spec: str) -> list[str]:
    if os.path.isdir(spec):
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        return sorted(
            os.path.join(spec, f) for f in os.listdir(spec)
            if f.lower().endswith(exts))
    return [p for p in spec.split(",") if p]


def _records(img_names, samples, trial0: int = 0):
    """SampleOut with leading [R, N] -> reference-schema records."""
    fix = np.asarray(samples.fix)
    lens = np.asarray(samples.fix_len)
    recs = []
    for r in range(fix.shape[0]):
        for i, name in enumerate(img_names):
            l = int(lens[r, i])
            recs.append({
                "name": name,
                "repeat_id": trial0 + r + 1,
                "X": [float(v) for v in fix[r, i, :l, 0]],
                "Y": [float(v) for v in fix[r, i, :l, 1]],
                "T": [float(v * 1000) for v in fix[r, i, :l, 2]],
                "length": l,
            })
    return recs


def _main_bundle(args, paths):
    """Serve from an exported AOT bundle (serve/export.py): no model
    code, no checkpoint restore — ``jax.export.deserialize`` + call.
    Decode mode, sample count, and geometry come from the manifest."""
    import types

    import jax

    from ..data.datasets import COCO_OBJECT_NAMES
    from ..data.transforms import load_image, resize_map
    from ..serve.export import load_bundle

    fn, mf = load_bundle(args.bundle)
    assert mf["task"] == args.task, (
        f"bundle was exported for task {mf['task']!r}, got --task "
        f"{args.task!r}")
    geo = mf["geometry"]
    h, w = geo["height"], geo["width"]
    mh, mw = geo["map_height"], geo["map_width"]
    decode, num_samples = mf["decode"], mf["num_samples"]

    # decode mode and sample count are BAKED into the bundle; warn when
    # the CLI asks for something else (mirrors the live path's
    # ignored-flag warnings, predict.py live branch below)
    if args.decode and args.decode != decode:
        print(f"[predict] warning: --decode {args.decode} is ignored; "
              f"the bundle was exported with decode={decode!r}",
              file=sys.stderr)
    if args.num_samples and args.num_samples != num_samples:
        print(f"[predict] warning: --num_samples {args.num_samples} is "
              f"ignored; the bundle was exported with "
              f"num_samples={num_samples}", file=sys.stderr)

    att_paths = [p for p in args.predict_att.split(",") if p]
    if att_paths and args.task == "osie":
        print("[predict] warning: --predict_att is ignored for an osie "
              "bundle (the osie model takes no attention input)",
              file=sys.stderr)
        att_paths = []
    if att_paths:
        assert len(att_paths) == len(paths), (
            f"{len(att_paths)} attention maps for {len(paths)} images")
    if args.task == "coco":
        cats = [c for c in args.target_category.split(",") if c]
        assert cats, "--target_category required for a coco bundle"
        if len(cats) == 1:
            cats = cats * len(paths)
        assert len(cats) == len(paths), (
            f"{len(cats)} target categories for {len(paths)} images")
        task_ids = np.asarray([COCO_OBJECT_NAMES.index(c) for c in cats],
                              np.int32)

    # symbolic-batch bundles accept any chunk size, but serving the
    # whole list as ONE call would stack every image on the host and
    # device at once — chunk by --batch; fixed-batch bundles get tail
    # chunks padded to the baked batch size
    bs = max(args.batch, 1) if mf["batch"] == "sym" else int(mf["batch"])
    key = jax.random.PRNGKey(args.seed)
    records = []
    for lo in range(0, len(paths), bs):
        chunk = paths[lo:lo + bs]
        n_real = len(chunk)
        pad = 0 if mf["batch"] == "sym" else bs - n_real
        images = np.stack(
            [load_image(p, h, w) for p in chunk]
            + [np.zeros((h, w, 3), np.float32)] * pad)
        feed = []
        if decode == "sample":
            key, sub = jax.random.split(key)
            feed.append(np.uint32(jax.random.randint(
                sub, (), 0, np.iinfo(np.int32).max)))
        feed.append(images)
        if args.task in ("air", "coco"):
            amaps = np.zeros((len(images), mh, mw), np.float32)
            for i, ap in enumerate(att_paths[lo:lo + bs]):
                m = np.load(ap).astype(np.float32)
                m = resize_map(m, (mh, mw))
                amaps[i] = m / max(float(m.max()), 1e-12)
            feed.append(amaps[..., None])
        if args.task == "coco":
            tids = np.zeros((len(images),), np.int32)
            tids[:n_real] = task_ids[lo:lo + n_real]
            feed.append(tids)
        out = fn(*feed)
        fix, fl = np.asarray(out["fix"]), np.asarray(out["fix_len"])
        if decode == "greedy":            # add the [R] axis
            fix, fl = fix[None], fl[None]
        samples = types.SimpleNamespace(fix=fix[:, :n_real],
                                        fix_len=fl[:, :n_real])
        names = [os.path.basename(p) for p in chunk]
        records.extend(_records(names, samples))
    return records


def main(argv=None):
    args = parse_opt(argv)
    assert args.task != "joint", (
        "serve a joint checkpoint one task at a time: pass --task "
        "osie|air|coco with --evaluation_dir pointing at the joint run "
        "(the Evaluator detects the joint checkpoint from hparams.json)")
    paths = _expand_images(args.predict_images)
    assert paths, "--predict_images gave no image files"
    if args.bundle:
        records = _main_bundle(args, paths)
        payload = json.dumps(records, indent=2)
        if args.predict_out:
            with open(args.predict_out, "w") as f:
                f.write(payload)
        else:
            sys.stdout.write(payload + "\n")
        return records
    assert args.evaluation_dir, (
        "--evaluation_dir (trained run dir) or --bundle required")

    import jax

    from ..data.datasets import COCO_OBJECT_NAMES
    from ..data.transforms import load_image, resize_map
    from ..ops.sampling import greedy_sample
    from ..train.trainer import Evaluator

    evaluator = Evaluator(args, args.evaluation_dir)
    evaluator.load_best()
    evaluator.key = jax.random.PRNGKey(args.seed)

    att_paths = [p for p in args.predict_att.split(",") if p]
    if att_paths and args.task == "osie":
        print("[predict] warning: --predict_att is ignored for an osie "
              "checkpoint (the osie model takes no attention input)",
              file=sys.stderr)
        att_paths = []
    if args.decode == "greedy" and args.num_samples and args.num_samples > 1:
        print(f"[predict] warning: --num_samples {args.num_samples} is "
              "ignored under --decode greedy (deterministic, one scanpath "
              "per image); use --decode sample for stochastic rollouts",
              file=sys.stderr)
    if att_paths:
        assert len(att_paths) == len(paths), (
            f"{len(att_paths)} attention maps for {len(paths)} images")
    cats = [c for c in args.target_category.split(",") if c]
    if args.task == "coco":
        assert cats, "--target_category required for a coco checkpoint"
        if len(cats) == 1:
            cats = cats * len(paths)
        assert len(cats) == len(paths)
        task_ids = np.asarray([COCO_OBJECT_NAMES.index(c) for c in cats],
                              np.int32)

    greedy_jit = jax.jit(functools.partial(greedy_sample,
                                           grid=evaluator.grid))

    mh, mw = args.map_height, args.map_width
    records = []
    bs = max(args.batch, 1)
    for lo in range(0, len(paths), bs):
        chunk = paths[lo:lo + bs]
        # pad the tail chunk to the full batch so the jitted forward
        # compiles for ONE shape
        n_real = len(chunk)
        pad = bs - n_real
        images = np.stack(
            [load_image(p, args.height, args.width) for p in chunk]
            + [np.zeros((args.height, args.width, 3), np.float32)] * pad)
        batch = {"images": images}
        if args.task in ("air", "coco"):
            amaps = np.zeros((bs, mh, mw), np.float32)
            for i, ap in enumerate(att_paths[lo:lo + bs]):
                m = np.load(ap).astype(np.float32)
                m = resize_map(m, (mh, mw))
                amaps[i] = m / max(float(m.max()), 1e-12)
            batch["attention_maps"] = amaps[..., None]
        if args.task == "coco":
            tids = np.zeros((bs,), np.int32)
            tids[:n_real] = task_ids[lo:lo + n_real]
            batch["tasks"] = tids

        db = evaluator._device_batch(batch, for_rl=True)
        out = evaluator._eval_forward(evaluator.state.params,
                                      evaluator.state.batch_stats, db)
        # an AiR checkpoint serves its correct-answer stream
        prefix = "good_" if args.task == "air" else ""
        probs = out[f"{prefix}all_actions_prob"]
        mu = out[f"{prefix}log_normal_mu"]
        sigma2 = out[f"{prefix}log_normal_sigma2"]

        names = [os.path.basename(p) for p in chunk]
        if args.decode == "greedy":
            samples = jax.tree.map(lambda x: x[None],
                                   greedy_jit(probs, mu, sigma2))
        else:
            evaluator.key, sub = jax.random.split(evaluator.key)
            # 0 = "the evaluation setting": eval_repeat_num per image
            n_samples = args.num_samples or args.eval_repeat_num
            samples = evaluator._sampler(sub, probs, mu, sigma2, n_samples)
        records.extend(_records(names, jax.tree.map(
            lambda x: x[:, :n_real], samples)))

    payload = json.dumps(records, indent=2)
    if args.predict_out:
        with open(args.predict_out, "w") as f:
            f.write(payload)
    else:
        sys.stdout.write(payload + "\n")
    return records


if __name__ == "__main__":
    main()
