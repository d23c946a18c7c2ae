"""Test/inference entry point (reference AiR/test.py, OSIE/test.py,
COCO_Search18/test.py): load checkpoint_best, print the human baseline,
sample eval_repeat_num scanpaths per image (x2 streams for AiR), dump
the prediction JSON, run the full metric suite.

Inference-only: builds an ``Evaluator`` (model + eval split + best
checkpoint) — no train loaders and no optimizer, matching the reference
test drivers which touch only the eval split (AiR/test.py:60-104).

COCO evaluates its validation split and writes
``validation_predicts.json`` (no public test split — reference
COCO_Search18/test.py:67-68); the others write ``test_predicts.json``.
"""

from __future__ import annotations

import json
from os.path import join

import numpy as np

from ..core.config import parse_opt
from ..ops.sampling import to_fix_vectors


def dump_record(img_name, fix_vector, trial, extra):
    rec = {"img_names" if extra else "name": img_name}
    rec.update(extra or {})
    arr = np.array(fix_vector.tolist()).reshape(-1, 3)
    rec["repeat_id"] = trial + 1
    rec["X"] = list(map(float, arr[:, 0]))
    rec["Y"] = list(map(float, arr[:, 1]))
    rec["T"] = list(map(float, arr[:, 2] * 1000))
    rec["length"] = len(rec["X"])
    return rec


def main(argv=None):
    args = parse_opt(argv)
    assert args.task != "joint", (
        "evaluate a joint run one task at a time: point "
        "--evaluation_dir at the joint log dir and pass --task "
        "osie|air|coco — the Evaluator detects the joint checkpoint "
        "from the run's hparams.json and loads the matching head")
    np.random.seed(args.seed)
    from ..data.datasets import EvaluationDataset, Loader
    from ..metrics import evaluation as heval
    from ..train.trainer import Evaluator, data_config

    log_dir = args.evaluation_dir or args.resume_dir
    assert log_dir, "--evaluation_dir (the training log dir) is required"
    evaluator = Evaluator(args, log_dir)
    evaluator.load_best()

    split = "validation" if args.task == "coco" else "test"
    loader = Loader(EvaluationDataset(args.task, data_config(args),
                                      split=split),
                    batch_size=args.batch, shuffle=False)

    repeat = args.eval_repeat_num
    device_eval = bool(getattr(args, "device_eval", False))
    sweep = None
    if device_eval:
        from ..metrics.device_eval import (DeviceSweep,
                                           human_evaluation_device)
        spec_wd, spec_wod = evaluator._eval_specs(loader.dataset)
        sweep = DeviceSweep(spec_wd, spec_wod)
        human_metrics, human_std, _ = human_evaluation_device(
            loader, spec_wd, spec_wod, task=args.task)
    else:
        human_metrics, human_std, _ = heval.human_evaluation(loader,
                                                             task=args.task)
    evaluator.logger.info("The metrics for human performance are: ")
    evaluator._log_metric_tree_quiet(human_metrics, human_std)
    all_gt, all_pred, all_perf, all_alloc = [], [], [], []
    predict_results = []
    for batch in loader:
        n = len(batch["fix_vectors"])
        streams = (("good", True), ("poor", False)) if args.task == "air" \
            else ((None, None),)
        for stream, flag in streams:
            db, samples = evaluator.decode_batch_device(
                batch, repeat, stream, global_batch=loader.batch_size)
            preds = to_fix_vectors(samples)
            for r in range(repeat):
                if sweep is not None:
                    # pairwise metrics stay on device; the host only
                    # aggregates (metrics/device_eval.py)
                    if args.task == "air":
                        sweep.add_batch_air(
                            db["gt_fix"], db["gt_len"], db["gt_mask"],
                            samples.fix[r], samples.fix_len[r],
                            batch["performances"], flag)
                    else:
                        sweep.add_batch(db["gt_fix"], db["gt_len"],
                                        db["gt_mask"], samples.fix[r],
                                        samples.fix_len[r])
                else:
                    all_gt.extend(batch["fix_vectors"])
                    if args.task == "air":
                        all_perf.extend(batch["performances"])
                        all_alloc.extend([flag] * n)
                    all_pred.extend(preds[r * n:(r + 1) * n])
                for i in range(n):
                    extra = {}
                    if args.task == "air":
                        extra = {"qid": batch["question_ids"][i],
                                 "performance": flag}
                    elif args.task == "coco":
                        extra = {"task": batch["task_names"][i]}
                    predict_results.append(dump_record(
                        batch["img_names"][i], preds[r * n + i], r,
                        extra if args.task != "osie" else None))

    if sweep is not None:
        cur_metrics, cur_std = sweep.result()
        sweep.log_overflow(evaluator.logger)
    elif args.task == "air":
        cur_metrics, cur_std, _ = heval.evaluation_performance_related(
            all_gt, all_pred, all_perf, all_alloc)
    else:
        cur_metrics, cur_std, _ = heval.evaluation(all_gt, all_pred)

    name = ("validation_predicts.json" if args.task == "coco"
            else "test_predicts.json")
    with open(join(log_dir, name), "w") as f:
        json.dump(predict_results, f, indent=2)

    evaluator.logger.info("The metrics for best model performance are: ")
    evaluator._log_metric_tree_quiet(cur_metrics, cur_std)
    return cur_metrics


if __name__ == "__main__":
    main()
