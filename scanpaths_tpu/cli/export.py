"""Export a trained run to a self-contained AOT serving bundle.

    python -m scanpaths_tpu.cli.export --task osie \
        --evaluation_dir assets/log_... --export_dir bundle/ \
        [--decode sample --num_samples 10] [--export_batch 8|sym] \
        [--export_platforms tpu,cpu]

The bundle (serve.jaxexport + manifest.json) embeds the trained
weights as constants and runs on a serving host with nothing but jax:

    fn, manifest = scanpaths_tpu.serve.load_bundle("bundle/")
    out = fn(images)              # osie greedy; see manifest["inputs"]

The reference has no deployment artifact at all — serving it means
shipping the repo plus the .pth checkpoint (reference AiR/test.py:60-104).
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.config import parse_opt


def main(argv=None):
    args = parse_opt(argv)
    assert args.task != "joint", (
        "export a joint checkpoint one task head at a time: pass "
        "--task osie|air|coco with --evaluation_dir at the joint run")
    assert args.evaluation_dir, "--evaluation_dir (trained run dir) required"
    assert args.export_dir, "--export_dir required"

    import jax

    from ..serve.export import export_bundle, load_bundle
    from ..train.trainer import Evaluator

    evaluator = Evaluator(args, args.evaluation_dir)
    evaluator.load_best()
    variables = {"params": evaluator.state.params,
                 "batch_stats": evaluator.state.batch_stats}
    platforms = [p for p in args.export_platforms.split(",") if p] or None
    num_samples = args.num_samples or args.eval_repeat_num
    batch = args.export_batch if args.export_batch == "sym" \
        else int(args.export_batch)

    manifest = export_bundle(
        args.export_dir, evaluator.model, variables, evaluator.grid,
        decode=args.decode, num_samples=num_samples, batch=batch,
        platforms=platforms, map_h=args.map_height, map_w=args.map_width)
    print(f"[export] wrote {args.export_dir}: {manifest['bytes']} bytes, "
          f"platforms={manifest['platforms']}, "
          f"inputs={[i['name'] for i in manifest['inputs']]}",
          file=sys.stderr)

    if args.export_check:
        fn, mf = load_bundle(args.export_dir)
        b = 2 if batch == "sym" else int(batch)
        rng = np.random.default_rng(0)
        feed = []
        if args.decode == "sample":
            feed.append(np.uint32(7))
        feed.append(rng.normal(size=(b, args.height, args.width, 3))
                    .astype(np.float32))
        if args.task in ("air", "coco"):
            feed.append(rng.uniform(size=(b, args.map_height,
                                          args.map_width, 1))
                        .astype(np.float32))
        if args.task == "coco":
            feed.append(np.zeros((b,), np.int32))
        got = fn(*feed)
        from ..serve.export import build_serve_fn
        want = jax.jit(build_serve_fn(
            evaluator.model, variables, evaluator.grid,
            decode=args.decode, num_samples=num_samples))(*feed)
        err = max(float(np.max(np.abs(np.asarray(got[k], np.float64)
                                      - np.asarray(want[k], np.float64))))
                  for k in ("fix", "fix_len", "action_probs"))
        assert err == 0.0, f"bundle disagrees with the live model: {err}"
        print(f"[export] check ok: bundle == live model (batch {b})",
              file=sys.stderr)
    return manifest


if __name__ == "__main__":
    main()
