"""Tuned full-geometry TRAINING throughput benchmark (the reference's
actual cost center: its supervised + SCST train loops, reference
OSIE/train.py:198-281, AiR/train.py:173-372).

Sweeps the supervised step over (batch, remat) and the RL/SCST step
over batch at the full OSIE geometry (240x320, T=16, 30x40 grid) in
bfloat16, each config in a FRESH process (configs contaminate each
other's HBM/cache state when sharing a device), and reports the best
as the headline training number.

Honesty protocol (same as bench.py):
* the state threads through every timed step, so step i cannot start
  before step i-1's update lands — the chain is real training;
* every timed iteration's loss scalar is materialized on the HOST
  inside the timed window (on the tunneled backend only host
  materialization is a true barrier); the accumulated checksum is
  printed so the work cannot be dead-code-eliminated;
* inputs are generated on device (pushing ~100MB batches through the
  ~MB/s tunnel would bill transfer stalls as compute);
* MFU is ANALYTIC per remat mode (bench.train_flops_per_image):
  fwd + bwd (2x fwd minus the stem's unneeded dX) + the recompute
  FLOPs of exactly the region the mode checkpoints.

Usage:
    python tools/bench_train.py                 # full sweep + headline
    python tools/bench_train.py sup <batch> <remat mode|0|1>
    python tools/bench_train.py rl <batch>
    python tools/bench_train.py fwd <batch> [remat mode]
    python tools/bench_train.py mem <batch> <remat mode>
    python tools/bench_train.py pipeline <batch>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_bench_cache")

ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "8"))
WARMUP = 2
# (batch, remat mode) — modes per models/scanpath_model.py: "none",
# "backbone", "scan", "scan_policy", "policy", "all".  The r4-verdict
# campaign grid: the useful remat modes at batch 32, the memory-
# limited modes at 64/96/128 (batch-64 "none" is kept to RECORD the
# OOM).  "scan" is excluded: it is dominated by "scan_policy" (same
# memory class, strictly more recompute) and its grad program hung
# the remote compiler >28 min at batch 32 (2026-08-21); "all" was
# measured in r3 (61.9 img/s at batch 64, 45% MFU) and is dominated
# by "policy" by construction.
SUP_SWEEP = ((32, "none"), (32, "backbone"),
             (32, "scan_policy"), (32, "policy"),
             (64, "none"), (64, "backbone"),
             (64, "scan_policy"), (64, "policy"),
             (96, "scan_policy"), (96, "policy"),
             (128, "policy"))
RL_SWEEP = (4, 8, 16, 32)


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s \
        or "out of memory" in s


def _remat_arg(s: str):
    """CLI remat arg: historical 0/1 or a mode name."""
    if s in ("0", "1"):
        return bool(int(s))
    return s


def _setup(batch: int, remat):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import types

    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.train import steps
    from scanpaths_tpu.train.schedule import make_optimizer

    model = create_model("osie", dtype=jnp.bfloat16, remat=remat)
    args = types.SimpleNamespace(lr=1e-4, clip=12.5, weight_decay=5e-4,
                                 warmup_epoch=1, start_rl_epoch=5, epoch=10,
                                 rl_lr_initial_decay=0.5,
                                 bf16_moments=bool(int(os.environ.get(
                                     "BENCH_BF16_MOMENTS", "0"))))
    optimizer = make_optimizer(args, steps_sup=100, steps_rl=100)

    # device-generated inputs (see module docstring)
    images = jax.jit(lambda k: jax.random.normal(
        k, (batch, 240, 320, 3), jnp.float32))(jax.random.PRNGKey(42))
    variables = jax.jit(lambda k: model.init(k, images, train=False))(
        jax.random.PRNGKey(0))
    # calibrate the duration head like a trained model's (shared with
    # the driver bench — bench.calibrate_duration_head): realistic
    # LogNormal durations instead of the random-init sigma2 ~ 5e4 that
    # NaNs REINFORCE terms and overflows the ScanMatch TempBin tables
    import bench
    variables = bench.calibrate_duration_head(variables)
    state = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]), step=jnp.int32(0))
    return jax, jnp, steps, model, optimizer, state, images


def bench_sup(batch: int, remat):
    import numpy as np
    jax, jnp, steps, model, optimizer, state, images = _setup(batch, remat)

    b = _sup_batch(jax, jnp, images, batch)
    # donate the state like the Trainer does (trainer.py jit region):
    # the old params/moments alias the new ones instead of doubling
    step = jax.jit(lambda s, bb: steps.supervised_step(
        model, optimizer, s, bb, lambda_1=1.0), donate_argnums=(0,))

    for _ in range(WARMUP):
        state, m = step(state, b)
    float(np.asarray(m["loss"]))

    losses = []
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, b)
        losses.append(m["loss"])
    checksum = sum(float(np.asarray(l, np.float64)) for l in losses)
    dt = (time.perf_counter() - t0) / ITERS

    import bench
    train_flops = bench.train_flops_per_image(model.remat_mode)
    imgs = batch / dt
    print(json.dumps({
        "metric": "train_supervised_images_per_sec", "value": round(imgs, 2),
        "batch": batch, "remat": model.remat_mode, "dtype": "bfloat16",
        "step_ms": round(dt * 1e3, 2),
        "train_flops_per_image": train_flops,
        "mfu": round(imgs * train_flops / bench.peak_flops("bfloat16"), 4),
        "bf16_moments": bool(int(os.environ.get("BENCH_BF16_MOMENTS", "0"))),
        "checksum": round(checksum, 4)}))


def _sup_batch(jax, jnp, images, batch):
    a = 30 * 40 + 1

    @jax.jit
    def make_batch(key):
        ks = jax.random.split(key, 3)
        idx = jax.random.randint(ks[0], (batch, 16), 0, a)
        scan = jax.nn.one_hot(idx, a, dtype=jnp.float32)
        dur = jax.random.uniform(ks[1], (batch, 16), jnp.float32, 0.1, 0.6)
        return {"images": images, "scanpaths": scan, "durations": dur,
                "action_masks": jnp.ones((batch, 16), jnp.float32),
                "duration_masks": jnp.ones((batch, 16), jnp.float32)}

    return make_batch(jax.random.PRNGKey(7))


def bench_fwd(batch: int, remat="none"):
    """Forward+loss ONLY (no grad, no update) at the training batch —
    the fwd leg of the fwd+bwd roofline split (docs/PERF.md).  Conv
    backward is 2x forward FLOPs (dX + dW), so against a remat="none"
    training row ``step_ms - fwd_ms`` vs ``2 * fwd_ms`` localizes
    whether the training gap lives in the forward or the backward
    pass.  Pass the training row's remat mode to compare against
    remat rows: the forward program is unchanged by remat (checkpoint
    only changes what backward saves), but passing it keeps the model
    construction — and therefore the compiled forward — identical to
    that row's."""
    import numpy as np
    jax, jnp, steps, model, optimizer, state, images = _setup(batch, remat)
    from scanpaths_tpu.train import losses

    b = _sup_batch(jax, jnp, images, batch)

    @jax.jit
    def fwd(params, batch_stats, bb):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            bb["images"], train=True, mutable=["batch_stats"])
        la = losses.cross_entropy_loss(
            out["actions"], bb["scanpaths"], bb["action_masks"])
        ld = losses.mlp_log_normal_distribution(
            out["log_normal_mu"], out["log_normal_sigma2"],
            bb["durations"], bb["duration_masks"])
        return la + ld

    for _ in range(WARMUP):
        loss = fwd(state.params, state.batch_stats, b)
    float(np.asarray(loss))

    vals = []
    t0 = time.perf_counter()
    for _ in range(ITERS):
        vals.append(fwd(state.params, state.batch_stats, b))
    checksum = sum(float(np.asarray(v, np.float64)) for v in vals)
    dt = (time.perf_counter() - t0) / ITERS

    import bench
    fwd_flops = bench.model_flops_per_image()
    imgs = batch / dt
    print(json.dumps({
        "metric": "train_forward_only_images_per_sec",
        "value": round(imgs, 2), "batch": batch,
        "remat": model.remat_mode, "dtype": "bfloat16",
        "fwd_ms": round(dt * 1e3, 2),
        "fwd_mfu": round(imgs * fwd_flops / bench.peak_flops("bfloat16"), 4),
        "checksum": round(checksum, 4)}))


def mem_probe(batch: int, remat):
    """Compile-only HBM probe of the supervised step: XLA's own
    memory_analysis for (batch, remat-mode), no execution — maps the
    activation-memory landscape exactly (docs/PERF.md round-4 training
    campaign) without burning a timed run per point."""
    jax, jnp, steps, model, optimizer, state, images = _setup(batch, remat)
    b = _sup_batch(jax, jnp, images, batch)
    try:
        compiled = jax.jit(
            lambda s, bb: steps.supervised_step(model, optimizer, s, bb,
                                                lambda_1=1.0),
            donate_argnums=(0,)).lower(state, b).compile()
    except Exception as e:  # noqa: BLE001 — compile-time OOM is data
        if not _is_oom(e):
            raise
        import re
        m = re.search(r"Used ([0-9.]+)G of ([0-9.]+)G", str(e))
        print(json.dumps({
            "metric": "train_supervised_hbm", "batch": batch,
            "remat": model.remat_mode, "oom": True,
            "needed_gib": float(m.group(1)) if m else None,
            "capacity_gib": float(m.group(2)) if m else None}))
        return
    ma = compiled.memory_analysis()
    gib = 1 << 30
    print(json.dumps({
        "metric": "train_supervised_hbm", "batch": batch,
        "remat": model.remat_mode,
        "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        "arg_gib": round(ma.argument_size_in_bytes / gib, 3),
        "out_gib": round(ma.output_size_in_bytes / gib, 3),
        "alias_gib": round(ma.alias_size_in_bytes / gib, 3),
        "total_gib": round((ma.temp_size_in_bytes
                            + ma.argument_size_in_bytes
                            + ma.output_size_in_bytes
                            - ma.alias_size_in_bytes) / gib, 3)}))


def bench_rl(batch: int):
    import numpy as np
    jax, jnp, steps, model, optimizer, state, images = _setup(batch, False)
    from scanpaths_tpu.core.grid import GridSpec

    smax, glen, r = 15, 24, 5
    grid = GridSpec()
    cfg = steps.RLConfig(task="osie", grid=grid, rl_sample_number=r,
                         max_symbols_wd=320, max_symbols_wod=glen)

    rng = np.random.default_rng(0)
    gt_fix = np.zeros((batch, smax, glen, 3), np.float32)
    gt_fix[..., 0] = rng.uniform(0, 320, (batch, smax, glen))
    gt_fix[..., 1] = rng.uniform(0, 240, (batch, smax, glen))
    gt_fix[..., 2] = rng.uniform(0.1, 0.5, (batch, smax, glen))
    b = {"images": images, "gt_fix": jnp.asarray(gt_fix),
         "gt_len": jnp.full((batch, smax), glen, jnp.int32),
         "gt_mask": jnp.ones((batch, smax), jnp.float32)}

    step = jax.jit(lambda s, bb, k: steps.rl_step(
        model, optimizer, s, bb, k, cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    for i in range(WARMUP):
        state, m = step(state, b, jax.random.fold_in(key, i))
    float(np.asarray(m["rl_loss"]))

    vals = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, b, jax.random.fold_in(key, 100 + i))
        vals.append(m["rl_loss"])
    # every loss is still materialized on the host INSIDE the timed
    # window (the execution barrier); the checksum is nan-aware because
    # a RANDOM-INIT model legitimately rolls out <3-fixation paths
    # whose MultiMatch NaN voids every subject of a sample (reference
    # semantics) — real RL starts from a supervised checkpoint and
    # stays finite, but the FLOPs and timing here are identical
    host_vals = [float(np.asarray(v, np.float64)) for v in vals]
    finite = [v for v in host_vals if v == v]
    dt = (time.perf_counter() - t0) / ITERS

    print(json.dumps({
        "metric": "train_rl_images_per_sec",
        "value": round(batch / dt, 2), "batch": batch, "rollouts": r,
        "subjects": smax, "dtype": "bfloat16",
        "step_ms": round(dt * 1e3, 2),
        "checksum": round(sum(finite), 4),
        "nan_loss_frac": round(1 - len(finite) / len(host_vals), 3)}))


def bench_pipeline(batch: int):
    """Input-pipeline statement: native packed-cache assembly rate at
    the headline batch, to compare against the consumed rate."""
    import tempfile

    from scanpaths_tpu import native
    from scanpaths_tpu.data.datasets import (DataConfig, Loader,
                                             SupervisedDataset)
    import tools.make_synth_data as msd

    root = "/tmp/sp_synth_bench"
    if not os.path.exists(os.path.join(root, "osie")):
        msd.make_all(root, seed=0, n_images=24)
    os.environ["SP_NATIVE"] = "1"
    with tempfile.TemporaryDirectory() as td:
        cfg = DataConfig(
            img_dir=os.path.join(root, "osie", "stimuli"),
            fix_dir=os.path.join(root, "osie", "fixations"),
            att_dir=None, action_map=(30, 40), resize=(240, 320),
            max_length=16, cache_images=False, packed_cache_dir=td)
        ds = SupervisedDataset("osie", cfg, split="train")
        loader = Loader(ds, batch_size=batch, shuffle=True)
        for b in loader:       # warm epoch fills the packed cache
            pass
        n, t0 = 0, time.perf_counter()
        for _ in range(4):
            for b in loader:
                n += len(b["images"])
        dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_input_pipeline_images_per_sec",
        "value": round(n / dt, 2), "batch": batch,
        "native": native.available()}))


def _run_one(args: list[str], env: dict | None = None) -> dict | None:
    """Run one config in a fresh process; parse its last JSON line."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, **(env or {})})
    except subprocess.TimeoutExpired:
        # a hung remote compile must cost ONE config, not the sweep
        print(json.dumps({"config": args, "error": "timeout_1800s"}))
        return None
    sys.stderr.write(proc.stderr[-1500:] if proc.returncode else "")
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            print(line)
            return rec
        except json.JSONDecodeError:
            continue
    if proc.returncode != 0:
        tail = (proc.stderr or "")[-400:]
        oom = "RESOURCE_EXHAUSTED" in (proc.stderr or "")
        print(json.dumps({"config": args, "error": "oom" if oom else "fail",
                          "tail": tail if not oom else None}))
    return None


def sweep():
    sup = [r for (bsz, rm) in SUP_SWEEP
           if (r := _run_one(["sup", str(bsz), str(rm)]))]
    sup = [r for r in sup if not r.get("oom")] or sup
    best_sup = max(sup, key=lambda r: r["value"], default=None)
    # bf16-Adam-moment leg: the top-2 (batch, remat) configs re-run
    # with half-precision moments (schedule.make_optimizer
    # bf16_moments) — the campaign's third axis
    bf16 = []
    for r in sorted(sup, key=lambda r: -r["value"])[:2]:
        rec = _run_one(["sup", str(r["batch"]), str(r["remat"])],
                       env={"BENCH_BF16_MOMENTS": "1"})
        if rec and not rec.get("oom"):
            rec["bf16_moments"] = True
            bf16.append(rec)
    best_bf16 = max(bf16, key=lambda r: r["value"], default=None)
    # fwd leg at the winning batch for the fwd-vs-bwd roofline split
    fwd = best_sup and _run_one(["fwd", str(best_sup["batch"]),
                                 str(best_sup["remat"])])
    rl = [r for bsz in RL_SWEEP if (r := _run_one(["rl", str(bsz)]))]
    best_rl = max(rl, key=lambda r: r["value"], default=None)
    pipe = None
    if best_sup:
        pipe = _run_one(["pipeline", str(best_sup["batch"])])
    headline = {
        "metric": "train_throughput_headline",
        "supervised_images_per_sec": best_sup and best_sup["value"],
        "supervised_batch": best_sup and best_sup["batch"],
        "supervised_remat": best_sup and best_sup["remat"],
        "supervised_mfu": best_sup and best_sup.get("mfu"),
        "supervised_bf16_moments_images_per_sec":
            best_bf16 and best_bf16["value"],
        "forward_only_ms": fwd and fwd.get("fwd_ms"),
        "rl_images_per_sec": best_rl and best_rl["value"],
        "rl_batch": best_rl and best_rl["batch"],
        "input_pipeline_images_per_sec": pipe and pipe["value"],
        "input_pipeline_saturates": bool(
            pipe and best_sup and pipe["value"] >= best_sup["value"]),
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    if len(sys.argv) == 1:
        sweep()
    elif sys.argv[1] == "sup":
        try:
            bench_sup(int(sys.argv[2]), _remat_arg(sys.argv[3]))
        except Exception as e:          # noqa: BLE001 — report OOM as data
            if _is_oom(e):
                print(json.dumps({"metric": "train_supervised_images_per_sec",
                                  "batch": int(sys.argv[2]),
                                  "remat": sys.argv[3],
                                  "value": 0.0, "oom": True}))
            else:
                raise
        else:
            pass
    elif sys.argv[1] == "rl":
        try:
            bench_rl(int(sys.argv[2]))
        except Exception as e:          # noqa: BLE001
            if _is_oom(e):
                print(json.dumps({"metric": "train_rl_images_per_sec",
                                  "batch": int(sys.argv[2]),
                                  "value": 0.0, "oom": True}))
            else:
                raise
    elif sys.argv[1] == "fwd":
        bench_fwd(int(sys.argv[2]),
                  _remat_arg(sys.argv[3]) if len(sys.argv) > 3 else "none")
    elif sys.argv[1] == "pipeline":
        bench_pipeline(int(sys.argv[2]))
    elif sys.argv[1] == "mem":
        mem_probe(int(sys.argv[2]), _remat_arg(sys.argv[3]))
    else:
        raise SystemExit(f"unknown section {sys.argv[1]!r}")
