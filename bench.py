"""Flagship benchmark: scanpath generation throughput on the OSIE model
(full 240x320 geometry, T=16, 10 stochastic scanpaths per image —
the reference evaluation setting, eval_repeat_num=10).

Prints ONE JSON line:
  {"metric": "scanpaths_per_sec_per_chip", "value": N,
   "unit": "scanpaths/s/chip", "vs_baseline": N / 2500, ...}

Baseline: the north-star target (BASELINE.md) is >2000 images/s at
>=8 samples/image on a v5e-8, i.e. 250 images/s/chip x 10 samples =
2500 scanpaths/s/chip.  (Note: the model is ~1 TFLOP/image, so that
target exceeds v5e peak; ``mfu`` in the output is the honest scale.)

Honesty guarantees (round-1 reported a physically impossible number):
* every timed iteration computes a DEVICE-SIDE scalar checksum that
  depends on every sampled fixation, and that scalar is materialized
  on the HOST (``float(np.asarray(...))``) INSIDE the timed window —
  the clock cannot stop until the device has really executed every
  dispatched batch (on this tunneled backend ``block_until_ready`` is
  advisory; only host materialization is a true barrier, and syncing
  a scalar avoids billing the tunnel's ~MB/s transfer bandwidth as if
  it were device time).  Dispatch is pipelined (all iterations
  enqueued, then all scalars drained) as a real serving loop would;
* the accumulated checksum is printed so the work cannot be dead-code-
  eliminated, and the final iteration's full fixation tensor is pulled
  to the host after the clock stops and shape/sanity-checked;
* model FLOPs are computed analytically from the architecture and the
  implied MFU is printed; any result above 100% of peak raises instead
  of printing a bogus JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

# The host image pre-imports jax from sitecustomize (TPU plugin
# registration), so the env var above is read too late; set the config
# directly so repeat runs skip the multi-minute XLA compile.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BATCH = int(os.environ.get("BENCH_BATCH", "512"))  # 1024 OOMs 16G HBM
SAMPLES = 10
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")

# Peak dense-matmul throughput per chip, by platform (FLOP/s).
PEAK_FLOPS = {
    "tpu v5e": {"bfloat16": 197e12, "float32": 197e12 / 4},
    "tpu v5 lite": {"bfloat16": 197e12, "float32": 197e12 / 4},
    "cpu": {"bfloat16": 1e11, "float32": 1e11},
}


def conv_flops(hw: int, k: int, cin: int, cout: int) -> float:
    """2 * MACs for a kxk conv producing `hw` output pixels."""
    return 2.0 * k * k * cin * cout * hw


def model_flops_parts(h: int = 240, w: int = 320, t: int = 16,
                      embed: int = 512, fuse_head: bool = True) -> dict:
    """Analytic forward-FLOP decomposition of the OSIE model (convs
    only; the Dense attention terms are <1% and ignored).  Mirrors
    scanpaths_tpu/models/{resnet,components,scanpath_model}.py.

    Parts line up with the remat boundaries the model actually has
    (scanpath_model.ScanpathModel.remat):

    * ``stem``       — the 7x7 input conv (never checkpointed; its dX
                       is also never needed — images carry no grads);
    * ``blocks``     — every bottleneck conv (what remat="backbone"
                       recomputes);
    * ``hoisted``    — sal_conv + xgates, once per forward;
    * ``step_gates`` — the per-step 3x3 embed->4*embed h-gate conv
                       (what the "lstm_gates" checkpoint policy SAVES);
    * ``step_other`` — the per-step factorized signal gates + head
                       (what remat="scan_policy" recomputes).

    ``fuse_head=True`` (the model default) accounts the composed
    conditioner+head evaluation (components.fuse_cond_head): the
    per-step 5x5 512->512 conditioner + 512->1 head convs become one
    5x5 512->2 conv + an 11x11-stride-5 512->1 conv + border strips.
    The once-per-forward kernel-composition cost is excluded (it is
    amortized over the batch, <0.01% — exclusion only *understates*
    reported MFU)."""
    # --- dilated ResNet-50 stem ---
    h2, w2 = h // 2, w // 2                       # conv1 stride 2
    stem = conv_flops(h2 * w2, 7, 3, 64)
    hp = -(-(h2 - 3) // 2) + 1                    # ceil maxpool
    wp = -(-(w2 - 3) // 2) + 1
    # --- stages: (planes, stride, blocks); stride sits on block 0 ---
    blocks_total = 0.0
    cin = 64
    cur_h, cur_w = hp, wp
    for planes, stride, blocks in ((64, 1, 3), (128, 1, 4),
                                   (256, 2, 6), (512, 1, 3)):
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            out_h, out_w = cur_h // s, cur_w // s
            hw = out_h * out_w
            blocks_total += conv_flops(hw, 1, cin, planes)         # conv1
            blocks_total += conv_flops(hw, 3, planes, planes)      # conv2
            blocks_total += conv_flops(hw, 1, planes, planes * 4)  # conv3
            if bi == 0:
                blocks_total += conv_flops(hw, 1, cin, planes * 4)
            cin = planes * 4
            cur_h, cur_w = out_h, out_w
    fh, fw = cur_h, cur_w                          # 30 x 40 feature grid
    fhw = fh * fw
    # --- decoder, hoisted convs (once) ---
    hoisted = (conv_flops(fhw, 3, 2048, embed)       # sal_conv
               + conv_flops(fhw, 3, embed, 4 * embed))  # xgates
    # --- decoder, per step ---
    # gates_s0 runs FACTORIZED over the rank-1 signal (SignalGates):
    # kernel (x) semantic contraction + scalar-map correlation instead
    # of a dense 3x3 conv over the materialized outer product
    gates_s = (2.0 * 9 * embed * 3 * embed          # kp = K (x) cv
               + 2.0 * fhw * 9 * 3 * embed)         # patches @ kp
    h5, w5 = fh // 5, fw // 5
    if fuse_head:
        head = (conv_flops(fhw, 5, embed, 2)            # k_sa (stop+amap)
                + 2.0 * 11 * 11 * embed * h5 * w5       # keff drt main
                + 2.0 * 2 * 11 * embed * w5             # crow strip
                + 2.0 * 11 * 2 * embed * h5             # ccol strip
                + 2.0 * h5 * w5 * 2 * h5 * w5)          # drt_layer_2
    else:
        head = (conv_flops(fhw, 5, embed, embed)        # conditioner
                + conv_flops(fhw, 1, embed, 2)          # head 1x1s
                + conv_flops(h5 * w5, 7, embed, 1))     # drt
    step_gates = conv_flops(fhw, 3, embed, 4 * embed)
    return {"stem": stem, "blocks": blocks_total, "hoisted": hoisted,
            "step_gates": step_gates, "step_other": gates_s + head, "t": t}


def model_flops_per_image(h: int = 240, w: int = 320, t: int = 16,
                          embed: int = 512, fuse_head: bool = True) -> float:
    """Analytic forward FLOPs of the OSIE model (see model_flops_parts)."""
    p = model_flops_parts(h, w, t, embed, fuse_head)
    return (p["stem"] + p["blocks"] + p["hoisted"]
            + p["t"] * (p["step_gates"] + p["step_other"]))


def train_flops_per_image(remat_mode: str = "none", **kw) -> float:
    """Analytic fwd+bwd FLOPs of one TRAINING step per image, by remat
    mode — replaces the crude ``3 x fwd`` heuristic (round-4 verdict):

    * backward of a conv is two convs of the same cost (dX and dW), so
      bwd = 2 x fwd MINUS the stem's dX (images carry no gradients);
    * each remat mode re-runs exactly the region it checkpoints during
      the backward pass, so its recompute FLOPs are that region's
      forward cost (model_flops_parts maps regions to modes).
    """
    p = model_flops_parts(**kw)
    scan = p["t"] * (p["step_gates"] + p["step_other"])
    fwd = p["stem"] + p["blocks"] + p["hoisted"] + scan
    bwd = 2.0 * fwd - p["stem"]
    recompute = {
        "none": 0.0,
        "backbone": p["blocks"],
        "scan": scan,
        "scan_policy": p["t"] * p["step_other"],
        "policy": p["blocks"] + p["t"] * p["step_other"],
        "all": p["blocks"] + scan,
    }[remat_mode]
    return fwd + bwd + recompute


def calibrate_duration_head(variables, median_s: float = 0.25,
                            sigma2: float = 0.3):
    """Return ``variables`` with the duration head calibrated to emit
    realistic fixation durations, the way a supervised-trained model
    does.  At random init the drt_layer_2 output reaches ~11, so
    ``sigma2 = exp(t)`` ~ 5e4 and the LogNormal samples overflow to
    inf — which NaNs REINFORCE terms (bench_train rl) and blows the
    ScanMatch TempBin expansion past any static table bound
    (eval_sweep overflow_frac ~1 in BENCH_r04).  Scaling the kernel to
    ~0 and pinning the bias to [log(median_s), log(sigma2)] gives
    durations ~ LogNormal(log median_s, sigma2^2) — median ``median_s``
    seconds (the quirk duration = exp(randn * sigma2 + mu), ops/
    sampling.py) — with every shape, parameter, and timed op identical.
    Real validation runs decode from a trained checkpoint whose head
    sits in exactly this regime (reference OSIE two-phase schedule)."""
    import flax
    import numpy as np

    flat = flax.traverse_util.flatten_dict(variables["params"])
    out = {}
    for k, v in flat.items():
        if "drt_layer_2" in k:
            if k[-1] == "kernel":
                v = v * 0.0
            elif k[-1] == "bias":
                v = jnp.asarray(
                    np.log([median_s, sigma2]), dtype=v.dtype)
        out[k] = v
    return dict(variables,
                params=flax.traverse_util.unflatten_dict(out))


def peak_flops(dtype: str) -> float:
    kind = jax.devices()[0].device_kind.lower()
    plat = jax.devices()[0].platform
    for key, tbl in PEAK_FLOPS.items():
        if key in kind:
            return tbl[dtype]
    if plat == "cpu":
        return PEAK_FLOPS["cpu"][dtype]
    return 197e12 if dtype == "bfloat16" else 49e12  # assume a v5e-class chip


def eval_sweep_section(model, variables, grid):
    """Decode + FULL device metric sweep per image: forward, SAMPLES
    stochastic decodes, and all 9 reference ``pairs_eval`` columns
    (ScanMatch w/o+w/ duration, 5 MultiMatch similarities, SED, STDE —
    reference OSIE/utils/evaluation.py:284-340) against 15 GT subjects,
    in ONE jitted program with no host round-trip.  This is the
    eval/validation hot loop the reference runs as CPU Python
    (OSIE/train.py:234, utils/evaluation.py:284-340), measured at full
    geometry with the same honesty protocol as the headline (per-batch
    host-materialized checksums inside the timed window)."""
    from scanpaths_tpu.metrics import jax_metrics as jm
    from scanpaths_tpu.ops.sampling import random_sample
    from scanpaths_tpu.train.steps import RLConfig, _pair_grids

    batch = int(os.environ.get("BENCH_EVAL_BATCH", "128"))
    subjects, glen = 15, 16
    cfg = RLConfig(task="osie", grid=grid, rl_sample_number=SAMPLES,
                   max_symbols_wd=320, max_symbols_wod=24)

    images = jax.jit(lambda k: jax.random.normal(
        k, (batch, 240, 320, 3), jnp.float32))(jax.random.PRNGKey(43))

    @jax.jit
    def make_gt(key):
        ks = jax.random.split(key, 4)
        x = jax.random.uniform(ks[0], (batch, subjects, glen), jnp.float32,
                               0.0, grid.width)
        y = jax.random.uniform(ks[1], (batch, subjects, glen), jnp.float32,
                               0.0, grid.height)
        t = jax.random.uniform(ks[2], (batch, subjects, glen), jnp.float32,
                               0.1, 0.5)
        fix = jnp.stack([x, y, t], axis=-1)
        lens = jax.random.randint(ks[3], (batch, subjects), 3, glen + 1)
        return fix, lens.astype(jnp.int32), jnp.ones(
            (batch, subjects), jnp.float32)

    gt_fix, gt_len, gt_mask = make_gt(jax.random.PRNGKey(44))

    @jax.jit
    def eval_step(variables, images, key):
        out = model.apply(variables, images, train=False)
        keys = jax.random.split(key, SAMPLES)
        samples = jax.vmap(lambda k: random_sample(
            k, out["all_actions_prob"], out["log_normal_mu"],
            out["log_normal_sigma2"], grid))(keys)
        grids = _pair_grids(cfg, gt_fix, gt_len, gt_mask,
                            samples.fix, samples.fix_len, full=True)
        overflow = jm.expansion_overflow(
            cfg.spec_wd, samples.fix.reshape(-1, *samples.fix.shape[2:]),
            samples.fix_len.reshape(-1)).astype(jnp.float32).mean()
        # checksum touches every column of every (rollout, image,
        # subject) pair so none of the 9 metric kernels can be DCE'd
        nansum = lambda x: jnp.where(  # noqa: E731
            jnp.isnan(x), 0.0, x).sum()
        chk = (nansum(grids["wod"]) + nansum(grids["wd"])
               + nansum(grids["mm"]) + nansum(grids["sed"])
               + nansum(grids["stde"]))
        return chk, overflow

    key = jax.random.PRNGKey(2)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        chk, ovf = eval_step(variables, images, sub)
    float(np.asarray(chk))

    iters = max(ITERS // 2, 3)
    chks = []
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        chk, ovf = eval_step(variables, images, sub)
        chks.append(chk)
    checksum = sum(float(np.asarray(c, np.float64)) for c in chks)
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    pairs_per_sec = images_per_sec * SAMPLES * subjects
    return {
        "images_per_sec": round(images_per_sec, 2),
        "scanpaths_per_sec_per_chip": round(
            images_per_sec * SAMPLES / max(jax.device_count(), 1), 2),
        "metric_pairs_per_sec": round(pairs_per_sec, 2),
        "batch": batch, "rollouts": SAMPLES, "subjects": subjects,
        "columns": 9,
        "overflow_frac": round(float(np.asarray(ovf)), 4),
        "checksum": round(checksum, 2),
    }


def main():
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.models.scanpath_model import create_model
    from scanpaths_tpu.ops.sampling import random_sample, sample_checksum

    from scanpaths_tpu.ops import pallas_cell

    n_chips = max(jax.device_count(), 1)
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    # SP_CELL_IMPL=pallas opts into the fused Pallas decode step
    # (no-grad decode only; same math as the XLA cell up to
    # reassociation — tests/test_pallas_cell.py).  Measured on one v5e
    # chip the fused kernel is currently ~8% SLOWER per decode-scan
    # step than the XLA formulation (82.7 vs 76.6 ms at batch 512 —
    # docs/PERF.md), so the default stays "xla" until it wins.
    cell_impl = os.environ.get("SP_CELL_IMPL", "xla")
    if cell_impl == "pallas" and not (DTYPE == "bfloat16"
                                      and pallas_cell.available()):
        cell_impl = "xla"
    # SP_BACKBONE_IMPL=pallas opts into the fused whole-stage backbone
    # (ops/pallas_block.py: layers 1-3's uniform bottleneck blocks as
    # VMEM-resident Pallas kernels with BN folded).  Measured IN the
    # full program it is ~11 ms/step slower than the XLA backbone
    # (kernels 114.6 vs XLA 103.5 ms for the fused stages — the
    # isolated 1.2-1.7x stage wins do not survive integration; see
    # docs/PERF.md), so the default stays "xla".
    # SP_BACKBONE_IMPL=folded runs the all-plain folded-BN inference
    # backbone (fused_backbone_apply(use_kernels=False)): BN folded
    # into the conv weights, exact eval algebra, no Pallas — measured
    # slightly faster than the flax module (248.9 vs 252.5 ms at batch
    # 512; docs/PERF.md).
    from scanpaths_tpu.models.resnet import fused_backbone_apply
    from scanpaths_tpu.ops import pallas_block
    backbone_impl = os.environ.get("SP_BACKBONE_IMPL", "xla")
    if backbone_impl == "pallas" and not (DTYPE == "bfloat16"
                                          and pallas_block.available()):
        backbone_impl = "xla"
    # SP_STEM_IMPL=s2d opts into the exact space-to-depth stem
    # (models/resnet.py::s2d_stem_conv — same checkpoint, 12-wide MXU
    # contraction instead of 3 on the pixel input).
    stem_impl = os.environ.get("SP_STEM_IMPL", "conv")
    model = create_model("osie", dtype=dtype, cell_impl=cell_impl,
                         stem_impl=stem_impl)
    grid = GridSpec()
    # generate the input batch ON DEVICE: materializing 472MB on the
    # host and pushing it through the ~MB/s tunnel costs minutes of
    # (untimed) wall clock for identically-distributed pixels
    images = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, 240, 320, 3), jnp.float32))(jax.random.PRNGKey(42))
    variables = jax.jit(lambda k: model.init(k, images, train=False))(
        jax.random.PRNGKey(0))
    # calibrate the duration head to the trained-model regime so the
    # eval-sweep's TempBin expansion matches a real validation run
    # (r4 verdict item 4: overflow_frac 0.9992 at random init); the
    # headline decode timing is duration-magnitude-independent
    variables = calibrate_duration_head(variables)

    @jax.jit
    def step(variables, images, key):
        feats = None
        if backbone_impl in ("pallas", "folded"):
            feats = fused_backbone_apply(
                {"params": variables["params"]["backbone"],
                 "batch_stats": variables["batch_stats"]["backbone"]},
                images, dtype=dtype,
                use_kernels=backbone_impl == "pallas")
        out = model.apply(variables, images, train=False, features=feats)
        keys = jax.random.split(key, SAMPLES)
        samples = jax.vmap(lambda k: random_sample(
            k, out["all_actions_prob"], out["log_normal_mu"],
            out["log_normal_sigma2"], grid))(keys)
        return samples.fix, samples.fix_len, sample_checksum(samples)

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        fix, fl, chk = step(variables, images, sub)
    np.asarray(fix)

    checksum = 0.0
    t0 = time.perf_counter()
    chks = []
    last = None
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        fix, fl, chk = step(variables, images, sub)
        # keep only the scalar checksum per iteration (plus the final
        # iteration's full tensors) — holding every iteration's fix
        # buffers alive would cost ~100MB of HBM headroom at BATCH=512
        chks.append(chk)
        last = (fix, fl)
    for chk in chks:
        # host materialization of EVERY iteration's device checksum
        # INSIDE the timed window: a true execution barrier per batch
        checksum += float(np.asarray(chk, dtype=np.float64))
    dt = time.perf_counter() - t0

    # post-clock sanity: the last iteration's full tensors really hold
    # SAMPLES x BATCH scanpaths of plausible shape
    fix, fl = last
    fix_h, fl_h = np.asarray(fix), np.asarray(fl)
    assert fix_h.shape == (SAMPLES, BATCH, 16, 3), fix_h.shape
    assert fl_h.min() >= 0 and fl_h.max() <= 16

    images_per_sec = BATCH * ITERS / dt
    scanpaths = BATCH * SAMPLES * ITERS
    per_sec_per_chip = scanpaths / dt / n_chips

    flops = model_flops_per_image()
    mfu = images_per_sec / n_chips * flops / peak_flops(DTYPE)
    if mfu > 1.0:
        print(json.dumps({
            "error": "implausible measurement",
            "mfu": round(mfu, 3),
            "images_per_sec": round(images_per_sec, 2),
            "flops_per_image": flops,
        }), file=sys.stderr)
        raise RuntimeError(
            f"measured {mfu:.1%} MFU (> 100% of peak) — timing is broken, "
            f"refusing to report")

    record = {
        "metric": "scanpaths_per_sec_per_chip",
        "value": round(per_sec_per_chip, 2),
        "unit": "scanpaths/s/chip",
        "vs_baseline": round(per_sec_per_chip / 2500.0, 4),
        "images_per_sec": round(images_per_sec, 2),
        "mfu": round(mfu, 4),
        "flops_per_image": flops,
        "dtype": DTYPE,
        "batch": BATCH,
        "cell_impl": cell_impl,
        "backbone_impl": backbone_impl,
        "stem_impl": stem_impl,
        "n_chips": n_chips,
        "checksum": round(checksum, 2),
    }
    # end-to-end EVAL benchmark (decode + full 9-column device metric
    # sweep vs 15 subjects, one jitted program): the no-host-round-trip
    # claim measured at full geometry.  Nested in the same single JSON
    # line the driver records.  BENCH_EVAL=0 skips it.
    if os.environ.get("BENCH_EVAL", "1") != "0":
        record["eval_sweep"] = eval_sweep_section(model, variables, grid)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
