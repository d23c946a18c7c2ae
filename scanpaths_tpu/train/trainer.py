"""Training driver: two-phase schedule (supervised -> SCST), validation
with the full host metric suite, checkpoint triad, run records,
TensorBoard-style scalars.

Mirrors the reference drivers' control flow
(reference OSIE/train.py:47-364, AiR/train.py:52-486,
COCO_Search18/train.py) with one codebase and three task plugins, and
with every hot path jitted on the device mesh:

* artifacts: hparams.json, log_train.txt, history_record.json,
  checkpoints/{checkpoint.msgpack, checkpoint_best.msgpack},
  <logdir>_supervised_save copy at epoch start_rl_epoch-1;
* scalar names match the reference TensorBoard tags;
* model selection = harmonic mean of ScanMatch metrics (AiR: over
  right+wrong answer groups — reference AiR/train.py:467-468).
"""

from __future__ import annotations

import datetime
import functools
import json
import os
import shutil
import sys
from os.path import join
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from ..core.grid import GridSpec
from ..data.datasets import (DataConfig, EvaluationDataset, Loader,
                             SupervisedDataset)
from ..data.prefetch import prefetch
from ..metrics import evaluation as heval
from ..models.scanpath_model import create_model
from ..ops.sampling import random_sample, to_fix_vectors
from ..utils.checkpointing import (make_checkpoint_manager,
                                   restore_best_checkpoint,
                                   restore_checkpoint)
from ..utils.logger import Logger, task_log_level
from ..utils.recording import RecordManager
from . import steps
from .mesh import (gather_spec, make_mesh, shard_batch,
                   state_sharding)
from .schedule import lr_multiplier, make_optimizer
from .steps import RLConfig, TrainState


class ScalarWriter:
    """TensorBoard SummaryWriter when available, JSONL always."""

    def __init__(self, log_dir: str):
        self.jsonl = open(join(log_dir, "scalars.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(log_dir=log_dir)
        except Exception as e:
            # say so ONCE instead of silently dropping the TB stream
            # (scalars.jsonl still records everything)
            print(f"[ScalarWriter] TensorBoard unavailable ({type(e).__name__}"
                  f": {e}); scalars go to scalars.jsonl only",
                  file=sys.stderr)

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self.jsonl.write(json.dumps({"tag": tag, "value": value,
                                     "step": int(step)}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)


def data_config(args) -> DataConfig:
    att_dir = args.att_dir if args.task == "air" else args.detector_dir
    return DataConfig(
        img_dir=args.img_dir, fix_dir=args.fix_dir, att_dir=att_dir,
        action_map=(args.map_height, args.map_width),
        resize=(args.height, args.width), max_length=args.max_length,
        blur_sigma=args.blur_sigma,
        detector_threshold=args.detector_threshold,
        coco_split=args.coco_split, cache_images=args.cache_images,
        packed_cache_dir=getattr(args, "packed_cache_dir", "") or None)


def grid_spec(args) -> GridSpec:
    return GridSpec(map_width=args.map_width, map_height=args.map_height,
                    width=args.width, height=args.height,
                    max_length=args.max_length, min_length=args.min_length)


def build_model(args, tp_shards: int = 1):
    """``tp_shards > 1`` builds the shard_map row-parallel variant
    (heavy decode kernels declared as contraction slices, cross-device
    BatchNorm over the data axis — train/tp_step.py); it can only run
    INSIDE a shard_map over a (data, model) mesh."""
    layers = tuple(int(x) for x in
                   str(getattr(args, "backbone_layers", "3,4,6,3"))
                   .split(","))
    tp_kw = {} if tp_shards <= 1 else dict(
        tp_axis="model", bn_axis="data", tp_shards=tp_shards)
    return create_model(
        args.task, seq_len=args.max_length, map_h=args.map_height,
        map_w=args.map_width, embed=getattr(args, "embed", 512),
        backbone_layers=layers,
        remat=getattr(args, "remat", False),
        stem_impl=getattr(args, "stem_impl", "conv"),
        dtype=jnp.bfloat16 if getattr(args, "half_precision", False)
        else jnp.float32, **tp_kw)


def eval_specs(ds, grid: GridSpec):
    """Static ScanMatch specs for the device validation sweep, table
    bounds derived from the split (never silently under-sized for
    the GT; sampled rollouts with a TempBin expansion beyond the
    w/-duration cap are prefix-truncated — durations are unbounded
    LogNormals, so no static bound can cover every sample — and the
    DeviceSweep overflow counter reports every truncation).

    The bin resolution is the FIXED evaluation protocol (16x12 bins
    over 320x240, reference AiR/train.py:216-218) — NOT the
    configured image geometry: the reference hard-codes it, the
    host suite mirrors that (evaluation.STIM_SHAPE), and the other
    device kernels (SED/STDE/MultiMatch) already do too, so a
    grid-derived spec would silently diverge from the host sweep
    the moment someone trains at a non-default resolution."""
    from ..metrics import jax_metrics as jm
    max_wd = int(np.ceil(max(ds.wd_symbols_needed, 256) / 64) * 64)
    spec_wd = jm.ScanMatchSpec(temp_bin=50.0, max_symbols=max_wd)
    spec_wod = jm.ScanMatchSpec(
        temp_bin=0.0,
        max_symbols=max(grid.max_length, ds.pad_gt_len))
    return spec_wd, spec_wod


def log_metric_tree(logger, metrics, stds):
    """Reference-format metric printout (``<group>-<metric>: m +- s``
    rows, reference OSIE/train.py:326-338), shared by the single-task
    trainer, the joint trainer, and the test CLI."""
    def walk(m, s, prefix):
        for k, v in m.items():
            if isinstance(v, dict):
                walk(v, s[k], prefix + [k])
            else:
                logger.info(f"{'-'.join(prefix):24}-{k:15}: {v:.4f} "
                            f"+- {s[k]:.4f}")
    walk(metrics, stds, [])


class EvalCore:
    """Shared decode/eval plumbing: jitted eval forward + batched
    sampler + host-metric logging.  ``Trainer`` adds the training stack
    on top; ``Evaluator`` (the test driver, reference test.py) uses it
    as-is so inference never constructs train loaders or an optimizer.
    """

    args: Any
    task: str
    grid: GridSpec
    model: Any
    mesh: Any
    state: TrainState
    logger: Any
    key: Any

    def _build_eval_jits(self):
        # replicated on a data-only mesh; row-parallel kernel sharding
        # when the mesh has a model axis (--model_parallel).  When the
        # Trainer pinned an at-rest state layout (self._state_sh —
        # e.g. the tp_impl=shardmap layout, which shards only the two
        # decode kernels), reuse it so eval never forces a resharding
        # copy of the training state.
        sh = getattr(self, "_state_sh", None)
        if sh is not None:
            p_sh, b_sh = sh.params, sh.batch_stats
        else:
            p_sh = state_sharding(self.mesh, self.state.params)
            b_sh = state_sharding(self.mesh, self.state.batch_stats)
        self._eval_forward = jax.jit(
            lambda params, bs, batch: steps._eval_forward(
                self.model, params, bs, batch),
            in_shardings=(p_sh, b_sh, None))
        self._sampler = jax.jit(
            lambda key, probs, mu, s2, n: jax.vmap(
                lambda k: random_sample(k, probs, mu, s2, self.grid))(
                jax.random.split(key, n)),
            static_argnums=(4,))

    def _device_batch(self, batch: dict, for_rl: bool,
                      global_batch: int | None = None) -> dict:
        keys_sup = ("images", "scanpaths", "durations", "action_masks",
                    "duration_masks", "attention_maps", "performances",
                    "tasks")
        keys_rl = ("images", "gt_fix", "gt_len", "gt_mask",
                   "attention_maps", "tasks", "gt_performance")
        keep = keys_rl if for_rl else keys_sup
        out = {}
        for k in keep:
            if k in batch:
                v = batch[k]
                if k == "performances" and isinstance(v, np.ndarray):
                    v = v.astype(np.float32)
                out[k] = np.asarray(v)
        if self.args.ablate_attention_info and "attention_maps" in out:
            out["attention_maps"] = out["attention_maps"] * 0
        return shard_batch(self.mesh, out, global_batch=global_batch)

    def decode_batch_device(self, batch, repeat_num: int,
                            stream: str | None = None,
                            global_batch: int | None = None):
        """Eval forward + ``repeat_num`` stochastic decodes; returns the
        device batch and the raw device SampleOut ([R, N, ...] leaves)
        — the ``--device_eval`` sweep consumes these without any host
        round-trip."""
        db = self._device_batch(batch, for_rl=True,
                                global_batch=global_batch)
        out = self._eval_forward(self.state.params, self.state.batch_stats,
                                 db)
        prefix = f"{stream}_" if stream else ""
        probs = out[f"{prefix}all_actions_prob"]
        mu = out[f"{prefix}log_normal_mu"]
        sigma2 = out[f"{prefix}log_normal_sigma2"]
        self.key, sub = jax.random.split(self.key)
        samples = self._sampler(sub, probs, mu, sigma2, repeat_num)
        return db, samples

    def decode_batch(self, batch, repeat_num: int,
                     stream: str | None = None,
                     global_batch: int | None = None):
        """Eval forward + ``repeat_num`` stochastic decodes; returns a
        list (repeat-major) of per-image fixation vectors."""
        _, samples = self.decode_batch_device(batch, repeat_num, stream,
                                              global_batch=global_batch)
        return to_fix_vectors(samples)  # repeat-major flat list [R*N]

    def _eval_specs(self, ds):
        return eval_specs(ds, self.grid)

    def validation_device(self, iteration: int):
        """The full nine-column validation sweep with every pairwise
        metric computed on device (metrics/device_eval.py) — replaces
        the reference's CPU metric loops on the hot path
        (OSIE/utils/evaluation.py:151-282).  Aggregation semantics are
        the host suite's own (shared _summarize/_bucketize)."""
        from ..metrics.device_eval import DeviceSweep
        args = self.args
        repeat = args.eval_repeat_num
        spec_wd, spec_wod = self._eval_specs(self.validation_loader.dataset)
        sweep = DeviceSweep(spec_wd, spec_wod)
        for batch in self.validation_loader:
            if self.task == "air":
                for stream, flag in (("good", True), ("poor", False)):
                    db, samples = self.decode_batch_device(
                        batch, repeat, stream,
                        global_batch=self.validation_loader.batch_size)
                    for r in range(repeat):
                        sweep.add_batch_air(
                            db["gt_fix"], db["gt_len"], db["gt_mask"],
                            samples.fix[r], samples.fix_len[r],
                            batch["performances"], flag)
            else:
                db, samples = self.decode_batch_device(
                    batch, repeat,
                    global_batch=self.validation_loader.batch_size)
                for r in range(repeat):
                    sweep.add_batch(db["gt_fix"], db["gt_len"],
                                    db["gt_mask"], samples.fix[r],
                                    samples.fix_len[r])
        cur_metrics, cur_std = sweep.result()
        self.logger.info(
            f"Evaluation metrics (device sweep) after iteration "
            f"{iteration}:")
        self._log_metric_tree(cur_metrics, cur_std, iteration)
        sweep.log_overflow(self.logger, self.writer, step=iteration)
        return cur_metrics

    def selection_metric(self, cur_metrics) -> float:
        if self.task == "air":
            vals = (list(cur_metrics["right_answer"]["ScanMatch"].values())
                    + list(cur_metrics["wrong_answer"]["ScanMatch"].values()))
        else:
            vals = list(cur_metrics["ScanMatch"].values())
        return float(scipy.stats.hmean(vals))

    def _log_metric_tree_quiet(self, metrics, stds):
        log_metric_tree(self.logger, metrics, stds)


class Evaluator(EvalCore):
    """Inference-only driver for ``cli/test.py``: model + eval split +
    checkpoint restore, NO train loaders and NO optimizer (the reference
    test drivers need only the eval split — AiR/test.py:60-104).

    If the run directory's ``hparams.json`` says the checkpoint was
    trained with ``--task joint``, the shared-trunk joint model is
    rebuilt and evaluated through the requested task's head."""

    def __init__(self, args, log_dir: str):
        self.args = args
        self.task = args.task
        self.grid = grid_spec(args)
        self.log_dir = log_dir
        self.checkpoints_dir = join(log_dir, "checkpoints")
        self.logger = Logger(join(log_dir, "log_test.txt"),
                             level=task_log_level(args.task))
        self.mesh = make_mesh(args.mesh_size,
                              getattr(args, "model_parallel", 1))

        trained_task = args.task
        hp_path = join(log_dir, "hparams.json")
        if os.path.exists(hp_path):
            with open(hp_path) as f:
                trained_task = json.load(f).get("task", args.task)

        n = max(args.batch // 4, 1)
        dummy = jnp.zeros((n, args.height, args.width, 3), jnp.float32)
        if trained_task == "joint":
            from ..models.scanpath_model import (JointScanpathModel,
                                                 TaskView)
            layers = tuple(int(x)
                           for x in str(args.backbone_layers).split(","))
            net = JointScanpathModel(
                seq_len=args.max_length, map_h=args.map_height,
                map_w=args.map_width, embed=args.embed,
                backbone_layers=layers,
                stem_impl=getattr(args, "stem_impl", "conv"),
                dtype=jnp.bfloat16 if args.half_precision
                else jnp.float32)
            att = jnp.zeros((n, args.map_height, args.map_width, 1),
                            jnp.float32)
            tids = jnp.zeros((n,), jnp.int32)
            variables = jax.jit(lambda k: net.init(
                k, dummy, att, tids, method="init_all"))(
                jax.random.PRNGKey(args.seed))
            self.model = TaskView(net, self.task)
            self.logger.info("Evaluating the %s head of a joint "
                             "checkpoint", self.task)
        else:
            self.model = build_model(args)
            kw = {}
            if self.task in ("air", "coco"):
                kw["attention_maps"] = jnp.zeros(
                    (n, args.map_height, args.map_width, 1), jnp.float32)
            if self.task == "coco":
                kw["task_ids"] = jnp.zeros((n,), jnp.int32)
            variables = jax.jit(
                lambda k: self.model.init(k, dummy, train=False, **kw)
            )(jax.random.PRNGKey(args.seed))
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=None, step=jnp.int32(0))
        self._build_eval_jits()
        self.key = jax.random.PRNGKey(args.seed)

    def load_best(self):
        """Restore the best checkpoint — backend auto-detected from the
        checkpoints dir (reference test.py loads checkpoint_best.pth,
        AiR/test.py:91-96)."""
        restored = restore_best_checkpoint(
            self.checkpoints_dir,
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats})
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"])


class Trainer(EvalCore):
    def __init__(self, args):
        self.args = args
        self.task = args.task
        self.grid = grid_spec(args)

        # ---------------- log dir & artifacts ----------------
        if args.resume_dir == "":
            date = str(datetime.datetime.now())
            date = date[:date.rfind(":")].replace("-", "") \
                .replace(":", "").replace(" ", "_")
            self.log_dir = join(args.log_root, "log_" + date)
        else:
            self.log_dir = args.resume_dir
        self.checkpoints_dir = join(self.log_dir, "checkpoints")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        if args.resume_dir == "":
            with open(join(self.log_dir, "hparams.json"), "w") as f:
                json.dump({k: v for k, v in vars(args).items()}, f, indent=2)
        self.logger = Logger(join(self.log_dir, "log_train.txt"),
                             level=task_log_level(args.task))
        self.logger.info("The args corresponding to training process are: ")
        for key, value in vars(args).items():
            self.logger.info(f"{key:20}: {value}")

        # ---------------- data ----------------
        cfg = data_config(args)
        self.train_loader = Loader(
            SupervisedDataset(self.task, cfg, split="train"),
            batch_size=args.batch, shuffle=True, seed=args.seed,
            drop_last=True)
        self.train_rl_loader = Loader(
            EvaluationDataset(self.task, cfg, split="train"),
            batch_size=max(args.batch // 4, 1), shuffle=True,
            seed=args.seed + 1, drop_last=True)
        self.validation_loader = Loader(
            EvaluationDataset(self.task, cfg, split="validation"),
            batch_size=args.batch, shuffle=False)

        # ---------------- model / optimizer / mesh ----------------
        self.model = build_model(args)
        self.mesh = make_mesh(args.mesh_size,
                              getattr(args, "model_parallel", 1))
        self.optimizer = make_optimizer(args, len(self.train_loader),
                                        len(self.train_rl_loader))
        self.lr_fn = functools.partial(
            lr_multiplier, steps_sup=len(self.train_loader),
            steps_rl=len(self.train_rl_loader),
            warmup_epoch=args.warmup_epoch,
            start_rl_epoch=args.start_rl_epoch, epochs=args.epoch,
            rl_lr_initial_decay=args.rl_lr_initial_decay)

        self.state = self._init_state()
        # static NW-table bounds derived from the training split so GT
        # symbol expansion NEVER silently truncates (ADVICE r1); sampled
        # rollouts that overflow are counted in reward_overflow_frac.
        rl_ds = self.train_rl_loader.dataset
        max_wd = int(np.ceil(max(rl_ds.wd_symbols_needed, 256) / 64) * 64)
        self.rl_cfg = RLConfig(task=self.task, grid=self.grid,
                               rl_sample_number=args.rl_sample_number,
                               max_symbols_wd=max_wd,
                               max_symbols_wod=rl_ds.pad_gt_len,
                               apply_cd=args.apply_consistency_divergence,
                               lambda_5=args.lambda_5)
        if rl_ds.wd_symbols_needed > 256:
            self.logger.info(
                "ScanMatch w/-duration NW tables sized to %d symbols "
                "(split needs %d)", max_wd, rl_ds.wd_symbols_needed)

        # jitted steps: batch sharded on the data axis (it arrives
        # pre-sharded via shard_batch); state replicated over the mesh,
        # or row-parallel kernel-sharded over the model axis under
        # --model_parallel.  Two TP implementations (--tp_impl):
        # 'gather' all-gathers params at step entry (ZeRO-3 style, the
        # default — see train/mesh.py for why), 'shardmap' computes
        # true row-parallel with hand-written collectives
        # (train/tp_step.py).  Both in- AND out-shardings are pinned so
        # the state's at-rest layout is identical every step (XLA
        # otherwise reshards unpinned outputs freely, which breaks the
        # pinned in_shardings on the next call).
        use_shardmap = (getattr(args, "tp_impl", "gather") == "shardmap"
                        and "model" in self.mesh.axis_names)
        if use_shardmap:
            from .tp_step import (make_tp_rl_step,
                                  make_tp_supervised_step,
                                  tp_state_sharding)
            tp_model = build_model(args, tp_shards=args.model_parallel)
            self._state_sh = tp_state_sharding(self.mesh, self.state)
            self.state = jax.device_put(self.state, self._state_sh)
            self._sup_step, _ = make_tp_supervised_step(
                tp_model, self.optimizer, self.mesh, self.state,
                lambda_1=args.lambda_1)
            self._rl_step = make_tp_rl_step(
                tp_model, self.optimizer, self.mesh, self.state,
                self.rl_cfg)
            self.logger.info(
                "tensor parallel: shard_map row-parallel steps over a "
                "%dx%d (data x model) mesh", self.mesh.shape["data"],
                self.mesh.shape["model"])
        else:
            self._state_sh = state_sharding(self.mesh, self.state)
            gather = gather_spec(self.mesh, self.state.params)
            self.state = jax.device_put(self.state, self._state_sh)
            self._sup_step = jax.jit(
                functools.partial(steps.supervised_step, self.model,
                                  self.optimizer, lambda_1=args.lambda_1,
                                  params_gather=gather),
                donate_argnums=(0,), in_shardings=(self._state_sh, None),
                out_shardings=(self._state_sh, None))
            self._rl_step = jax.jit(
                functools.partial(steps.rl_step, self.model,
                                  self.optimizer,
                                  cfg=self.rl_cfg, params_gather=gather),
                donate_argnums=(0,),
                in_shardings=(self._state_sh, None, None),
                out_shardings=(self._state_sh, None))
        self._build_eval_jits()

        # ---------------- bookkeeping ----------------
        self.writer = ScalarWriter(self.log_dir)
        self.record_manager = RecordManager(self.log_dir)
        if args.resume_dir == "":
            self.record_manager.init_record()
        else:
            self.record_manager.load()
        self.checkpoint_manager = make_checkpoint_manager(
            self.checkpoints_dir, mode="max",
            best_metric=self.record_manager.get_best_metric(),
            backend=getattr(args, "ckpt_backend", "msgpack"))
        if args.resume_dir != "":
            restored = restore_checkpoint(
                self.checkpoints_dir,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
                self.state.opt_state)
            self.state = jax.device_put(
                self.state.replace(
                    params=restored["model"]["params"],
                    batch_stats=restored["model"]["batch_stats"],
                    opt_state=restored["optimizer"]),
                self._state_sh)

        self.key = jax.random.PRNGKey(args.seed)
        self._profiling = False

    # ------------------------------------------------------------------
    def _init_state(self) -> TrainState:
        args = self.args
        n = max(args.batch // 4, 1)
        dummy = jnp.zeros((n, args.height, args.width, 3), jnp.float32)
        kw = {}
        if self.task in ("air", "coco"):
            kw["attention_maps"] = jnp.zeros(
                (n, args.map_height, args.map_width, 1), jnp.float32)
        if self.task == "coco":
            kw["task_ids"] = jnp.zeros((n,), jnp.int32)
        variables = jax.jit(
            lambda k: self.model.init(k, dummy, train=False, **kw)
        )(jax.random.PRNGKey(args.seed))
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        if args.checkpoint:
            params, batch_stats = self._load_backbone(params, batch_stats)
        opt_state = self.optimizer.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.int32(0))

    def _load_backbone(self, params, batch_stats):
        """Warm-start the ResNet-50 trunk from a torch state dict.

        Acquisition: the file the reference auto-downloads
        (AiR/models/resnet.py:179) is
        https://download.pytorch.org/models/resnet50-19c8e357.pth —
        fetch it once and pass ``--checkpoint``; integrity is checked
        against the sha256 prefix embedded in the filename."""
        import torch

        from ..models.resnet import load_torch_state_dict, \
            verify_torchvision_sha
        if not verify_torchvision_sha(self.args.checkpoint):
            raise ValueError(
                f"{self.args.checkpoint}: content does not match the "
                "sha256 prefix in its filename — corrupted download?")
        sd = torch.load(self.args.checkpoint, map_location="cpu")
        bp, bs = load_torch_state_dict(
            {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")})
        params = dict(params)
        batch_stats = dict(batch_stats)
        params["backbone"] = bp
        batch_stats["backbone"] = bs
        self.logger.info("Loaded pretrained backbone from %s",
                         self.args.checkpoint)
        return params, batch_stats

    # ------------------------------------------------------------------
    def _maybe_profile(self, iteration: int):
        """Opt-in jax.profiler trace of a few steady-state steps
        (SURVEY §5 tracing/profiling rebuild note)."""
        pdir = getattr(self.args, "profile_dir", "")
        if not pdir:
            return
        if iteration == 3 and not self._profiling:
            jax.profiler.start_trace(pdir)
            self._profiling = True
            self.logger.info("jax.profiler trace started -> %s", pdir)
        elif iteration >= 8 and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            self.logger.info("jax.profiler trace stopped")

    def train_epoch(self, iteration: int, epoch: int) -> int:
        args = self.args
        import time as _time
        t0 = _time.perf_counter()
        t_first = None  # reset after step 1 so compile time is excluded
        n_steps0 = iteration
        depth = getattr(args, "prefetch", 2)
        if epoch < args.start_rl_epoch:
            for db in prefetch(self.train_loader,
                               lambda b: self._device_batch(
                                   b, for_rl=False,
                                   global_batch=self.train_loader.batch_size),
                               depth=depth):
                self.state, metrics = self._sup_step(self.state, db)
                iteration += 1
                self._maybe_profile(iteration)
                self.writer.add_scalar("loss/loss", metrics["loss"],
                                       iteration)
                self.writer.add_scalar("loss/loss_actions",
                                       metrics["loss_actions"], iteration)
                self.writer.add_scalar("loss/loss_duration",
                                       metrics["loss_duration"], iteration)
                self.writer.add_scalar(
                    "learning_rate",
                    args.lr * float(self.lr_fn(iteration)), iteration)
                if t_first is None:
                    t_first = _time.perf_counter()
            images_per_step = args.batch
        else:
            for db in prefetch(self.train_rl_loader,
                               lambda b: self._device_batch(
                                   b, for_rl=True,
                                   global_batch=self.train_rl_loader.batch_size),
                               depth=depth):
                self.key, sub = jax.random.split(self.key)
                self.state, metrics = self._rl_step(self.state, db, sub)
                iteration += 1
                self._maybe_profile(iteration)
                for tag, val in metrics.items():
                    self.writer.add_scalar(tag, val, iteration)
                self.writer.add_scalar(
                    "learning_rate",
                    args.lr * float(self.lr_fn(iteration)), iteration)
                if t_first is None:
                    t_first = _time.perf_counter()
            images_per_step = max(args.batch // 4, 1)
        jax.block_until_ready(self.state.step)
        t_end = _time.perf_counter()
        dt = t_end - t0
        n = iteration - n_steps0
        # steady-state rate excludes the first (compiling) step when
        # more than one step ran
        if n > 1 and t_first is not None and t_end > t_first:
            rate = (n - 1) / (t_end - t_first)
        elif n > 0 and dt > 0:
            rate = n / dt
        else:
            rate = 0.0
        if rate > 0:
            self.writer.add_scalar("perf/steps_per_sec", rate, iteration)
            self.writer.add_scalar("perf/images_per_sec",
                                   rate * images_per_step, iteration)
            self.logger.info(
                f"epoch {epoch}: {n} steps in {dt:.1f}s "
                f"({rate:.2f} steps/s steady, "
                f"{rate * images_per_step:.1f} images/s)")
        return iteration

    # ------------------------------------------------------------------
    def validation(self, iteration: int):
        args = self.args
        repeat = args.eval_repeat_num
        all_gt, all_pred = [], []
        all_perf, all_alloc = [], []
        for batch in self.validation_loader:
            n = len(batch["fix_vectors"])
            if self.task == "air":
                for stream, flag in (("good", True), ("poor", False)):
                    preds = self.decode_batch(
                        batch, repeat, stream,
                        global_batch=self.validation_loader.batch_size)
                    for r in range(repeat):
                        all_gt.extend(batch["fix_vectors"])
                        all_perf.extend(batch["performances"])
                        all_alloc.extend([flag] * n)
                        all_pred.extend(preds[r * n:(r + 1) * n])
            else:
                preds = self.decode_batch(
                    batch, repeat,
                    global_batch=self.validation_loader.batch_size)
                for r in range(repeat):
                    all_gt.extend(batch["fix_vectors"])
                    all_pred.extend(preds[r * n:(r + 1) * n])

        if self.task == "air":
            cur_metrics, cur_std, _ = heval.evaluation_performance_related(
                all_gt, all_pred, all_perf, all_alloc)
        else:
            cur_metrics, cur_std, _ = heval.evaluation(all_gt, all_pred)

        self.logger.info(f"Evaluation metrics after iteration {iteration}:")
        self._log_metric_tree(cur_metrics, cur_std, iteration)
        return cur_metrics

    def _log_metric_tree(self, metrics, stds, iteration):
        def walk(m, s, prefix):
            for k, v in m.items():
                if isinstance(v, dict):
                    walk(v, s[k], prefix + [k])
                else:
                    tag = "metrics/" + "-".join(prefix + [k])
                    self.writer.add_scalar(tag, v, iteration)
                    self.logger.info(
                        f"{'-'.join(prefix):24}-{k:15}: {v:.4f} "
                        f"+- {s[k]:.4f}")
        walk(metrics, stds, [])

    # ------------------------------------------------------------------
    def human_baseline(self):
        if getattr(self.args, "device_eval", False):
            # O(images x subjects^2) pairwise rows on device kernels
            # instead of the reference's host metric loops
            from ..metrics.device_eval import human_evaluation_device
            spec_wd, spec_wod = self._eval_specs(
                self.validation_loader.dataset)
            metrics, stds, _ = human_evaluation_device(
                self.validation_loader, spec_wd, spec_wod, task=self.task)
        else:
            metrics, stds, _ = heval.human_evaluation(self.validation_loader,
                                                      task=self.task)
        self.logger.info("The metrics for human performance are: ")
        self._log_metric_tree_quiet(metrics, stds)
        return metrics

    # ------------------------------------------------------------------
    def fit(self):
        args = self.args
        start_epoch = self.record_manager.get_epoch()
        iteration = self.record_manager.get_iteration()

        if args.resume_dir == "":
            self.human_baseline()

        for epoch in range(start_epoch + 1, args.epoch):
            iteration = self.train_epoch(iteration, epoch)
            cur_metrics = (self.validation_device(iteration)
                           if args.device_eval
                           else self.validation(iteration))
            cur_metric = self.selection_metric(cur_metrics)
            self.writer.add_scalar("current metric", cur_metric, iteration)
            self.logger.info(f"{'current metric':10}: {cur_metric:.4f}")

            model_state = {"params": self.state.params,
                           "batch_stats": self.state.batch_stats}
            self.checkpoint_manager.step(cur_metric, model_state,
                                         self.state.opt_state)
            self.record_manager.save(
                epoch, iteration, self.checkpoint_manager.get_best_metric())

            if args.supervised_save and epoch == args.start_rl_epoch - 1:
                # async (orbax) writes must land before the dir copy
                self.checkpoint_manager.wait()
                dst = self.log_dir.rstrip("/") + "_supervised_save"
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                shutil.copytree(self.log_dir, dst)
        self.checkpoint_manager.close()
        return self.checkpoint_manager.get_best_metric()
