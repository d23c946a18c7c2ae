"""Joint multi-task training: one shared-trunk model over all three
task datasets, data-parallel over the mesh (BASELINE.json config 5).

The reference cannot do this — its AiR/OSIE/COCO directories are
independent clones trained separately — so this driver is a new
capability of the rebuild, built from the same parts as the single-task
``Trainer``:

* ONE ``JointScanpathModel`` (shared dilated ResNet-50 trunk, three
  task heads) and ONE optimizer over the union of parameters;
* supervised phase: task batches interleaved round-robin, each step a
  jitted ``supervised_step`` through the task's head (gradients for the
  other heads are zero; weight decay applies to all parameters every
  step — a deliberate joint-training choice, documented here because
  single-task runs decay each head only on its own steps);
* SCST phase: round-robin ``rl_step`` per task, same in-graph rewards
  as single-task training;
* validation: the full host metric suite per task; the model-selection
  scalar is the harmonic mean over the three per-task ScanMatch
  harmonic means;
* artifacts: the same contract as ``Trainer`` (hparams.json,
  history_record.json, scalar stream, checkpoint triad), with scalar
  tags prefixed ``<task>/``.

Data layout under ``--joint_data_root`` (the ``tools/make_synth_data``
layout, also the recommended real-data layout):
  osie/stimuli osie/fixations
  air/stimuli air/fixations air/attention
  coco/images coco/fixations coco/detectors
"""

from __future__ import annotations

import datetime
import functools
import json
import os
import shutil
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from ..data.datasets import DataConfig, EvaluationDataset, Loader, \
    SupervisedDataset
from ..data.prefetch import prefetch
from ..metrics import evaluation as heval
from ..models.scanpath_model import JointScanpathModel, TaskView
from ..ops.sampling import random_sample, to_fix_vectors
from ..utils.checkpointing import (make_checkpoint_manager,
                                   restore_checkpoint)
from ..utils.logger import Logger
from ..utils.recording import RecordManager
from . import steps
from .mesh import (gather_spec, make_mesh, shard_batch,
                   state_sharding)
from .schedule import lr_multiplier, make_optimizer
from .trainer import ScalarWriter, grid_spec, log_metric_tree
from .steps import RLConfig, TrainState

TASKS = ("osie", "air", "coco")


def _task_data_config(args, task: str) -> DataConfig:
    root = args.joint_data_root
    common = dict(action_map=(args.map_height, args.map_width),
                  resize=(args.height, args.width),
                  max_length=args.max_length,
                  blur_sigma=args.blur_sigma,
                  cache_images=args.cache_images,
                  packed_cache_dir=getattr(args, "packed_cache_dir", "")
                  or None)
    if task == "osie":
        return DataConfig(img_dir=join(root, "osie", "stimuli"),
                          fix_dir=join(root, "osie", "fixations"),
                          **common)
    if task == "air":
        return DataConfig(img_dir=join(root, "air", "stimuli"),
                          fix_dir=join(root, "air", "fixations"),
                          att_dir=join(root, "air", "attention"),
                          **common)
    return DataConfig(img_dir=join(root, "coco", "images"),
                      fix_dir=join(root, "coco", "fixations"),
                      att_dir=join(root, "coco", "detectors"),
                      detector_threshold=args.detector_threshold,
                      coco_split=args.coco_split,
                      **common)


class _TaskContext:
    """Per-task loaders + jitted step/eval functions over the SHARED
    joint model and optimizer.  Two construction phases: loaders first
    (the optimizer schedule needs the step counts), then ``build_jits``
    once the trainer's optimizer exists."""

    def __init__(self, trainer: "JointTrainer", task: str):
        args = trainer.args
        self.task = task
        cfg = _task_data_config(args, task)
        self.train_loader = Loader(
            SupervisedDataset(task, cfg, split="train"),
            batch_size=args.batch, shuffle=True, seed=args.seed,
            drop_last=True)
        self.train_rl_loader = Loader(
            EvaluationDataset(task, cfg, split="train"),
            batch_size=max(args.batch // 4, 1), shuffle=True,
            seed=args.seed + 1, drop_last=True)
        self.validation_loader = Loader(
            EvaluationDataset(task, cfg, split="validation"),
            batch_size=args.batch, shuffle=False)

        rl_ds = self.train_rl_loader.dataset
        self.rl_cfg = RLConfig(
            task=task, grid=trainer.grid,
            rl_sample_number=args.rl_sample_number,
            max_symbols_wd=int(np.ceil(
                max(rl_ds.wd_symbols_needed, 256) / 64) * 64),
            max_symbols_wod=rl_ds.pad_gt_len,
            apply_cd=args.apply_consistency_divergence,
            lambda_5=args.lambda_5)

    def build_jits(self, trainer: "JointTrainer"):
        args = trainer.args
        view = TaskView(trainer.model, self.task)
        st_sh = trainer._state_sh
        gather = gather_spec(trainer.mesh, trainer.state.params)
        self.sup_step = jax.jit(
            functools.partial(steps.supervised_step, view,
                              trainer.optimizer, lambda_1=args.lambda_1,
                              params_gather=gather),
            donate_argnums=(0,), in_shardings=(st_sh, None),
            out_shardings=(st_sh, None))
        self.rl_step = jax.jit(
            functools.partial(steps.rl_step, view, trainer.optimizer,
                              cfg=self.rl_cfg, params_gather=gather),
            donate_argnums=(0,), in_shardings=(st_sh, None, None),
            out_shardings=(st_sh, None))
        self.eval_forward = jax.jit(
            lambda params, bs, batch: steps._eval_forward(
                view, params, bs, batch),
            in_shardings=(st_sh.params, st_sh.batch_stats, None))


class JointTrainer:
    def __init__(self, args):
        assert args.task == "joint"
        self.args = args
        self.grid = grid_spec(args)

        if args.resume_dir == "":
            date = str(datetime.datetime.now())
            date = date[:date.rfind(":")].replace("-", "") \
                .replace(":", "").replace(" ", "_")
            self.log_dir = join(args.log_root, "log_joint_" + date)
        else:
            self.log_dir = args.resume_dir
        self.checkpoints_dir = join(self.log_dir, "checkpoints")
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        if args.resume_dir == "":
            with open(join(self.log_dir, "hparams.json"), "w") as f:
                json.dump(dict(vars(args)), f, indent=2)
        self.logger = Logger(join(self.log_dir, "log_train.txt"))  # joint: INFO (new capability, no reference level)

        layers = tuple(int(x) for x in str(args.backbone_layers).split(","))
        self.model = JointScanpathModel(
            seq_len=args.max_length, map_h=args.map_height,
            map_w=args.map_width, embed=args.embed, backbone_layers=layers,
            remat=getattr(args, "remat", False),
            stem_impl=getattr(args, "stem_impl", "conv"),
            dtype=jnp.bfloat16 if args.half_precision else jnp.float32)
        self.mesh = make_mesh(args.mesh_size,
                              getattr(args, "model_parallel", 1))

        self.tasks = {t: _TaskContext(self, t) for t in TASKS}
        steps_sup = sum(len(c.train_loader) for c in self.tasks.values())
        steps_rl = sum(len(c.train_rl_loader) for c in self.tasks.values())
        self.optimizer = make_optimizer(args, steps_sup, steps_rl)
        self.lr_fn = functools.partial(
            lr_multiplier, steps_sup=steps_sup, steps_rl=steps_rl,
            warmup_epoch=args.warmup_epoch,
            start_rl_epoch=args.start_rl_epoch, epochs=args.epoch,
            rl_lr_initial_decay=args.rl_lr_initial_decay)

        self.state = self._init_state()
        self._state_sh = state_sharding(self.mesh, self.state)
        self.state = jax.device_put(self.state, self._state_sh)
        for t in TASKS:
            self.tasks[t].build_jits(self)

        self._sampler = jax.jit(
            lambda key, probs, mu, s2, n: jax.vmap(
                lambda k: random_sample(k, probs, mu, s2, self.grid))(
                jax.random.split(key, n)),
            static_argnums=(4,))

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

    def _init_state(self) -> TrainState:
        args = self.args
        n = max(args.batch // 4, 1)
        dummy = jnp.zeros((n, args.height, args.width, 3), jnp.float32)
        att = jnp.zeros((n, args.map_height, args.map_width, 1), jnp.float32)
        tids = jnp.zeros((n,), jnp.int32)
        variables = jax.jit(lambda k: self.model.init(
            k, dummy, att, tids, method="init_all"))(
            jax.random.PRNGKey(args.seed))
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        if args.checkpoint:
            import torch

            from ..models.resnet import load_torch_state_dict
            sd = torch.load(args.checkpoint, map_location="cpu")
            bp, bs = load_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()
                 if hasattr(v, "numpy")})
            params = dict(params)
            batch_stats = dict(batch_stats)
            params["backbone"] = bp
            batch_stats["backbone"] = bs
            self.logger.info("Loaded pretrained shared backbone from %s",
                             args.checkpoint)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=self.optimizer.init(params),
                          step=jnp.int32(0))

    # ------------------------------------------------------------------
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

    @staticmethod
    def _round_robin(iters: dict):
        """Yield (task, batch) cycling through the tasks until every
        loader is exhausted."""
        live = {t: iter(l) for t, l in iters.items()}
        while live:
            for t in list(live):
                try:
                    yield t, next(live[t])
                except StopIteration:
                    del live[t]

    def train_epoch(self, iteration: int, epoch: int) -> int:
        args = self.args
        rl = epoch >= args.start_rl_epoch
        loaders = {t: (self.tasks[t].train_rl_loader if rl
                       else self.tasks[t].train_loader) for t in TASKS}
        staged = prefetch(
            self._round_robin(loaders),
            lambda tb: (tb[0], self._device_batch(
                tb[1], for_rl=rl,
                global_batch=loaders[tb[0]].batch_size)),
            depth=getattr(args, "prefetch", 2))
        for task, db in staged:
            ctx = self.tasks[task]
            if rl:
                self.key, sub = jax.random.split(self.key)
                self.state, metrics = ctx.rl_step(self.state, db, sub)
            else:
                self.state, metrics = ctx.sup_step(self.state, db)
            iteration += 1
            sup_names = {"loss": "loss/loss",
                         "loss_actions": "loss/loss_actions",
                         "loss_duration": "loss/loss_duration"}
            for tag, val in metrics.items():
                self.writer.add_scalar(
                    f"{task}/{sup_names.get(tag, tag)}", val, iteration)
            self.writer.add_scalar(
                "learning_rate", args.lr * float(self.lr_fn(iteration)),
                iteration)
        return iteration

    # ------------------------------------------------------------------
    def decode_batch_device(self, ctx: _TaskContext, batch,
                            repeat_num: int, stream: str | None = None,
                            global_batch: int | None = None):
        """Eval forward + stochastic decodes, everything device-
        resident; returns (device batch, Samples) so the --device_eval
        sweep consumes the rollouts without a host round-trip."""
        db = self._device_batch(batch, for_rl=True,
                                global_batch=global_batch)
        out = ctx.eval_forward(self.state.params, self.state.batch_stats,
                               db)
        prefix = f"{stream}_" if stream else ""
        self.key, sub = jax.random.split(self.key)
        samples = self._sampler(sub, out[f"{prefix}all_actions_prob"],
                                out[f"{prefix}log_normal_mu"],
                                out[f"{prefix}log_normal_sigma2"],
                                repeat_num)
        return db, samples

    def decode_batch(self, ctx: _TaskContext, batch, repeat_num: int,
                     stream: str | None = None,
                     global_batch: int | None = None):
        _, samples = self.decode_batch_device(ctx, batch, repeat_num,
                                              stream,
                                              global_batch=global_batch)
        return to_fix_vectors(samples)

    def validation(self, iteration: int) -> float:
        repeat = self.args.eval_repeat_num
        task_hmeans = []
        for task in TASKS:
            ctx = self.tasks[task]
            all_gt, all_pred, all_perf, all_alloc = [], [], [], []
            for batch in ctx.validation_loader:
                n = len(batch["fix_vectors"])
                streams = (("good", True), ("poor", False)) \
                    if task == "air" else ((None, None),)
                for stream, flag in streams:
                    preds = self.decode_batch(
                        ctx, batch, repeat, stream,
                        global_batch=ctx.validation_loader.batch_size)
                    for r in range(repeat):
                        all_gt.extend(batch["fix_vectors"])
                        if task == "air":
                            all_perf.extend(batch["performances"])
                            all_alloc.extend([flag] * n)
                        all_pred.extend(preds[r * n:(r + 1) * n])
            if task == "air":
                m, s, _ = heval.evaluation_performance_related(
                    all_gt, all_pred, all_perf, all_alloc)
            else:
                m, s, _ = heval.evaluation(all_gt, all_pred)
            hm = self._task_hmean(task, m)
            task_hmeans.append(hm)
            self.logger.info(f"[{task}] validation after iteration "
                             f"{iteration}: ScanMatch hmean {hm:.4f}")

            self._write_metric_scalars(task, m, iteration)
        joint = float(scipy.stats.hmean(task_hmeans))
        self.writer.add_scalar("current metric", joint, iteration)
        return joint

    def _write_metric_scalars(self, task: str, metrics: dict,
                              iteration: int):
        def walk(mm, prefix):
            for k, v in mm.items():
                if isinstance(v, dict):
                    walk(v, prefix + [k])
                else:
                    self.writer.add_scalar(
                        f"{task}/metrics/" + "-".join(prefix + [k]),
                        v, iteration)
        walk(metrics, [])

    @staticmethod
    def _task_hmean(task: str, m: dict) -> float:
        if task == "air":
            vals = (list(m["right_answer"]["ScanMatch"].values())
                    + list(m["wrong_answer"]["ScanMatch"].values()))
        else:
            vals = list(m["ScanMatch"].values())
        return float(scipy.stats.hmean(vals))

    def validation_device(self, iteration: int) -> float:
        """--device_eval joint validation: every pairwise metric row on
        device kernels (metrics/device_eval.py), host keeping only the
        suite's own aggregation — kills the last path still paying the
        reference's CPU metric loops
        (OSIE/utils/evaluation.py:151-282).  Same rollout/key schedule
        and same returned scalar as :meth:`validation`."""
        from ..metrics.device_eval import DeviceSweep
        from .trainer import eval_specs
        repeat = self.args.eval_repeat_num
        task_hmeans = []
        for task in TASKS:
            ctx = self.tasks[task]
            spec_wd, spec_wod = eval_specs(ctx.validation_loader.dataset,
                                           self.grid)
            sweep = DeviceSweep(spec_wd, spec_wod)
            for batch in ctx.validation_loader:
                gb = ctx.validation_loader.batch_size
                if task == "air":
                    for stream, flag in (("good", True), ("poor", False)):
                        db, samples = self.decode_batch_device(
                            ctx, batch, repeat, stream, global_batch=gb)
                        for r in range(repeat):
                            sweep.add_batch_air(
                                db["gt_fix"], db["gt_len"], db["gt_mask"],
                                samples.fix[r], samples.fix_len[r],
                                batch["performances"], flag)
                else:
                    db, samples = self.decode_batch_device(
                        ctx, batch, repeat, global_batch=gb)
                    for r in range(repeat):
                        sweep.add_batch(db["gt_fix"], db["gt_len"],
                                        db["gt_mask"], samples.fix[r],
                                        samples.fix_len[r])
            m, s = sweep.result()
            hm = self._task_hmean(task, m)
            task_hmeans.append(hm)
            self.logger.info(f"[{task}] validation (device sweep) after "
                             f"iteration {iteration}: ScanMatch hmean "
                             f"{hm:.4f}")
            self._write_metric_scalars(task, m, iteration)
            sweep.log_overflow(self.logger, self.writer,
                               tag=f"{task}/metrics/wd_overflow_frac",
                               step=iteration, prefix=f"[{task}] ")
        joint = float(scipy.stats.hmean(task_hmeans))
        self.writer.add_scalar("current metric", joint, iteration)
        return joint

    def human_baseline(self):
        """Per-task human inter-observer baseline before training (the
        reference prints this at the start of every run,
        AiR/train.py:452-460); device kernels under --device_eval."""
        from .trainer import eval_specs
        for task in TASKS:
            ctx = self.tasks[task]
            if getattr(self.args, "device_eval", False):
                from ..metrics.device_eval import human_evaluation_device
                spec_wd, spec_wod = eval_specs(
                    ctx.validation_loader.dataset, self.grid)
                metrics, stds, _ = human_evaluation_device(
                    ctx.validation_loader, spec_wd, spec_wod, task=task)
            else:
                metrics, stds, _ = heval.human_evaluation(
                    ctx.validation_loader, task=task)
            self.logger.info(f"[{task}] metrics for human performance:")
            log_metric_tree(self.logger, metrics, stds)

    # ------------------------------------------------------------------
    def fit(self) -> float:
        args = self.args
        start_epoch = self.record_manager.get_epoch()
        iteration = self.record_manager.get_iteration()
        if args.resume_dir == "":
            self.human_baseline()
        for epoch in range(start_epoch + 1, args.epoch):
            iteration = self.train_epoch(iteration, epoch)
            cur = (self.validation_device(iteration)
                   if getattr(args, "device_eval", False)
                   else self.validation(iteration))
            self.logger.info(f"joint metric: {cur:.4f}")
            model_state = {"params": self.state.params,
                           "batch_stats": self.state.batch_stats}
            self.checkpoint_manager.step(cur, model_state,
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
