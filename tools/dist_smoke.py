"""REAL multi-process data-parallel integration drive (CPU backend).

The pod recipe in docs/DISTRIBUTED.md (`jax.distributed.initialize`,
same CLI on every host, per-host input slices assembled with
`jax.make_array_from_process_local_data`) was previously only ever
simulated in-process (tests/test_mesh.py overrides process_index/
process_count inside one interpreter).  This tool executes it across
REAL process boundaries: it spawns N worker processes, each with its
own 4-device virtual CPU mesh slice, runs 2 supervised steps through
the real ``Trainer._device_batch`` path (epoch-seeded same-shuffle
Loader -> per-host slice -> process-local assembly -> jitted
data-parallel step), and asserts the per-step losses match a
single-process run of the same global batches to float32-ulp level
(the cross-process all-reduce may order the 8 partial sums differently
than the single-process one; measured difference is ~6e-8 relative).

Usage:
    python tools/dist_smoke.py                  # launcher: run + verify
    python tools/dist_smoke.py --worker P N PORT DATA LOGROOT [STEPS]

The reference being surpassed: single-process nn.DataParallel
(reference AiR/train.py:169-170) — it has no multi-host story at all.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 2
GLOBAL_BATCH = 8
TINY = ["--task", "osie", "--map_height", "5", "--map_width", "6",
        "--height", "40", "--width", "48", "--max_length", "4",
        "--backbone_layers", "1,1,1,1", "--embed", "64",
        "--batch", str(GLOBAL_BATCH), "--mesh_size", "0",
        "--epoch", "2", "--start_rl_epoch", "5"]


def worker(process_id: int, num_processes: int, port: int,
           data_root: str, log_root: str, steps: int = STEPS):
    """One pod 'host': initialize the distributed runtime, build the
    REAL Trainer, run ``steps`` supervised steps, print the replicated
    per-step losses as one JSON line."""
    import jax

    if num_processes > 1:
        # generous timeouts: on a contended 1-core box the workers'
        # first-compile skew can exceed the 300 s defaults, which
        # fails the coordination service's Shutdown barrier even
        # though every step ran correctly
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_processes, process_id=process_id,
            initialization_timeout=900,
            heartbeat_timeout_seconds=900,
            shutdown_timeout_seconds=900)
        assert jax.process_count() == num_processes
    from scanpaths_tpu.core.config import parse_opt
    from scanpaths_tpu.train.trainer import Trainer

    args = parse_opt(TINY + [
        "--img_dir", os.path.join(data_root, "osie", "stimuli"),
        "--fix_dir", os.path.join(data_root, "osie", "fixations"),
        "--log_root", log_root])
    trainer = Trainer(args)
    dbs = []
    for i, batch in enumerate(trainer.train_loader):
        if i >= steps:
            break
        dbs.append(trainer._device_batch(
            batch, for_rl=False,
            global_batch=trainer.train_loader.batch_size))
    step_fn = trainer._sup_step
    if num_processes > 1:
        # XLA:CPU's cross-process gloo rendezvous has a HARD 30 s
        # GetKeyValue timeout, far tighter than any compile on a
        # contended 1-core box.  Compile ahead of time, then hold every
        # process at a coordination-service barrier (configurable
        # timeout) so the first collective EXECUTION — where gloo
        # context init happens — starts everywhere within milliseconds.
        step_fn = step_fn.lower(trainer.state, dbs[0]).compile()
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            "dist_smoke_compiled", 900_000)
    losses = []
    for db in dbs:
        trainer.state, m = step_fn(trainer.state, db)
        # loss is a replicated scalar: addressable on every host
        losses.append(float(m["loss"]))
    print(json.dumps({"process": process_id, "n_local_devices":
                      jax.local_device_count(), "n_devices":
                      jax.device_count(), "losses": losses}))
    if num_processes > 1:
        # align the exits so no task hits the Shutdown barrier while a
        # peer is still draining host work
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("dist_smoke_done")


def _env(n_local_devices: int) -> dict:
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sp_dist_cache")
    return env


def _parse(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON line in worker output:\n{stdout[-2000:]}")


def launch(tmp: str = "/tmp/sp_dist_smoke", num_processes: int = 2,
           steps: int = STEPS) -> dict:
    """Spawn the single-process reference and the N-process pod run;
    return {"single": [...], "multi": [...]} losses (also printed)."""
    import shutil

    import tools.make_synth_data as msd

    data_root = os.path.join(tmp, "data")
    if not os.path.exists(os.path.join(data_root, "osie")):
        # >= steps x GLOBAL_BATCH supervised train records
        msd.make_all(data_root, seed=0,
                     osie=dict(n_images=10, n_subjects=4),
                     air=dict(n_questions=2, n_subjects=2),
                     coco=dict(n_images=2, n_subjects=2))
    me = os.path.abspath(__file__)

    with socket.socket() as s:   # a free TCP port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    # single-process reference: all 8 virtual devices in one process
    ref_log = os.path.join(tmp, "log_single")
    shutil.rmtree(ref_log, ignore_errors=True)
    ref = subprocess.run(
        [sys.executable, me, "--worker", "0", "1", "0", data_root,
         ref_log, str(steps)],
        env=_env(8), capture_output=True, text=True, timeout=1500)
    assert ref.returncode == 0, ref.stderr[-3000:]
    single = _parse(ref.stdout)

    # the pod: num_processes workers, 8/num_processes devices each
    procs = []
    for pid in range(num_processes):
        log = os.path.join(tmp, f"log_p{pid}")
        shutil.rmtree(log, ignore_errors=True)
        procs.append(subprocess.Popen(
            [sys.executable, me, "--worker", str(pid),
             str(num_processes), str(port), data_root, log, str(steps)],
            env=_env(8 // num_processes), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, err[-3000:]
        outs.append(_parse(out))

    for o in outs:
        assert o["n_devices"] == 8, o
        assert o["n_local_devices"] == 8 // num_processes, o
    result = {"single": single["losses"],
              "multi": [o["losses"] for o in outs]}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5], sys.argv[6],
               int(sys.argv[7]) if len(sys.argv) > 7 else STEPS)
    else:
        r = launch()
        import numpy as np
        for m in r["multi"]:
            np.testing.assert_allclose(m, r["single"], rtol=1e-6)
        print("dist_smoke ok: 2-process losses == single-process losses "
              "(float32-ulp)")
