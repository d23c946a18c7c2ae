"""Data-parallel correctness: the SAME batch must produce identical
losses and updated parameters on a 1-device and an 8-device mesh
(replicated params, batch sharded over the ``data`` axis) — the
TPU-native contract replacing the reference's nn.DataParallel
(reference AiR/train.py:169-170, SURVEY §2.8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from scanpaths_tpu.core.grid import GridSpec
from scanpaths_tpu.models.scanpath_model import create_model
from scanpaths_tpu.train import steps
from scanpaths_tpu.train.mesh import (batch_sharding, make_mesh, replicated,
                                      shard_batch)
from scanpaths_tpu.train.schedule import make_optimizer

MH, MW, T = 5, 6, 3
H, W = 8 * MH, 8 * MW
A = MH * MW + 1
N = 8  # one sample per device on the 8-way mesh


def _setup():
    import types
    model = create_model("osie", seq_len=T, map_h=MH, map_w=MW,
                         embed=128, backbone_layers=(1, 1, 1, 1))
    args = types.SimpleNamespace(lr=1e-3, clip=12.5, weight_decay=1e-4,
                                 warmup_epoch=1, start_rl_epoch=5, epoch=10,
                                 rl_lr_initial_decay=0.5)
    optimizer = make_optimizer(args, steps_sup=4, steps_rl=4)
    rng = np.random.default_rng(0)
    images = np.asarray(rng.normal(size=(N, H, W, 3)), np.float32)
    variables = jax.jit(lambda k: model.init(
        k, jnp.asarray(images), train=False))(jax.random.PRNGKey(0))
    state = steps.TrainState(params=variables["params"],
                             batch_stats=variables["batch_stats"],
                             opt_state=optimizer.init(variables["params"]),
                             step=jnp.int32(0))
    scan = np.zeros((N, T, A), np.float32)
    scan[:, :, 5] = 1.0
    sup_batch = {
        "images": images,
        "scanpaths": scan,
        "durations": np.full((N, T), 0.3, np.float32),
        "action_masks": np.ones((N, T), np.float32),
        "duration_masks": np.ones((N, T), np.float32),
    }
    return model, optimizer, state, sup_batch, rng


def _run_sup(model, optimizer, state, batch, n_dev):
    mesh = make_mesh(n_dev)
    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    db = shard_batch(mesh, batch)
    step = jax.jit(lambda s, b: steps.supervised_step(
        model, optimizer, s, b, lambda_1=1.0), in_shardings=(rep, None))
    new_state, metrics = step(state, db)
    return new_state, metrics


def _leaves(tree):
    return np.concatenate([np.ravel(np.asarray(x))
                           for x in jax.tree_util.tree_leaves(tree)])


def test_supervised_step_mesh_equivalence():
    assert jax.device_count() >= 8, "conftest should force 8 CPU devices"
    model, optimizer, state, sup_batch, _ = _setup()
    s1, m1 = _run_sup(model, optimizer, state, sup_batch, 1)
    s8, m8 = _run_sup(model, optimizer, state, sup_batch, 8)
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-5)
    p1, p8 = _leaves(s1.params), _leaves(s8.params)
    np.testing.assert_allclose(p1, p8, rtol=2e-5, atol=2e-6)
    b1, b8 = _leaves(s1.batch_stats), _leaves(s8.batch_stats)
    np.testing.assert_allclose(b1, b8, rtol=2e-5, atol=2e-6)
    # the 8-way run really sharded the batch over the data axis
    mesh = make_mesh(8)
    db = shard_batch(mesh, sup_batch)
    assert db["images"].sharding == batch_sharding(mesh)
    assert db["images"].addressable_shards[0].data.shape[0] == N // 8


def test_rl_step_mesh_equivalence():
    model, optimizer, state, _, rng = _setup()
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=1)
    cfg = steps.RLConfig(task="osie", grid=grid, rl_sample_number=2,
                         max_symbols_wd=32)
    smax, glen = 3, 6
    gt_fix = np.zeros((N, smax, glen, 3), np.float32)
    gt_fix[..., 0] = rng.uniform(0, W, (N, smax, glen))
    gt_fix[..., 1] = rng.uniform(0, H, (N, smax, glen))
    gt_fix[..., 2] = rng.uniform(0.1, 0.5, (N, smax, glen))
    batch = {
        "images": np.asarray(rng.normal(size=(N, H, W, 3)), np.float32),
        "gt_fix": gt_fix,
        "gt_len": np.full((N, smax), glen, np.int32),
        "gt_mask": np.ones((N, smax), np.float32),
    }
    key = jax.random.PRNGKey(3)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        rep = replicated(mesh)
        st = jax.device_put(state, rep)
        db = shard_batch(mesh, batch)
        rl = jax.jit(lambda s, b, k: steps.rl_step(model, optimizer, s, b,
                                                   k, cfg),
                     in_shardings=(rep, None, None))
        new_state, metrics = rl(st, db, key)
        results[n_dev] = (new_state, metrics)

    (s1, m1), (s8, m8) = results[1], results[8]
    # identical PRNG key => identical rollouts => identical rewards/loss
    assert float(m1["reward_hmean"]) == pytest.approx(
        float(m8["reward_hmean"]), rel=2e-5, abs=1e-6)
    assert float(m1["rl_loss"]) == pytest.approx(float(m8["rl_loss"]),
                                                 rel=2e-4, abs=1e-5)
    np.testing.assert_allclose(_leaves(s1.params), _leaves(s8.params),
                               rtol=5e-5, atol=5e-6)


# ---------------------------------------------------------------------
# Multi-host input plan (SURVEY §2.8): every host derives the same
# global shuffle and loads only its contiguous per-host slice of each
# global batch; shard_batch assembles the global array from the local
# slice via jax.make_array_from_process_local_data.
# ---------------------------------------------------------------------

class _FakeDataset:
    """Indexable yielding collate-able dicts whose payload encodes the
    dataset index (so batch contents can be asserted exactly)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((2, 3), i, np.float32),
                "performance": np.int64(i)}


def test_loader_host_slices_partition_each_global_batch():
    from scanpaths_tpu.data.datasets import Loader

    n, bsz, pc = 24, 8, 4
    global_loader = Loader(_FakeDataset(n), batch_size=bsz, shuffle=True,
                           seed=7, process_index=0, process_count=1)
    host_loaders = [Loader(_FakeDataset(n), batch_size=bsz, shuffle=True,
                           seed=7, process_index=pi, process_count=pc)
                    for pi in range(pc)]
    assert all(len(hl) == len(global_loader) for hl in host_loaders)

    for gb, *hbs in zip(global_loader, *host_loaders):
        got = np.concatenate([hb["performances"] for hb in hbs])
        # concatenated contiguous host slices == the global batch, in
        # order (the layout make_array_from_process_local_data expects)
        np.testing.assert_array_equal(got, gb["performances"])
        for hb in hbs:
            assert hb["images"].shape[0] == bsz // pc


def test_loader_partial_tail_loaded_in_full_on_every_host():
    from scanpaths_tpu.data.datasets import Loader

    n, bsz, pc = 10, 8, 4  # tail of 2 < bsz
    tails = [list(Loader(_FakeDataset(n), batch_size=bsz, shuffle=False,
                         process_index=pi, process_count=pc))[-1]
             for pi in range(pc)]
    for tb in tails:
        np.testing.assert_array_equal(tb["performances"],
                                      tails[0]["performances"])
        assert tb["images"].shape[0] == 2


def test_loader_rejects_indivisible_global_batch():
    from scanpaths_tpu.data.datasets import Loader

    with pytest.raises(ValueError):
        Loader(_FakeDataset(8), batch_size=6, process_index=0,
               process_count=4)


def test_shard_batch_process_local_assembly_matches_device_put():
    """The make_array_from_process_local_data path (forced via an
    explicit process_count) must build arrays identical to the plain
    device_put path, for both sharded full batches and replicated
    partial tails."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    full = {"images": np.asarray(rng.normal(size=(16, 4, 4, 3)),
                                 np.float32),
            "gt_len": np.arange(16, dtype=np.int32)}
    tail = {"images": np.asarray(rng.normal(size=(3, 4, 4, 3)),
                                 np.float32)}

    for batch, global_batch in ((full, 16), (tail, 16)):
        via_local = shard_batch(mesh, dict(batch),
                                global_batch=global_batch,
                                process_count=1)
        via_put = shard_batch(mesh, dict(batch))
        for k in batch:
            np.testing.assert_array_equal(np.asarray(via_local[k]),
                                          np.asarray(via_put[k]))
            assert via_local[k].sharding == via_put[k].sharding, k


# ---------------------------------------------------------------------
# Tensor-parallel (--model_parallel): kernels and Adam moments live
# sharded along their contraction dim over the ``model`` axis; training
# steps all-gather params at entry (ZeRO-3 style) and must match the
# replicated program; eval forwards compute row-parallel directly on
# the sharded kernels and must match too.  See train/mesh.py for why
# the two paths differ (XLA partitioner miscompile probe).
# ---------------------------------------------------------------------

from scanpaths_tpu.train.mesh import gather_spec, state_sharding  # noqa: E402


def _tp_mesh():
    return make_mesh(4, model_parallel=2)  # data=2 x model=2


def test_tp_state_sharding_row_parallel_specs():
    import optax
    model, _, state, _, _ = _setup()
    mesh = _tp_mesh()
    opt = optax.adam(1e-3)
    st = steps.TrainState(params=state.params,
                          batch_stats=state.batch_stats,
                          opt_state=opt.init(state.params),
                          step=jnp.int32(0))
    sh = state_sharding(mesh, st)
    # conv kernels shard their input-channel (contraction) dim
    assert sh.params["lstm"]["gates_h"]["kernel"].spec == \
        P(None, None, "model", None)
    assert sh.params["sal_conv"]["kernel"].spec == P(None, None, "model",
                                                     None)
    # dense kernels shard dim 0 (their contraction dim)
    assert sh.params["semantic_embed"]["kernel"].spec == P("model", None)
    # biases / BN / scalars replicate; the stem conv (in=3) and the
    # 1-channel head taps replicate
    assert sh.params["lstm"]["gates_h"]["bias"].spec == P()
    assert sh.params["backbone"]["conv1"]["kernel"].spec == P()
    assert sh.params["head"]["drt_layer_1"]["kernel"].spec == P()
    assert sh.step.spec == P()
    # Adam moments mirror their parameter's spec (path-suffix matching)
    mu = sh.opt_state[0].mu  # ScaleByAdamState
    assert mu["lstm"]["gates_h"]["kernel"].spec == \
        P(None, None, "model", None)
    assert mu["lstm"]["gates_h"]["bias"].spec == P()
    # non-TP mesh: everything replicated
    rep_sh = state_sharding(make_mesh(1), st)
    assert rep_sh.params["lstm"]["gates_h"]["kernel"].spec == P()
    assert gather_spec(make_mesh(1), st.params) is None


def test_tp_training_steps_match_replicated():
    """One supervised + one RL step on the 2x2 mesh (params/moments
    sharded at rest, gathered at step entry) vs the 1-device replicated
    run.  SGD, not Adam: Adam's m/sqrt(v) normalization acts like
    sign(g) on near-zero gradients and amplifies benign psum
    reassociation noise into O(lr) parameter flips, which would mask
    what this test pins (the gathered step computes the same math)."""
    import optax
    model, _, state, sup_batch, rng = _setup()
    opt = optax.sgd(1e-2)
    base = steps.TrainState(params=state.params,
                            batch_stats=state.batch_stats,
                            opt_state=opt.init(state.params),
                            step=jnp.int32(0))
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=1)
    cfg = steps.RLConfig(task="osie", grid=grid, rl_sample_number=2,
                         max_symbols_wd=32)
    smax, glen = 3, 6
    gt_fix = np.zeros((N, smax, glen, 3), np.float32)
    gt_fix[..., 0] = rng.uniform(0, W, (N, smax, glen))
    gt_fix[..., 1] = rng.uniform(0, H, (N, smax, glen))
    gt_fix[..., 2] = rng.uniform(0.1, 0.5, (N, smax, glen))
    rl_batch = {
        "images": sup_batch["images"],
        "gt_fix": gt_fix,
        "gt_len": np.full((N, smax), glen, np.int32),
        "gt_mask": np.ones((N, smax), np.float32),
    }
    key = jax.random.PRNGKey(3)

    def run(mesh, tp):
        sh = state_sharding(mesh, base)
        st = jax.device_put(base, sh)
        gs = gather_spec(mesh, base.params)
        sup = jax.jit(lambda s, b: steps.supervised_step(
            model, opt, s, b, lambda_1=1.0, params_gather=gs),
            in_shardings=(sh, None), out_shardings=(sh, None))
        rl = jax.jit(lambda s, b, k: steps.rl_step(
            model, opt, s, b, k, cfg, params_gather=gs),
            in_shardings=(sh, None, None), out_shardings=(sh, None))
        st, m_sup = sup(st, shard_batch(mesh, sup_batch))
        st, m_rl = rl(st, shard_batch(mesh, rl_batch), key)
        jax.block_until_ready(m_rl["rl_loss"])
        return st, m_sup, m_rl

    s1, ms1, mr1 = run(make_mesh(1), False)
    mesh = _tp_mesh()
    s2, ms2, mr2 = run(mesh, True)

    assert float(ms1["loss"]) == pytest.approx(float(ms2["loss"]),
                                               rel=1e-4)
    assert float(mr1["reward_hmean"]) == pytest.approx(
        float(mr2["reward_hmean"]), rel=1e-4, abs=1e-6)
    assert float(mr1["rl_loss"]) == pytest.approx(float(mr2["rl_loss"]),
                                                  rel=1e-3, abs=1e-5)
    # atol dominates: the gather/reshard changes summation order, so
    # near-zero updates (elements at the 1e-5 scale after two SGD
    # steps) carry ~4e-5 reassociation noise; real-magnitude params
    # still match to rtol
    np.testing.assert_allclose(_leaves(s1.params), _leaves(s2.params),
                               rtol=1e-3, atol=1e-4)
    # the TP state REALLY lives sharded between steps: each device
    # holds half of the gate kernel's input-channel dim
    kern = s2.params["lstm"]["gates_h"]["kernel"]
    assert kern.sharding.spec == P(None, None, "model", None)
    full_in = kern.shape[2]
    assert kern.addressable_shards[0].data.shape[2] == full_in // 2


def test_tp_eval_forward_row_parallel_matches_replicated():
    """The eval forward computes DIRECTLY on the sharded kernels
    (row-parallel partial contractions + psum over ``model``) — no
    gather — and must equal the replicated forward."""
    model, _, state, sup_batch, _ = _setup()
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(mesh, tp):
        sh = state_sharding(mesh, variables)
        v = jax.device_put(variables, sh)
        img = jax.device_put(sup_batch["images"], batch_sharding(mesh))
        out = jax.jit(lambda vv, ii: model.apply(vv, ii, train=False))(
            v, img)
        return jax.tree_util.tree_map(np.asarray, out)

    o1 = fwd(make_mesh(1), False)
    o2 = fwd(_tp_mesh(), True)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k], np.float64),
                                   np.asarray(o2[k], np.float64),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_tp_sharded_state_checkpoints_interchangeably(tmp_path):
    """A checkpoint written from a TP-sharded state must restore
    byte-identically (flax serialization assembles the full array from
    the shards), so runs trained under --model_parallel and plain
    data-parallel runs are checkpoint-interchangeable."""
    from scanpaths_tpu.utils.checkpointing import (CheckpointManager,
                                                   restore_best_checkpoint)
    model, _, state, _, _ = _setup()
    mesh = _tp_mesh()
    sh = state_sharding(mesh, state)
    sharded = jax.device_put(state, sh)
    kern = sharded.params["lstm"]["gates_h"]["kernel"]
    assert kern.addressable_shards[0].data.shape[2] == kern.shape[2] // 2

    mgr = CheckpointManager(str(tmp_path), mode="max")
    mgr.step(1.0, {"params": sharded.params,
                   "batch_stats": sharded.batch_stats})
    restored = restore_best_checkpoint(
        str(tmp_path), {"params": state.params,
                        "batch_stats": state.batch_stats})
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
