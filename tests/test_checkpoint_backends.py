"""Checkpoint backends: the msgpack manager and the async orbax manager
must implement identical triad/best semantics (reference
AiR/utils/checkpointing.py:79-110), and the auto-detecting restore
helpers must read back whichever backend wrote the directory."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scanpaths_tpu.utils.checkpointing import (detect_backend,
                                               make_checkpoint_manager,
                                               restore_best_checkpoint,
                                               restore_checkpoint)


def _model_state(scale: float):
    return {"params": {"w": jnp.full((2, 3), scale, jnp.float32),
                       "head": {"b": jnp.full((4,), scale, jnp.bfloat16)}},
            "batch_stats": {"mean": jnp.full((3,), scale, jnp.float32)}}


def _opt_state(params):
    return optax.adam(1e-3).init(params)


def _trees_equal(a, b) -> bool:
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    return ta == tb and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_triad_and_best_semantics(tmp_path, backend):
    d = str(tmp_path / "checkpoints")
    mgr = make_checkpoint_manager(d, mode="max", backend=backend)

    m1, m2, m3 = _model_state(1.0), _model_state(2.0), _model_state(3.0)
    o1 = _opt_state(m1["params"])
    o2 = jax.tree_util.tree_map(lambda x: x + 1 if x.dtype != jnp.bool_
                                else x, _opt_state(m2["params"]))
    o3 = _opt_state(m3["params"])

    mgr.step(0.5, m1, o1)          # falsy initial best -> adopt
    assert mgr.get_best_metric() == 0.5
    mgr.step(0.3, m2, o2)          # worse: rolling updates, best does not
    assert mgr.get_best_metric() == 0.5
    mgr.wait()

    assert detect_backend(d) == backend
    like_m = jax.tree_util.tree_map(jnp.zeros_like, m1)
    like_o = jax.tree_util.tree_map(jnp.zeros_like, o1)
    rolled = restore_checkpoint(d, like_m, like_o)
    assert _trees_equal(rolled["model"], m2)
    assert _trees_equal(rolled["optimizer"], o2)
    assert _trees_equal(restore_best_checkpoint(d, like_m), m1)

    mgr.step(0.5, m3, o3)          # tie counts as improvement
    mgr.wait()
    assert _trees_equal(restore_best_checkpoint(d, like_m), m3)

    # restored dtypes survive the round trip (bf16 head stays bf16)
    best = restore_best_checkpoint(d, like_m)
    assert np.asarray(best["params"]["head"]["b"]).dtype == jnp.bfloat16


def test_min_mode_and_manager_restore(tmp_path):
    d = str(tmp_path / "ck")
    mgr = make_checkpoint_manager(d, mode="min", backend="orbax")
    m1, m2 = _model_state(1.0), _model_state(2.0)
    mgr.step(0.9, m1, None)
    mgr.step(0.2, m2, None)        # lower is better in min mode
    like = jax.tree_util.tree_map(jnp.zeros_like, m1)
    assert _trees_equal(mgr.restore_best(like), m2)
    assert mgr.get_best_metric() == 0.2
    # restore through a FRESH manager (new process simulation)
    mgr2 = make_checkpoint_manager(d, mode="min", backend="orbax")
    rolled = mgr2.restore(like, None)
    assert _trees_equal(rolled["model"], m2)
    assert rolled["optimizer"] is None or rolled["optimizer"] == {}


def test_empty_dir_detects_msgpack(tmp_path):
    assert detect_backend(str(tmp_path)) == "msgpack"


def test_mixed_backend_dir_is_an_explicit_error(tmp_path):
    """A dir with BOTH backends' artifacts must never silently restore
    the stale one: detection raises, and each backend refuses to start
    writing next to the other's leftovers."""
    d = str(tmp_path / "ck")
    mgr = make_checkpoint_manager(d, backend="msgpack")
    m1 = _model_state(1.0)
    mgr.step(0.5, m1, None)
    mgr.close()
    # orbax manager refuses a dir holding msgpack checkpoints
    with pytest.raises(RuntimeError, match="msgpack"):
        make_checkpoint_manager(d, backend="orbax")
    # forge the mixed state directly and check detection raises
    import os
    os.makedirs(os.path.join(d, "checkpoint.orbax"), exist_ok=True)
    with pytest.raises(RuntimeError, match="BOTH"):
        detect_backend(d)
    with pytest.raises(RuntimeError, match="orbax"):
        make_checkpoint_manager(d, backend="msgpack")


def test_crash_leftovers_count_as_backend_evidence(tmp_path):
    """Orbax commit-swap leftovers (.old from a crash between the two
    renames, .new from a crash mid-write) must flip detection and the
    msgpack write guard exactly like a final-name checkpoint: otherwise
    a msgpack run could start next to them and later auto-detecting
    restores would hit the BOTH-backends error (or silently pick the
    wrong backend)."""
    import os
    for leftover in ("checkpoint.orbax.old", "checkpoint_best.orbax.new"):
        d = str(tmp_path / leftover.replace(".", "_"))
        os.makedirs(os.path.join(d, leftover))
        assert detect_backend(d) == "orbax"
        # msgpack refuses to write next to the leftover...
        with pytest.raises(RuntimeError, match="orbax"):
            make_checkpoint_manager(d, backend="msgpack")
        # ...so the admit/detect split can't create the mixed state
        np.save(os.path.join(d, "unrelated.npy"), np.zeros(1))
        assert detect_backend(d) == "orbax"


def test_orbax_crash_safety_staging(tmp_path):
    """The previous checkpoint must remain complete on disk for the
    whole duration of the next async write: step() stages to
    checkpoint.orbax.new and only wait()/the next step() swaps it in."""
    import os
    d = str(tmp_path / "ck")
    mgr = make_checkpoint_manager(d, backend="orbax")
    m1, m2 = _model_state(1.0), _model_state(2.0)
    like = jax.tree_util.tree_map(jnp.zeros_like, m1)

    mgr.step(0.5, m1, None)
    mgr.wait()                      # m1 committed to the final names
    assert os.path.isdir(os.path.join(d, "checkpoint.orbax"))

    mgr.step(0.3, m2, None)         # async write staged, NOT committed
    # the final rolling dir still holds the COMPLETE previous (m1)
    # checkpoint while m2's write is in flight / staged
    got = restore_checkpoint(d, like, None)
    assert _trees_equal(got["model"], m1)

    mgr.wait()                      # commit the swap
    got = restore_checkpoint(d, like, None)
    assert _trees_equal(got["model"], m2)
    mgr.close()
    mgr.close()                     # idempotent


def test_orbax_old_name_fallback_restore(tmp_path):
    """Crash between the two commit renames leaves checkpoint.orbax.old
    only; restore must fall back to it."""
    import os
    d = str(tmp_path / "ck")
    mgr = make_checkpoint_manager(d, backend="orbax")
    m1 = _model_state(4.0)
    like = jax.tree_util.tree_map(jnp.zeros_like, m1)
    mgr.step(0.5, m1, None)
    mgr.close()
    os.rename(os.path.join(d, "checkpoint.orbax"),
              os.path.join(d, "checkpoint.orbax.old"))
    assert detect_backend(d) == "orbax"
    got = restore_checkpoint(d, like, None)
    assert _trees_equal(got["model"], m1)
