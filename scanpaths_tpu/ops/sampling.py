"""On-device stochastic scanpath decoding.

Replaces the reference's host-side sampling loop
(reference OSIE/models/sampling.py:16-77) with fully batched device
code driven by explicit PRNG keys; the per-sample Python decode loop
becomes masked tensor arithmetic, so N x S rollouts sample in one
fused program.

Reference quirks preserved (they change the numbers if "fixed"):
* durations are sampled as ``exp(randn * sigma2 + mu)`` — the SQUARED
  scale multiplies the normal draw (sampling.py:26-27);
* STOP is masked out of the categorical for the first ``min_length``
  steps by zeroing its probability (sampling.py:20), but the gathered
  per-action probabilities come from the ORIGINAL distribution
  (sampling.py:23-24);
* ``scanpath_length`` counts the first STOP at index >= 1 (an index-0
  STOP leaves the length at the full T — sampling.py:29-33);
* the action mask covers fixations up to AND including the first STOP,
  the duration mask only strict fixations (sampling.py:59-71).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import FIX_DTYPE, GridSpec


class SampleOut(NamedTuple):
    actions: jnp.ndarray          # [..., T] int32 sampled action ids
    action_probs: jnp.ndarray     # [..., T] probability of the sampled action
    durations: jnp.ndarray        # [..., T] sampled durations (seconds)
    scanpath_length: jnp.ndarray  # [...] reference length semantics
    fix: jnp.ndarray              # [..., T, 3] (x, y, duration) pixel fixations
    fix_len: jnp.ndarray          # [...] number of fixations before first STOP
    action_mask: jnp.ndarray      # [..., T] float
    duration_mask: jnp.ndarray    # [..., T] float


def random_sample(key: jax.Array, probs: jnp.ndarray, mu: jnp.ndarray,
                  sigma2: jnp.ndarray, grid: GridSpec) -> SampleOut:
    """Sample one scanpath per leading-batch element.

    probs: [..., T, A] action distributions (already softmaxed),
    mu/sigma2: [..., T] LogNormal duration parameters.
    """
    t = probs.shape[-2]
    k_act, k_dur = jax.random.split(key)

    masked = probs.at[..., :grid.min_length, 0].set(0.0)
    logits = jnp.log(masked + 1e-20)
    actions = jax.random.categorical(k_act, logits, axis=-1)      # [..., T]
    action_probs = jnp.take_along_axis(probs, actions[..., None],
                                       axis=-1)[..., 0]

    rand = jax.random.normal(k_dur, mu.shape)
    durations = jnp.exp(rand * sigma2 + mu)

    is_stop = actions == 0
    # first STOP at index >= 1; index-0 STOP falls through to length T
    # (reference sampling.py:29-33)
    idx = jnp.arange(t)
    stop_pos = jnp.where(is_stop & (idx >= 1), idx, t)
    scanpath_length = jnp.min(stop_pos, axis=-1)

    # decode geometry & masks (reference sampling.py:59-75)
    stopped_before = jnp.cumsum(is_stop, axis=-1) - is_stop > 0
    fixating = (~is_stop) & (~stopped_before)     # strict fixation steps
    first_stop = is_stop & (~stopped_before)
    action_mask = (fixating | first_stop).astype(jnp.float32)
    duration_mask = fixating.astype(jnp.float32)

    cell = jnp.maximum(actions - 1, 0)
    px = (cell % grid.map_width) * grid.x_granularity + grid.x_granularity / 2
    py = (cell // grid.map_width) * grid.y_granularity + grid.y_granularity / 2
    fix = jnp.stack([px, py, durations], axis=-1) * duration_mask[..., None]
    # compact: fixations already occupy a prefix (everything after the
    # first STOP is masked), so the padded layout is (fix, fix_len)
    fix_len = jnp.sum(duration_mask, axis=-1).astype(jnp.int32)

    return SampleOut(actions=actions.astype(jnp.int32),
                     action_probs=action_probs, durations=durations,
                     scanpath_length=scanpath_length, fix=fix,
                     fix_len=fix_len, action_mask=action_mask,
                     duration_mask=duration_mask)


def greedy_sample(probs: jnp.ndarray, mu: jnp.ndarray, sigma2: jnp.ndarray,
                  grid: GridSpec) -> SampleOut:
    """Deterministic decode: argmax actions (STOP masked for the first
    ``min_length`` steps, like the stochastic path) and median LogNormal
    durations ``exp(mu)``.

    The reference has no greedy decoder (its sampling is stochastic
    only, reference OSIE/models/sampling.py:16-34); this is the
    deterministic single-image serving path (BASELINE.json config 1).
    Returns the same :class:`SampleOut` layout as :func:`random_sample`,
    with ``action_probs`` = probability of the argmax action.
    """
    t = probs.shape[-2]
    masked = probs.at[..., :grid.min_length, 0].set(0.0)
    actions = jnp.argmax(masked, axis=-1)
    action_probs = jnp.take_along_axis(probs, actions[..., None],
                                       axis=-1)[..., 0]
    durations = jnp.exp(mu)

    is_stop = actions == 0
    idx = jnp.arange(t)
    stop_pos = jnp.where(is_stop & (idx >= 1), idx, t)
    scanpath_length = jnp.min(stop_pos, axis=-1)

    stopped_before = jnp.cumsum(is_stop, axis=-1) - is_stop > 0
    fixating = (~is_stop) & (~stopped_before)
    first_stop = is_stop & (~stopped_before)
    action_mask = (fixating | first_stop).astype(jnp.float32)
    duration_mask = fixating.astype(jnp.float32)

    cell = jnp.maximum(actions - 1, 0)
    px = (cell % grid.map_width) * grid.x_granularity + grid.x_granularity / 2
    py = (cell // grid.map_width) * grid.y_granularity + grid.y_granularity / 2
    fix = jnp.stack([px, py, durations], axis=-1) * duration_mask[..., None]
    fix_len = jnp.sum(duration_mask, axis=-1).astype(jnp.int32)

    return SampleOut(actions=actions.astype(jnp.int32),
                     action_probs=action_probs, durations=durations,
                     scanpath_length=scanpath_length, fix=fix,
                     fix_len=fix_len, action_mask=action_mask,
                     duration_mask=duration_mask)


def sample_checksum(sample: SampleOut) -> jnp.ndarray:
    """Device-side scalar that depends on every sampled fixation.

    The benchmark honesty barrier (bench.py, tools/bench_serving.py):
    materializing this scalar on the host is a true execution barrier
    even on tunneled backends where ``block_until_ready`` is advisory.
    Values are magnitude-clipped before reducing — a random-init model
    can emit astronomically large finite durations (exp of random
    logits) that would overflow the f32 sum and print unparseable
    JSON; the checksum only has to prove the work happened."""
    fix = jnp.clip(jnp.nan_to_num(sample.fix, nan=1.0, posinf=1e6,
                                  neginf=-1e6), -1e6, 1e6)
    return fix.astype(jnp.float32).sum() \
        + sample.fix_len.astype(jnp.float32).sum()


def to_fix_vectors(sample: SampleOut) -> list[np.ndarray]:
    """Host conversion: one structured fixation vector per batch element
    (the interchange format of the host metric suite)."""
    fix = np.asarray(sample.fix)
    lens = np.asarray(sample.fix_len)
    flat_fix = fix.reshape(-1, *fix.shape[-2:])
    flat_len = lens.reshape(-1)
    out = []
    for i in range(flat_fix.shape[0]):
        l = int(flat_len[i])
        v = np.empty(l, dtype=FIX_DTYPE)
        v["start_x"] = flat_fix[i, :l, 0]
        v["start_y"] = flat_fix[i, :l, 1]
        v["duration"] = flat_fix[i, :l, 2]
        out.append(v)
    return out
