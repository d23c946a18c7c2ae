"""Fused Pallas ConvLSTM decode step (ops/pallas_cell.py) vs the XLA cell.

The kernel recomputes the whole per-step update — 3x3 gate conv, the
factorized task-signal taps, and the state update — in one VMEM-resident
program over a flat padded-row layout.  These tests pin, in interpret
mode on CPU:

* numerical equivalence with the direct XLA formulation of the same
  math (reference semantics: OSIE/models/baseline_attention.py:33-48,
  incl. the no-tanh-on-c quirk);
* the layout invariants the next step DEPENDS on — the halo ring and
  the junk pad columns of the output must be exactly zero, because the
  following step's shifted-slice conv taps read them as implicit
  padding;
* full-model equivalence: cell_impl="interpret" vs "xla" produce the
  same forward outputs for all three task plugins from shared weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanpaths_tpu.models.scanpath_model import create_model
from scanpaths_tpu.ops import pallas_cell as pc


def _xla_cell(hg, cg, xg, smem, kpn, K):
    """Direct XLA statement of the fused cell math (the oracle)."""
    n, h, w, c = hg.shape
    hgp = jax.lax.conv_general_dilated(
        hg, K, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    acc = xg + hgp
    spad = jnp.pad(smem, ((0, 0), (1, 1), (1, 1)))
    sg = jnp.zeros((n, h, w, 3 * c))
    for idx, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)):
        sg = sg + spad[:, dy:dy + h, dx:dx + w, None] * kpn[:, None, None, idx, :]
    i = jax.nn.sigmoid(acc[..., :c] + sg[..., :c])
    f = jax.nn.sigmoid(acc[..., c:2 * c] + sg[..., c:2 * c])
    o = jax.nn.sigmoid(acc[..., 2 * c:3 * c] + sg[..., 2 * c:])
    g_ = jnp.tanh(acc[..., 3 * c:])
    cn = f * cg + i * g_
    return o * cn, cn  # reference quirk: no tanh on c


def test_cell_step_matches_xla_and_keeps_layout_invariants():
    h, w, c, n = 6, 8, 128, 3
    geo = pc.geometry(h, w)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    f32 = jnp.float32
    hg = jax.random.normal(ks[0], (n, h, w, c), f32)
    cg = jax.random.normal(ks[1], (n, h, w, c), f32)
    xg = jax.random.normal(ks[2], (n, h, w, 4 * c), f32) * 0.1
    smem = jax.random.normal(ks[3], (n, h, w), f32)
    kpn = jax.random.normal(ks[4], (n, 9, 3 * c), f32) * 0.1
    K = jax.random.normal(ks[5], (3, 3, c, 4 * c), f32) * 0.05

    hn_ref, cn_ref = _xla_cell(hg, cg, xg, smem, kpn, K)

    bo, rb = geo["bo"], geo["rb"]
    hh = pc.zeros_halo(n, c, h, w, f32).at[:, bo:bo + rb].set(
        jnp.pad(hg, ((0, 0), (0, 0), (0, 2), (0, 0))).reshape(n, rb, c))
    ho, co = pc.cell_step(
        hh, pc.grid_to_body(cg, h, w), pc.grid_to_body(xg, h, w),
        pc.signal_taps(smem, h, w, f32), pc.signal_kp_pad(kpn, f32),
        pc.gate_kernel_flat(K, f32), h, w, interpret=True)

    np.testing.assert_allclose(pc.halo_to_grid(ho, h, w), hn_ref,
                               atol=5e-6, rtol=1e-5)
    np.testing.assert_allclose(pc.body_to_grid(co, h, w), cn_ref,
                               atol=5e-6, rtol=1e-5)

    # layout invariants the NEXT step depends on (implicit conv padding)
    ring = np.asarray(ho)
    assert np.abs(ring[:, :bo]).max() == 0.0
    assert np.abs(ring[:, bo + geo["rp"]:]).max() == 0.0
    body = ring[:, bo:bo + rb].reshape(n, h, geo["w2"], c)
    assert np.abs(body[:, :, w:]).max() == 0.0
    cbody = np.asarray(co)
    assert np.abs(cbody[:, rb:]).max() == 0.0


def test_two_signal_streams_sum():
    """AiR packs two signal streams into one kernel matmul (lane groups
    16i..16i+9); their contributions must sum exactly."""
    h, w, c, n = 4, 6, 128, 2
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    f32 = jnp.float32
    geo = pc.geometry(h, w)
    smem = [jax.random.normal(ks[i], (n, h, w), f32) for i in (0, 1)]
    kpn = [jax.random.normal(ks[2 + i], (n, 9, 3 * c), f32) * 0.1
           for i in (0, 1)]
    xg = jax.random.normal(ks[4], (n, h, w, 4 * c), f32) * 0.1
    K = jax.random.normal(ks[5], (3, 3, c, 4 * c), f32) * 0.05
    hg = jax.random.normal(ks[6], (n, h, w, c), f32)
    cg = jnp.zeros((n, h, w, c), f32)

    # oracle: the reference math with both streams' gate taps summed
    def ref_two(hg, cg, xg, smems, kpns, K):
        c_ = hg.shape[-1]
        hgp = jax.lax.conv_general_dilated(
            hg, K, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = xg + hgp
        sg = jnp.zeros((n, h, w, 3 * c_))
        for s, kpn_ in zip(smems, kpns):
            spad = jnp.pad(s, ((0, 0), (1, 1), (1, 1)))
            for idx, (dy, dx) in enumerate(
                    (dy, dx) for dy in range(3) for dx in range(3)):
                sg = sg + (spad[:, dy:dy + h, dx:dx + w, None]
                           * kpn_[:, None, None, idx, :])
        i = jax.nn.sigmoid(acc[..., :c_] + sg[..., :c_])
        f = jax.nn.sigmoid(acc[..., c_:2 * c_] + sg[..., c_:2 * c_])
        o = jax.nn.sigmoid(acc[..., 2 * c_:3 * c_] + sg[..., 2 * c_:])
        g_ = jnp.tanh(acc[..., 3 * c_:])
        cn = f * cg + i * g_
        return o * cn, cn

    hn_ref, cn_ref = ref_two(hg, cg, xg, smem, kpn, K)

    bo, rb = geo["bo"], geo["rb"]
    hh = pc.zeros_halo(n, c, h, w, f32).at[:, bo:bo + rb].set(
        jnp.pad(hg, ((0, 0), (0, 0), (0, 2), (0, 0))).reshape(n, rb, c))
    st = jnp.concatenate(
        [pc.signal_taps(s, h, w, f32) for s in smem], axis=-1)
    kp = jnp.concatenate(
        [pc.signal_kp_pad(k, f32) for k in kpn], axis=1)
    ho, co = pc.cell_step(
        hh, pc.grid_to_body(cg, h, w), pc.grid_to_body(xg, h, w),
        st, kp, pc.gate_kernel_flat(K, f32), h, w, interpret=True)
    np.testing.assert_allclose(pc.halo_to_grid(ho, h, w), hn_ref,
                               atol=5e-6, rtol=1e-5)
    np.testing.assert_allclose(pc.body_to_grid(co, h, w), cn_ref,
                               atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("task", ["osie", "air", "coco"])
def test_model_forward_matches_xla_cell(task):
    """cell_impl="interpret" (the Pallas step) == cell_impl="xla" on the
    full model forward, from SHARED weights, for every task plugin."""
    n, hh, ww = 2, 80, 80
    kw = dict(map_h=10, map_w=10, seq_len=4, embed=64,
              backbone_layers=(1, 1, 1, 1))
    m_x = create_model(task, cell_impl="xla", **kw)
    m_p = create_model(task, cell_impl="interpret", **kw)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (n, hh, ww, 3),
                             jnp.float32)
    att = (jax.random.uniform(jax.random.PRNGKey(1), (n, 10, 10, 1))
           if task != "osie" else None)
    tids = jnp.array([0, 1], jnp.int32) if task == "coco" else None
    vs = m_x.init(jax.random.PRNGKey(2), imgs, attention_maps=att,
                  task_ids=tids, train=False)
    ox = m_x.apply(vs, imgs, attention_maps=att, task_ids=tids,
                   train=False)
    op = m_p.apply(vs, imgs, attention_maps=att, task_ids=tids,
                   train=False)
    for k in ox:
        np.testing.assert_allclose(np.asarray(op[k]), np.asarray(ox[k]),
                                    atol=2e-4, rtol=1e-4, err_msg=k)
