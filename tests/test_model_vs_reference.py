"""Whole-model forward parity against the EXECUTED reference.

Builds this framework's ScanpathModel (fused head, the production
configuration), exports its randomly initialized weights to the
reference's torch naming (models/port.py), loads them into the
reference's own ``baseline`` module — imported from
/root/reference/OSIE/models/baseline_attention.py and executed, not
replicated — and requires the two frameworks to produce the same
inference outputs on the same images.

This closes the loop the per-layer parity tests leave open: a shared
misreading of the architecture would have to fool torch and flax
simultaneously on the full 16-step recurrence to pass here.  It also
round-trips the checkpoint port: users can bring the reference's
released .pth models into this framework via
``port.import_reference_checkpoint`` (tested in reverse too).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from scanpaths_tpu.models.port import (  # noqa: E402
    export_reference_state_dict,
    import_reference_checkpoint,
)
from scanpaths_tpu.models.scanpath_model import create_model  # noqa: E402


REF_DIRS = {"osie": ("OSIE", "baseline_attention"),
            "air": ("AiR", "baseline_attention"),
            "coco": ("COCO_Search18", "baseline_attention_multihead")}


def _load_ref(task: str):
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    if "mmcv" not in sys.modules:
        mmcv_cnn = types.ModuleType("mmcv.cnn")
        for fn in ("xavier_init", "constant_init", "kaiming_init",
                   "normal_init"):
            setattr(mmcv_cnn, fn, lambda *a, **k: None)
        mmcv = types.ModuleType("mmcv")
        mmcv.cnn = mmcv_cnn
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.cnn"] = mmcv_cnn

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    ref_dir, ba_name = REF_DIRS[task]
    ref_resnet = load(f"ref_{task}_resnet_m",
                      f"/root/reference/{ref_dir}/models/resnet.py")
    models_pkg = types.ModuleType("models")
    models_pkg.resnet = ref_resnet
    sys.modules["models"] = models_pkg          # rebind per task dir
    sys.modules["models.resnet"] = ref_resnet
    ref_ba = load(f"ref_{task}_baseline_m",
                  f"/root/reference/{ref_dir}/models/{ba_name}.py")
    # keep baseline.__init__ offline: pretrained weights are overwritten
    # by load_state_dict right after construction anyway
    ref_ba.resnet50 = lambda pretrained=False: ref_resnet.resnet50(False)
    return ref_ba


def _build_pair(task: str, n: int):
    """(reference outputs, our outputs, variables, sd) for ``task`` with
    identical random-init weights and the same images."""
    model = create_model(task)              # full geometry, fused head
    rng = np.random.default_rng(0)
    images = rng.normal(size=(n, 240, 320, 3)).astype(np.float32)
    init_kw = {}
    ref_args = []
    if task in ("air", "coco"):
        amap = rng.uniform(0, 1, (n, 30, 40)).astype(np.float32)
        init_kw["attention_maps"] = jnp.asarray(amap[..., None])
        ref_args.append(torch.tensor(amap[:, None]))
    if task == "coco":
        tids = np.arange(n, dtype=np.int32) % 18
        init_kw["task_ids"] = jnp.asarray(tids)
        ref_args.append(torch.tensor(tids.astype(np.int64)))
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 240, 320, 3)), train=False,
        **{k2: v[:1] for k2, v in init_kw.items()}))(jax.random.PRNGKey(3))

    sd = export_reference_state_dict(variables["params"],
                                     variables["batch_stats"], task)

    ref_ba = _load_ref(task)
    ref = ref_ba.baseline(embed_size=512, convLSTM_length=16, min_length=1)
    ref.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    ref.eval()

    with torch.no_grad():
        want = ref.inference(
            torch.tensor(np.transpose(images, (0, 3, 1, 2))), *ref_args)

    got = jax.jit(lambda v, x: model.apply(v, x, train=False, **init_kw))(
        variables, jnp.asarray(images))
    return want, got, variables, sd


@pytest.fixture(scope="module")
def forward_pair():
    return _build_pair("osie", 2)


def _assert_outputs(want, got, keys, n, rtol=2e-3):
    for name in keys:
        w = want[name].numpy()
        if name.endswith("all_actions_prob"):
            w = w.reshape(n, 16, -1)
        g = np.asarray(got[name])
        assert g.shape == w.shape, name
        np.testing.assert_allclose(g, w, rtol=rtol, atol=2e-5,
                                   err_msg=name)


def test_forward_matches_executed_reference(forward_pair):
    want, got, _, _ = forward_pair
    _assert_outputs(want, got, ("all_actions_prob", "log_normal_mu",
                                "log_normal_sigma2"), 2)


def test_air_forward_matches_executed_reference():
    """Dual-stream AiR model (pos/neg signal gates, True/False head
    convs) vs the executed AiR reference."""
    want, got, _, _ = _build_pair("air", 1)
    _assert_outputs(want, got,
                    ("good_all_actions_prob", "good_log_normal_mu",
                     "good_log_normal_sigma2", "poor_all_actions_prob",
                     "poor_log_normal_mu", "poor_log_normal_sigma2"), 1)


def test_coco_forward_matches_executed_reference():
    """18-category head bank (gather+vmap fused kernels) vs the executed
    COCO multihead reference's per-sample ModuleDict dispatch."""
    want, got, _, _ = _build_pair("coco", 2)
    # rtol 5e-3: the bank's vmapped per-sample conv reorders f32
    # accumulation vs the reference's sequential dispatch (observed
    # worst case 3e-3 on 2 of 38k probs)
    _assert_outputs(want, got, ("all_actions_prob", "log_normal_mu",
                                "log_normal_sigma2"), 2, rtol=5e-3)


def test_checkpoint_port_roundtrip(forward_pair):
    """reference-naming state dict -> import_reference_checkpoint ->
    identical flax trees (the released-checkpoint loading path)."""
    _, _, variables, sd = forward_pair
    params, stats = import_reference_checkpoint(
        {"model": sd, "optimizer": {}}, task="osie")

    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-6, atol=1e-7, err_msg=str(pa))
    flat_sa = jax.tree_util.tree_flatten_with_path(
        variables["batch_stats"])[0]
    flat_sb = jax.tree_util.tree_flatten_with_path(stats)[0]
    for (pa, va), (pb, vb) in zip(flat_sa, flat_sb):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-6, atol=1e-7, err_msg=str(pa))
