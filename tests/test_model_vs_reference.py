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


def _load_ref_osie():
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

    ref_resnet = load("ref_osie_resnet_m",
                      "/root/reference/OSIE/models/resnet.py")
    models_pkg = types.ModuleType("models")
    models_pkg.resnet = ref_resnet
    sys.modules.setdefault("models", models_pkg)
    sys.modules.setdefault("models.resnet", ref_resnet)
    ref_ba = load("ref_osie_baseline_m",
                  "/root/reference/OSIE/models/baseline_attention.py")
    # keep baseline.__init__ offline: pretrained weights are overwritten
    # by load_state_dict right after construction anyway
    ref_ba.resnet50 = lambda pretrained=False: ref_resnet.resnet50(False)
    return ref_ba


@pytest.fixture(scope="module")
def forward_pair():
    model = create_model("osie")            # full geometry, fused head
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 240, 320, 3)).astype(np.float32)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 240, 320, 3)), train=False))(jax.random.PRNGKey(3))

    sd = export_reference_state_dict(variables["params"],
                                     variables["batch_stats"], "osie")

    ref_ba = _load_ref_osie()
    ref = ref_ba.baseline(embed_size=512, convLSTM_length=16, min_length=1)
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True), None
    ref.eval()

    with torch.no_grad():
        want = ref.inference(
            torch.tensor(np.transpose(images, (0, 3, 1, 2))))

    got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(images))
    return want, got, variables, sd


def test_forward_matches_executed_reference(forward_pair):
    want, got, _, _ = forward_pair
    pairs = [
        ("all_actions_prob", np.asarray(got["all_actions_prob"]),
         want["all_actions_prob"].numpy().reshape(2, 16, -1)),
        ("log_normal_mu", np.asarray(got["log_normal_mu"]),
         want["log_normal_mu"].numpy()),
        ("log_normal_sigma2", np.asarray(got["log_normal_sigma2"]),
         want["log_normal_sigma2"].numpy()),
    ]
    for name, g, w in pairs:
        assert g.shape == w.shape, name
        np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-5,
                                   err_msg=name)


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
