"""Pretrained-backbone port proof: a torch ResNet-50 (old torchvision
naming, Caffe-style strides + the SAM dilation patch — reference
OSIE/models/resnet.py:57-130 and baseline_attention.py:212-224) with a
RANDOM state dict must produce the same stride-8 features as
DilatedResNet50 after `load_torch_state_dict` conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from scanpaths_tpu.models.resnet import (DilatedResNet50,  # noqa: E402
                                         load_torch_state_dict)


class TorchBottleneck(nn.Module):
    """Caffe-style bottleneck: stride on the 1x1 conv1 (reference
    resnet.py:63); 3x3 conv2 carries the dilation."""

    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


class TorchDilatedResNet50(nn.Module):
    """Stride-8 trunk with old-torchvision parameter naming
    (conv1/bn1/layer{1-4}.{i}...) so its state_dict feeds the
    converter exactly like resnet50-19c8e357.pth would."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=0, ceil_mode=True)
        stages = [(64, 1, 1, 3), (128, 1, 1, 4), (256, 2, 2, 6),
                  (512, 1, 4, 3)]
        cin = 64
        for si, (planes, stride, dilation, blocks) in enumerate(stages, 1):
            layers = []
            for bi in range(blocks):
                layers.append(TorchBottleneck(
                    cin, planes, stride=stride if bi == 0 else 1,
                    dilation=dilation, downsample=(bi == 0)))
                cin = planes * 4
            setattr(self, f"layer{si}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for si in range(1, 5):
            x = getattr(self, f"layer{si}")(x)
        return x


def test_torch_state_dict_port():
    torch.manual_seed(0)
    model = TorchDilatedResNet50()
    # randomize BN affine params and running stats so the conversion of
    # every tensor kind is exercised (an untouched BN would hide swaps)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()

    x = torch.randn(2, 3, 80, 96)
    with torch.no_grad():
        want = model(x).numpy()                    # NCHW [2, 2048, 10, 12]

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, stats = load_torch_state_dict(sd)
    flax_model = DilatedResNet50()
    got = jax.jit(lambda v, y: flax_model.apply(v, y, train=False))(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))  # NHWC
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    assert got.shape == want.shape == (2, 2048, 10, 12)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_converter_covers_full_state_dict():
    """Every torch tensor must land somewhere in the flax trees (no
    silently dropped weights), and the trees must typecheck against a
    fresh DilatedResNet50 init."""
    model = TorchDilatedResNet50()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, stats = load_torch_state_dict(sd)
    n_torch = sum(v.size for k, v in sd.items()
                  if "num_batches_tracked" not in k)
    n_flax = sum(np.asarray(x).size
                 for x in jax.tree_util.tree_leaves((params, stats)))
    assert n_torch == n_flax

    ref = DilatedResNet50()
    variables = jax.eval_shape(
        lambda k: ref.init(k, jnp.zeros((1, 80, 96, 3)), train=False),
        jax.random.PRNGKey(0))
    want_shapes = jax.tree.map(lambda x: x.shape, variables["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert want_shapes == got_shapes
