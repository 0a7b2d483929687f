"""Parity test for import_resnet34_encoder: torchvision-format resnet34
weights -> UNet encoder params.

torchvision is not installed in this environment, so the state_dict is
produced by a hand-built torch module replicating torchvision's resnet34
encoder layout and naming exactly (conv1/bn1/layer{1-4}.{i}.conv{1,2}/
bn{1,2}/downsample.{0,1}); activations from the torch forward are the
golden values (same approach as test_encode_project_import.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

from dynamorph_tpu.models.torch_import import import_resnet34_encoder
from dynamorph_tpu.models.unet import UNet


class BasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = TF.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return TF.relu(h + idt)


class TorchResNet34Encoder(nn.Module):
    """Replicates torchvision resnet34's encoder layout and state_dict
    naming (torchvision.models.resnet34 without avgpool/fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch = 64
        for li, (n, ch) in enumerate(((3, 64), (4, 128), (6, 256), (3, 512))):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and li > 0) else 1
                blocks.append(BasicBlock(in_ch, ch, stride))
                in_ch = ch
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        h = TF.relu(self.bn1(self.conv1(x)))
        s2 = h
        h = TF.max_pool2d(h, 3, 2, 1)
        s4 = self.layer1(h)
        s8 = self.layer2(s4)
        s16 = self.layer3(s8)
        s32 = self.layer4(s16)
        return s2, s4, s8, s16, s32


@pytest.fixture(scope="module")
def torch_encoder_and_sd():
    torch.manual_seed(0)
    enc = TorchResNet34Encoder()
    # make running stats non-trivial so eval-mode BN parity is meaningful
    with torch.no_grad():
        enc.train()
        enc(torch.randn(4, 3, 64, 64))
        enc.eval()
    sd = {k: v.detach().cpu().numpy()
          for k, v in enc.state_dict().items()}
    # torchvision checkpoints also carry fc.*; the importer must ignore them
    sd["fc.weight"] = np.zeros((1000, 512), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    return enc, sd


def test_encoder_activation_parity(torch_encoder_and_sd):
    enc, sd = torch_encoder_and_sd
    rng = np.random.RandomState(1)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        golden = [t.numpy() for t in enc(torch.from_numpy(x))]

    model = UNet(n_channels=3)
    import jax
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    enc_p, enc_s = import_resnet34_encoder(sd)
    params = {**params, **enc_p}
    state = {**state, **enc_s}
    # identity pre_conv so the encoder sees the raw 3-channel input
    params["pre_conv"] = {"kernel": jnp.eye(3)[None, None],
                          "bias": jnp.zeros((3,))}

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    bottleneck, skips, _ = model._encode(params, state, x_nhwc, train=False)
    ours = [np.transpose(np.asarray(a), (0, 3, 1, 2))
            for a in skips + [bottleneck]]

    for name, g, o in zip(["s2", "s4", "s8", "s16", "s32"], golden, ours):
        assert g.shape == o.shape, name
        np.testing.assert_allclose(o, g, atol=2e-4, rtol=1e-4,
                                   err_msg=name)


def test_segment_accepts_encoder_weights(torch_encoder_and_sd):
    _, sd = torch_encoder_and_sd
    from dynamorph_tpu.seg.model import Segment

    seg = Segment(input_shape=(2, 64, 64), n_classes=3, encoder_weights=sd)
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(seg.params["stem"]["conv"]["kernel"]), want)
    # and running stats came from the checkpoint, not init
    np.testing.assert_allclose(np.asarray(seg.state["stem"]["bn"]["mean"]),
                               sd["bn1.running_mean"])
    # predictions still run
    probs = seg.predict(np.random.RandomState(0)
                        .rand(2, 2, 64, 64).astype(np.float32))
    assert probs.shape == (2, 3, 1, 64, 64)
    assert np.allclose(np.asarray(probs).sum(1), 1.0, atol=1e-5)
