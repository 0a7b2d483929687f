"""Offline ImageNet-baseline extractor: torchvision-format resnet50 weight
import parity (hand-built torch bottleneck net, same approach as
test_unet_encoder_import.py) + end-to-end offline feature extraction."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

from dynamorph_tpu.analysis import imagenet_baseline as ib


class Bottleneck(nn.Module):
    def __init__(self, in_ch, mid_ch, stride):
        super().__init__()
        out_ch = mid_ch * 4
        self.conv1 = nn.Conv2d(in_ch, mid_ch, 1, 1, 0, bias=False)
        self.bn1 = nn.BatchNorm2d(mid_ch)
        self.conv2 = nn.Conv2d(mid_ch, mid_ch, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid_ch)
        self.conv3 = nn.Conv2d(mid_ch, out_ch, 1, 1, 0, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = TF.relu(self.bn1(self.conv1(x)))
        h = TF.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return TF.relu(h + idt)


class TorchResNet50(nn.Module):
    """torchvision resnet50 layout/naming (without fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch = 64
        for li, (n, mid) in enumerate(((3, 64), (4, 128), (6, 256), (3, 512))):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and li > 0) else 1
                blocks.append(Bottleneck(in_ch, mid, stride))
                in_ch = mid * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        h = TF.relu(self.bn1(self.conv1(x)))
        h = TF.max_pool2d(h, 3, 2, 1)
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        return h.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def torch_r50_and_sd():
    torch.manual_seed(0)
    net = TorchResNet50()
    with torch.no_grad():
        net.train()
        net(torch.randn(2, 3, 64, 64))
        net.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # must be ignored
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    return net, sd


def test_feature_parity_vs_torch(torch_r50_and_sd):
    net, sd = torch_r50_and_sd
    model, params, state = ib.initiate_model(weights=sd)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        golden = net(torch.from_numpy(x)).numpy()
    ours = model.encode_batched(params, state, x, out="h", batch_size=2)
    assert ours.shape == golden.shape == (2, 2048)
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_extract_features_offline(rng, torch_r50_and_sd):
    """The baseline extracts features with no network access: local weights
    (or random init), synthetic patches, small inference size."""
    _, sd = torch_r50_and_sd
    model, params, state = ib.initiate_model(weights=sd)
    patches = (rng.rand(3, 2, 32, 32) * 60000).astype(np.uint16)
    feats = ib.extract_features(patches, model, params, state,
                                cs=(0, 1), batch_size=4, size=64)
    assert feats.shape == (3, 2, 2048)
    assert np.isfinite(feats).all()
    # different channels give different features
    assert not np.allclose(feats[:, 0], feats[:, 1])


def test_extract_features_from_h5(rng, tmp_path, torch_r50_and_sd):
    import h5py

    _, sd = torch_r50_and_sd
    paths = []
    for i in range(2):
        p = str(tmp_path / f"cell_{i}.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("masked_mat",
                             data=(rng.rand(32, 32, 2) * 60000)
                             .astype(np.uint16))
        paths.append(p)
    model, params, state = ib.initiate_model(weights=sd)
    feats = ib.extract_features(paths, model, params, state, cs=(0, 1),
                                batch_size=4, size=64)
    assert feats.shape == (2, 2, 2048)
    assert np.isfinite(feats).all()


def test_extract_features_cs_none(rng):
    """cs=None (all channels, as preprocess supports) must reshape by the
    data's channel count instead of crashing on tuple(None)."""
    from dynamorph_tpu.analysis import imagenet_baseline as ib

    class FakeModel:
        def encode_batched(self, params, state, x, out, batch_size):
            return np.ones((len(x), 7), np.float32)

    patches = rng.rand(3, 2, 16, 16).astype(np.float32)
    feats = ib.extract_features(patches, FakeModel(), None, None,
                                cs=None, size=16)
    assert feats.shape == (3, 2, 7)


def test_read_file_path(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.h5").write_bytes(b"0")
    (tmp_path / "y.h5").write_bytes(b"0")
    (tmp_path / "z.txt").write_bytes(b"0")
    fs = ib.read_file_path(str(tmp_path))
    assert len(fs) == 2 and all(f.endswith(".h5") for f in fs)
