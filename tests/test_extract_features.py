"""extract_image_features CLI (SURVEY.md §2.1 #6): the environment has no
torchvision, so a minimal mock backbone+transforms stack is injected to
exercise the REAL pipeline code — file listing, batching, PIL loading,
trunk slicing ([:-1] pool5 / [:-2] conv), the (B,2048,7,7)->(B,49,2048)
reshape, save_features, and row<->line alignment."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image


class _Resize:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        w, h = img.size
        scale = self.size / min(w, h)
        return img.resize((max(1, round(w * scale)), max(1, round(h * scale))))


class _CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        w, h = img.size
        left, top = (w - self.size) // 2, (h - self.size) // 2
        return img.crop((left, top, left + self.size, top + self.size))


class _ToTensor:
    def __call__(self, img):
        a = np.asarray(img, np.float32) / 255.0
        return torch.from_numpy(a.transpose(2, 0, 1).copy())


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(3, 1, 1)
        self.std = torch.tensor(std).view(3, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class _Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


class _FakeResNet50(torch.nn.Module):
    """children() = [stem, avgpool, fc] so the CLI's [:-1] / [:-2] slicing
    yields (B,2048,1,1) / (B,2048,7,7) exactly like the real ResNet-50."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.stem = torch.nn.Sequential(
            torch.nn.AdaptiveAvgPool2d(7),
            torch.nn.Conv2d(3, 2048, kernel_size=1, bias=False),
        )
        self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
        self.fc = torch.nn.Linear(2048, 1000)


@pytest.fixture
def fake_torchvision(monkeypatch):
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    transforms = types.ModuleType("torchvision.transforms")
    models.resnet50 = lambda weights=None: _FakeResNet50()
    transforms.Resize = _Resize
    transforms.CenterCrop = _CenterCrop
    transforms.ToTensor = _ToTensor
    transforms.Normalize = _Normalize
    transforms.Compose = _Compose
    tv.models = models
    tv.transforms = transforms
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.models", models)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", transforms)
    return tv


def _write_images(d, colors):
    names = []
    for i, c in enumerate(colors):
        name = f"img{i}.png"
        Image.new("RGB", (300, 260), c).save(os.path.join(d, name))
        names.append(name)
    with open(os.path.join(d, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


@pytest.mark.parametrize("feat_type,shape_tail", [("pool5", (2048,)), ("conv", (49, 2048))])
def test_extract_features_cli_end_to_end(fake_torchvision, tmp_path, feat_type, shape_tail):
    from variational_mmt_tpu.cli import extract_features as cli_ex

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (200, 200, 0), (0, 120, 120)]
    _write_images(str(tmp_path), colors)
    out = str(tmp_path / f"feats_{feat_type}.npy")
    cli_ex.main(["-images_dir", str(tmp_path), "-image_list", str(tmp_path / "list.txt"),
                 "-output", out, "-feat_type", feat_type, "-batch_size", "2"])
    feats = np.load(out)
    assert feats.shape == (5,) + shape_tail
    assert np.isfinite(feats).all()
    # alignment: distinct colors -> distinct rows; identical color -> identical row
    flat = feats.reshape(5, -1)
    for i in range(5):
        for j in range(i + 1, 5):
            assert not np.allclose(flat[i], flat[j])
    # determinism + order invariance to batch boundary (batch_size 2 vs 5)
    out2 = str(tmp_path / "feats2.npy")
    cli_ex.main(["-images_dir", str(tmp_path), "-image_list", str(tmp_path / "list.txt"),
                 "-output", out2, "-feat_type", feat_type, "-batch_size", "5"])
    np.testing.assert_allclose(np.load(out2), feats, rtol=1e-5)


def test_extract_features_errors_without_torchvision(tmp_path):
    from variational_mmt_tpu.cli import extract_features as cli_ex

    try:  # only meaningful where torchvision genuinely cannot import
        import torchvision  # noqa: F401
        pytest.skip("torchvision installed: the gating error cannot trigger")
    except ImportError:
        pass
    _write_images(str(tmp_path), [(1, 2, 3)])
    with pytest.raises(SystemExit, match="torchvision"):
        cli_ex.main(["-images_dir", str(tmp_path), "-image_list", str(tmp_path / "list.txt"),
                     "-output", str(tmp_path / "f.npy")])
