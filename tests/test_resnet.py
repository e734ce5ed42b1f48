"""TPU-native ResNet-50 trunk (models/resnet.py) vs an INDEPENDENT
torch-functional reference implementation of the same architecture on
shared weights — the strongest extraction-parity check available without
torchvision (absent in this environment; SURVEY.md §2.1 #6's remaining
gap is only the pretrained-weight FILE, not the computation)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from variational_mmt_tpu.models.resnet import (  # noqa: E402
    BN_EPS,
    extract_features,
    load_weights,
    preprocess_image,
    resnet_apply,
    stage_sizes,
)


def make_state_dict(base=8, stages=(1, 1, 1, 1), seed=0):
    """Random weights in torchvision resnet layout (OIHW conv kernels,
    bn weight/bias/running stats). base=64, stages=(3,4,6,3) is ResNet-50."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, out_c, in_c, k):
        sd[name + ".weight"] = (rng.standard_normal((out_c, in_c, k, k))
                                * (0.5 / np.sqrt(in_c * k * k))).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", base, 3, 7)
    bn("bn1", base)
    inplanes = base
    for si, n_blocks in enumerate(stages, start=1):
        planes = base * (2 ** (si - 1))
        for bi in range(n_blocks):
            p = f"layer{si}.{bi}"
            conv(p + ".conv1", planes, inplanes, 1)
            bn(p + ".bn1", planes)
            conv(p + ".conv2", planes, planes, 3)
            bn(p + ".bn2", planes)
            conv(p + ".conv3", planes * 4, planes, 1)
            bn(p + ".bn3", planes * 4)
            if bi == 0:  # inplanes != planes*4 or stride 2
                conv(p + ".downsample.0", planes * 4, inplanes, 1)
                bn(p + ".downsample.1", planes * 4)
            inplanes = planes * 4
    return sd


def torch_resnet_forward(sd, x_nchw):
    """Independent reference: same architecture via torch functional ops
    (mirrors torchvision.models.resnet.Bottleneck v1.5, eval mode)."""
    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def tbn(x, p):
        return F.batch_norm(x, t[p + ".running_mean"], t[p + ".running_var"],
                            t[p + ".weight"], t[p + ".bias"],
                            training=False, eps=BN_EPS)

    x = F.conv2d(x_nchw, t["conv1.weight"], stride=2, padding=3)
    x = F.relu(tbn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for si, n_blocks in enumerate(stage_sizes(sd), start=1):
        for bi in range(n_blocks):
            p = f"layer{si}.{bi}"
            stride = 2 if (si > 1 and bi == 0) else 1
            idt = x
            out = F.relu(tbn(F.conv2d(x, t[p + ".conv1.weight"]), p + ".bn1"))
            out = F.relu(tbn(F.conv2d(out, t[p + ".conv2.weight"],
                                      stride=stride, padding=1), p + ".bn2"))
            out = tbn(F.conv2d(out, t[p + ".conv3.weight"]), p + ".bn3")
            if p + ".downsample.0.weight" in t:
                idt = tbn(F.conv2d(x, t[p + ".downsample.0.weight"],
                                   stride=stride), p + ".downsample.1")
            x = F.relu(out + idt)
    conv = x  # (B, C, h, w)
    pool5 = F.adaptive_avg_pool2d(x, 1).flatten(1)
    return pool5.numpy(), conv.permute(0, 2, 3, 1).flatten(1, 2).numpy()


def test_reduced_resnet_matches_torch_reference():
    sd = make_state_dict(base=8, stages=(1, 1, 1, 1))
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_pool, ref_conv = torch_resnet_forward(
            sd, torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    pool5, conv = resnet_apply(sd, imgs)
    np.testing.assert_allclose(np.asarray(pool5), ref_pool, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(conv), ref_conv, rtol=1e-4, atol=2e-4)


def test_full_resnet50_layout_shapes_and_numerics():
    """The REAL ResNet-50 layout (base 64, stages 3-4-6-3): stage inference,
    224 input -> pool5 (2048,) + conv (49, 2048), numerics vs torch on B=1."""
    sd = make_state_dict(base=64, stages=(3, 4, 6, 3), seed=2)
    assert stage_sizes(sd) == (3, 4, 6, 3)
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    pool5, conv = resnet_apply(sd, img)
    assert pool5.shape == (1, 2048) and conv.shape == (1, 49, 2048)
    with torch.no_grad():
        ref_pool, ref_conv = torch_resnet_forward(
            sd, torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pool5), ref_pool, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conv), ref_conv, rtol=1e-3, atol=5e-3)


def test_load_weights_npz_and_pth(tmp_path):
    sd = make_state_dict(base=8, stages=(1, 1, 1, 1))
    sd_extra = dict(sd)
    sd_extra["fc.weight"] = np.zeros((10, 128), np.float32)  # dropped
    sd_extra["bn1.num_batches_tracked"] = np.array(7, np.int64)  # dropped
    npz = tmp_path / "w.npz"
    np.savez(npz, **sd_extra)
    loaded = load_weights(str(npz))
    assert set(loaded) == set(sd)

    pth = tmp_path / "w.pth"
    torch.save({k: torch.as_tensor(v) for k, v in sd_extra.items()}, str(pth))
    loaded2 = load_weights(str(pth))
    assert set(loaded2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded2[k], sd[k])


def test_preprocess_matches_torchvision_semantics():
    """Resize-shorter-to-256 + center-crop-224 + normalize, reproduced
    with PIL directly (torchvision's own backend for PIL inputs)."""
    from PIL import Image

    rng = np.random.default_rng(4)

    def ref_for(raw, resized_wh, crop_lt):
        img = Image.fromarray(raw).resize(resized_wh, Image.BILINEAR)
        l, t = crop_lt
        img = img.crop((l, t, l + 224, t + 224))
        return (np.asarray(img, np.float32) / 255.0
                - np.array([0.485, 0.456, 0.406], np.float32)) \
            / np.array([0.229, 0.224, 0.225], np.float32)

    # hard-coded geometry encodes torchvision's semantics: long side
    # TRUNCATED (int), crop offsets via Python round (round-half-even)
    cases = [
        # (H, W) -> resized (w, h), crop (left, top)
        ((300, 400), (341, 256), (58, 16)),   # int(400*256/300)=341; round(58.5)=58 (banker's)
        ((466, 350), (256, 340), (16, 58)),   # int(466*256/350)=340, NOT round(340.84)=341
        ((479, 256), (256, 479), (16, 128)),  # round(127.5)=128 (banker's, up)
    ]
    for (H, W), resized, crop in cases:
        raw = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        out = preprocess_image(Image.fromarray(raw))
        assert out.shape == (224, 224, 3) and out.dtype == np.float32
        np.testing.assert_allclose(out, ref_for(raw, resized, crop),
                                   atol=1e-6, err_msg=str((H, W)))


def test_extract_features_pads_last_batch():
    sd = make_state_dict(base=8, stages=(1, 1, 1, 1))
    rng = np.random.default_rng(5)
    imgs = [rng.standard_normal((64, 64, 3)).astype(np.float32)
            for _ in range(5)]
    feats = extract_features(sd, imgs, "pool5", batch_size=4)
    assert feats.shape == (5, 256)  # base 8 -> 8*2^3*4 final channels
    # row 4 (padded batch) must equal its solo extraction
    solo = extract_features(sd, imgs[4:], "pool5", batch_size=4)
    np.testing.assert_allclose(feats[4], solo[0], rtol=1e-5, atol=1e-5)


def test_extract_cli_jax_backend_end_to_end(tmp_path):
    """Full CLI drive on the jax backend: real image files -> preprocess ->
    reduced ResNet -> .npy aligned to the list order; feats consumable by
    the training feature loader."""
    from PIL import Image

    from variational_mmt_tpu.cli.extract_features import main
    from variational_mmt_tpu.data.features import load_features

    rng = np.random.default_rng(6)
    names = []
    for i in range(3):
        arr = rng.integers(0, 256, (40 + 8 * i, 52, 3), dtype=np.uint8)
        name = f"img{i}.png"
        Image.fromarray(arr).save(tmp_path / name)
        names.append(name)
    (tmp_path / "list.txt").write_text("\n".join(names) + "\n")
    sd = make_state_dict(base=8, stages=(1, 1, 1, 1))
    np.savez(tmp_path / "w.npz", **sd)
    out = tmp_path / "feats.npy"
    main(["-images_dir", str(tmp_path), "-image_list", str(tmp_path / "list.txt"),
          "-output", str(out), "-backend", "jax",
          "-weights", str(tmp_path / "w.npz"), "-batch_size", "2"])
    feats = load_features(str(out))
    assert feats.shape == (3, 256)
    # alignment: row i is a pure function of image i (re-extract one solo)
    from variational_mmt_tpu.cli.extract_features import extract_jax
    solo = extract_jax(str(tmp_path), [names[1]], "pool5", 2,
                       str(tmp_path / "w.npz"))
    np.testing.assert_allclose(feats[1], solo[0], rtol=1e-5, atol=1e-5)


def test_extract_cli_jax_backend_requires_weights(tmp_path):
    from variational_mmt_tpu.cli.extract_features import extract_jax

    with pytest.raises(SystemExit, match="-weights"):
        extract_jax(str(tmp_path), ["a.png"], "pool5", 2, "")
