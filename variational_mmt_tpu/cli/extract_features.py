"""``extract_image_features`` CLI — offline ResNet-50 feature dump
(SURVEY.md §2.1 #6): images dir + ordered file list -> HDF5/NPY with pool5
(2048-d global) and/or conv (7x7x2048 -> 49x2048) features, row i aligned to
corpus line i.

This environment ships torch (CPU) but NOT torchvision, so the extractor is
gated: with torchvision available it runs a standard pretrained ResNet-50;
without it, it errors with instructions (precomputed feature files are the
normal path — the reference likewise consumed pre-extracted features).
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

from variational_mmt_tpu.data.features import save_features


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-images_dir", required=True)
    p.add_argument("-image_list", required=True, help="file: one image filename per corpus line")
    p.add_argument("-output", required=True, help=".npy or .h5 output")
    p.add_argument("-feat_type", default="pool5", choices=["pool5", "conv"])
    p.add_argument("-batch_size", type=int, default=32)


def extract(images_dir: str, names: List[str], feat_type: str, batch_size: int) -> np.ndarray:
    try:
        import torch
        import torchvision
        from torchvision import transforms
    except ImportError as e:
        raise SystemExit(
            "torchvision is required for feature extraction but is not installed "
            f"in this environment ({e}). Supply precomputed features instead "
            "(HDF5/NPY, one row per corpus line), as the reference pipeline does."
        )

    model = torchvision.models.resnet50(weights="IMAGENET1K_V1")
    model.eval()
    if feat_type == "pool5":
        trunk = torch.nn.Sequential(*list(model.children())[:-1])  # -> (B, 2048, 1, 1)
    else:
        trunk = torch.nn.Sequential(*list(model.children())[:-2])  # -> (B, 2048, 7, 7)
    prep = transforms.Compose([
        transforms.Resize(256),
        transforms.CenterCrop(224),
        transforms.ToTensor(),
        transforms.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
    ])
    from PIL import Image

    feats = []
    with torch.no_grad():
        for s in range(0, len(names), batch_size):
            imgs = [prep(Image.open(os.path.join(images_dir, n)).convert("RGB"))
                    for n in names[s : s + batch_size]]
            out = trunk(torch.stack(imgs))
            if feat_type == "pool5":
                feats.append(out.squeeze(-1).squeeze(-1).numpy())
            else:
                feats.append(out.permute(0, 2, 3, 1).reshape(out.shape[0], 49, 2048).numpy())
    return np.concatenate(feats, axis=0)


def main(argv=None) -> None:
    p = argparse.ArgumentParser("vmmt-tpu extract_image_features")
    add_args(p)
    opt = p.parse_args(argv)
    with open(opt.image_list, encoding="utf-8") as f:
        names = [line.strip() for line in f if line.strip()]
    feats = extract(opt.images_dir, names, opt.feat_type, opt.batch_size)
    save_features(opt.output, feats)
    print(f"wrote {feats.shape} features to {opt.output}")


if __name__ == "__main__":
    main()
