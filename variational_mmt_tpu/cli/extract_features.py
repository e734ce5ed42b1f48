"""``extract_image_features`` CLI — offline ResNet-50 feature dump
(SURVEY.md §2.1 #6): images dir + ordered file list -> HDF5/NPY with pool5
(2048-d global) and/or conv (7x7x2048 -> 49x2048) features, row i aligned to
corpus line i.

Two backends:

- ``jax`` (default when torchvision is absent): the TPU-native ResNet-50
  trunk in ``models/resnet.py`` — the canonical v1.5 inference computation
  as one jitted NHWC program, fed by torchvision-layout weights
  (``-weights resnet50.pth`` or ``.npz``; cross-checked to ~1e-3 against a
  torch-functional reference implementation in tests/test_resnet.py). Runs
  on whatever device JAX has — on TPU, extraction is a batched MXU conv
  pipeline instead of a host-CPU loop.
- ``torchvision`` (when installed): the stock pretrained
  ``resnet50(weights="IMAGENET1K_V1")``, as the reference pipeline used.

The pretrained weight FILE itself cannot be fetched in this build
environment (no egress); users supply it via ``-weights`` (the standard
torchvision ``resnet50-0676ba61.pth`` loads directly).
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
    p.add_argument("-backend", default="auto",
                   choices=["auto", "jax", "torchvision"],
                   help="auto: torchvision if importable and no -weights "
                        "given, else the TPU-native jax trunk")
    p.add_argument("-weights", default="",
                   help="torchvision-layout ResNet state_dict (.pth or "
                        ".npz) for the jax backend (e.g. the standard "
                        "resnet50 IMAGENET1K_V1 file)")


def extract_jax(images_dir: str, names: List[str], feat_type: str,
                batch_size: int, weights: str) -> np.ndarray:
    from PIL import Image

    from variational_mmt_tpu.models.resnet import (
        extract_features,
        load_weights,
        preprocess_image,
    )

    if not weights:
        raise SystemExit(
            "the jax backend needs -weights (a torchvision-layout ResNet "
            "state_dict, .pth or .npz); pretrained files cannot be "
            "downloaded from this environment. With torchvision installed, "
            "-backend torchvision uses its bundled download instead."
        )
    params = load_weights(weights)

    class _LazyImages:
        """Sequence facade that decodes+preprocesses images per access, so
        extract_features' per-batch slicing streams the corpus instead of
        materializing ~0.6 MB x N of preprocessed floats up front
        (a Multi30k-scale list would be ~18 GB host RAM)."""

        def __len__(self):
            return len(names)

        def __getitem__(self, i):
            if isinstance(i, slice):
                return [self[j] for j in range(*i.indices(len(names)))]
            return preprocess_image(Image.open(os.path.join(images_dir, names[i])))

    return extract_features(params, _LazyImages(), feat_type, batch_size)


def extract(images_dir: str, names: List[str], feat_type: str,
            batch_size: int, backend: str = "auto",
            weights: str = "") -> np.ndarray:
    if backend == "auto":
        try:
            import torchvision  # noqa: F401

            backend = "jax" if weights else "torchvision"
        except ImportError:
            backend = "jax"
    if backend == "jax":
        return extract_jax(images_dir, names, feat_type, batch_size, weights)
    try:
        import torch
        import torchvision
        from torchvision import transforms
    except ImportError as e:
        raise SystemExit(
            "torchvision is required for -backend torchvision but is not "
            f"installed ({e}). Use -backend jax with -weights, or supply "
            "precomputed features (HDF5/NPY, one row per corpus line), as "
            "the reference pipeline does."
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
    feats = extract(opt.images_dir, names, opt.feat_type, opt.batch_size,
                    backend=opt.backend, weights=opt.weights)
    save_features(opt.output, feats)
    print(f"wrote {feats.shape} features to {opt.output}")


if __name__ == "__main__":
    main()
