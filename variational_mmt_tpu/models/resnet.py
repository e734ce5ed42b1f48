"""TPU-native ResNet-50 feature trunk for offline image-feature extraction
(SURVEY.md §2.1 #6: the reference consumed pool5/conv features from a
torchvision ResNet-50).

This environment has no torchvision (and no egress to fetch pretrained
weights), so the extraction CLI was previously gated on an import that can
never succeed here. This module removes the torchvision dependency: the
canonical ResNet-50 v1.5 inference trunk (conv1 -> bn -> relu -> maxpool ->
4 bottleneck stages -> global avgpool), implemented as a pure jit-able JAX
function over a weight dict in **torchvision state_dict layout** — so a
user drops in the standard `resnet50-*.pth` (IMAGENET1K_V1) file and gets
the exact reference computation, running on TPU.

Design notes (TPU-first):
- inference-only: BatchNorm is the affine running-stats transform; no
  träin state, no flax module machinery — a weight dict + one jitted
  function, NHWC layout throughout (XLA's preferred conv layout on TPU),
  kernels transposed from torch's OIHW once at load.
- stride placement follows torchvision's Bottleneck (stride on the 3x3,
  "v1.5"), which is what the published IMAGENET1K weights assume.
- the stage structure is INFERRED from the state_dict keys, so reduced
  variants (tests) and wider/deeper ResNets load through the same path.

Numerical contract: `resnet_apply` matches an independent torch-functional
reference implementation of the same architecture to ~1e-4 on shared
weights (tests/test_resnet.py) — the strongest cross-check available
without the torchvision package itself.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

BN_EPS = 1e-5
# ImageNet preprocessing constants (torchvision transforms defaults)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_weights(path: str) -> Dict[str, np.ndarray]:
    """Load a ResNet state_dict from a torch ``.pth`` (requires torch) or a
    ``.npz`` (no torch needed). Returns {torchvision_key: float32 array};
    the classifier head (``fc.*``) and bookkeeping buffers are dropped."""
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch

        try:
            sd = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # a pickled full nn.Module (weights_only refuses it) or other
            # legacy pickle — same fallback contract as the torch importer:
            # restricted load first, warned full unpickling second
            import warnings

            warnings.warn(
                f"{path}: restricted (weights_only) torch.load failed; "
                "falling back to full unpickling — only load files you trust")
            sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):  # a full module was saved
            sd = sd.state_dict()
        raw = {k: v.numpy() for k, v in sd.items()}
    return {
        k: np.asarray(v, np.float32)
        for k, v in raw.items()
        if not k.startswith("fc.") and not k.endswith("num_batches_tracked")
    }


def stage_sizes(params: Dict[str, np.ndarray]) -> Tuple[int, ...]:
    """Infer [n_blocks per stage] from layer{i}.{j}.* keys."""
    counts = {}
    for k in params:
        m = re.match(r"layer(\d+)\.(\d+)\.", k)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            counts[s] = max(counts.get(s, 0), b + 1)
    if not counts:
        raise ValueError("no layer{i}.{j}.* keys — not a ResNet state_dict")
    return tuple(counts[i] for i in sorted(counts))


def _conv(x, w_oihw, stride: int, pad: int):
    import jax.lax as lax
    import jax.numpy as jnp

    w = jnp.transpose(jnp.asarray(w_oihw), (2, 3, 1, 0))  # OIHW -> HWIO
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, params, prefix: str):
    import jax.numpy as jnp

    g = jnp.asarray(params[prefix + ".weight"])
    b = jnp.asarray(params[prefix + ".bias"])
    m = jnp.asarray(params[prefix + ".running_mean"])
    v = jnp.asarray(params[prefix + ".running_var"])
    # fold into one scale/shift (inference-mode BN)
    scale = g * jnp.reciprocal(jnp.sqrt(v + BN_EPS))
    return x * scale + (b - m * scale)


def _bottleneck(x, params, prefix: str, stride: int):
    import jax.nn as jnn

    identity = x
    out = _conv(x, params[f"{prefix}.conv1.weight"], 1, 0)
    out = jnn.relu(_bn(out, params, f"{prefix}.bn1"))
    # v1.5: the stride lives on the 3x3 (what IMAGENET1K weights assume)
    out = _conv(out, params[f"{prefix}.conv2.weight"], stride, 1)
    out = jnn.relu(_bn(out, params, f"{prefix}.bn2"))
    out = _conv(out, params[f"{prefix}.conv3.weight"], 1, 0)
    out = _bn(out, params, f"{prefix}.bn3")
    if f"{prefix}.downsample.0.weight" in params:
        identity = _bn(_conv(x, params[f"{prefix}.downsample.0.weight"],
                             stride, 0),
                       params, f"{prefix}.downsample.1")
    return jnn.relu(out + identity)


def resnet_apply(params: Dict[str, np.ndarray], images_nhwc):
    """Run the trunk. ``images_nhwc``: (B, H, W, 3) float32, already
    normalized. Returns ``(pool5 (B, C), conv (B, h*w, C))`` — for 224x224
    inputs on ResNet-50, (B, 2048) and (B, 49, 2048)."""
    import jax.lax as lax
    import jax.nn as jnn
    import jax.numpy as jnp

    x = _conv(images_nhwc, params["conv1.weight"], 2, 3)
    x = jnn.relu(_bn(x, params, "bn1"))
    # maxpool 3x3 stride 2 pad 1
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for si, n_blocks in enumerate(stage_sizes(params), start=1):
        for bi in range(n_blocks):
            stride = 2 if (si > 1 and bi == 0) else 1
            x = _bottleneck(x, params, f"layer{si}.{bi}", stride)
    B, h, w, C = x.shape
    conv = x.reshape(B, h * w, C)
    pool5 = jnp.mean(x, axis=(1, 2))
    return pool5, conv


def preprocess_image(img, size: int = 224, resize_to: int = 256) -> np.ndarray:
    """PIL image -> normalized (size, size, 3) float32 — exactly
    torchvision's Resize(256) + CenterCrop(224) + ToTensor + Normalize:
    bilinear resize of the shorter side with the long side TRUNCATED to
    int (torchvision F.resize semantics), crop offsets via Python round()
    (round-half-even, torchvision F.center_crop). Pixel-exact parity with
    the torchvision backend matters here: a one-pixel grid shift changes
    the extracted features."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    if w <= h:
        nw, nh = resize_to, max(1, int(h * resize_to / w))
    else:
        nh, nw = resize_to, max(1, int(w * resize_to / h))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def extract_features(
    params: Dict[str, np.ndarray],
    images: "list",
    feat_type: str = "pool5",
    batch_size: int = 32,
) -> np.ndarray:
    """Batched jitted extraction over preprocessed (H, W, 3) arrays.
    Returns (N, C) for pool5 or (N, h*w, C) for conv. The final partial
    batch is padded to ``batch_size`` so one compiled program serves the
    whole corpus (static shapes)."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda p, x: resnet_apply(p, x))
    out = []
    n = len(images)
    for s in range(0, n, batch_size):
        chunk = images[s:s + batch_size]
        pad = batch_size - len(chunk)
        batch = np.stack(list(chunk) + [np.zeros_like(chunk[0])] * pad)
        pool5, conv = fn(params, jnp.asarray(batch))
        got = np.asarray(pool5 if feat_type == "pool5" else conv)
        out.append(got[: len(chunk)])
    return np.concatenate(out, axis=0)
