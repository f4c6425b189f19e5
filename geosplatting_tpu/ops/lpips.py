"""LPIPS perceptual metric (VGG backbone) — weight-gated.

The reference computes LPIPS via torchmetrics (photometric_loss.py:87-100),
which downloads pretrained VGG16 weights. This environment has zero egress
and no cached weights, so the exact metric cannot run; this module
implements the LPIPS computation graph in JAX and loads weights from
``GEOSPLAT_LPIPS_WEIGHTS`` (an .npz with vgg16 conv kernels + lpips linear
layer weights) when the user provides them. Without weights it raises
FileNotFoundError, which the eval tasks convert to ``lpips: None``."""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_VGG_SLICES = (
    ("conv1_1", "conv1_2"),
    ("conv2_1", "conv2_2"),
    ("conv3_1", "conv3_2", "conv3_3"),
    ("conv4_1", "conv4_2", "conv4_3"),
    ("conv5_1", "conv5_2", "conv5_3"),
)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@functools.lru_cache(maxsize=1)
def _load_weights():
    path = os.environ.get("GEOSPLAT_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS needs pretrained weights: set GEOSPLAT_LPIPS_WEIGHTS to an "
            ".npz with vgg16 conv kernels (convX_Y_w/b, HWIO) and lpips lin "
            "weights (linN_w)."
        )
    return dict(np.load(path))


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out + b)


def _features(weights, x):
    """x [N, H, W, 3] in [0,1] -> list of 5 normalized feature maps."""
    h = (x * 2.0 - 1.0 - _SHIFT) / _SCALE
    feats = []
    for i, slice_convs in enumerate(_VGG_SLICES):
        for name in slice_convs:
            h = _conv(h, weights[f"{name}_w"], weights[f"{name}_b"])
        norm = jnp.sqrt(jnp.sum(h * h, -1, keepdims=True) + 1e-10)
        feats.append(h / norm)
        if i < 4:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(pred: jnp.ndarray, target: jnp.ndarray) -> float:
    """LPIPS(vgg) between [..., H, W, 3] images in [0, 1]."""
    weights = _load_weights()
    p = pred.reshape((-1,) + pred.shape[-3:])
    t = target.reshape((-1,) + target.shape[-3:])
    fp = _features(weights, p)
    ft = _features(weights, t)
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, ft)):
        d = (a - b) ** 2
        lin = weights[f"lin{i}_w"].reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * lin, -1), axis=(1, 2))
    return float(jnp.mean(total))
