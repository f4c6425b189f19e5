"""LPIPS graph validation (VERDICT r2 #8): the JAX computation graph in
ops/lpips.py is exercised end-to-end with a seeded random-weight fixture and
checked against an independent NumPy re-implementation of the same VGG16 /
LPIPS definition. Real pretrained weights cannot ship (zero egress); this
proves the graph so that supplying GEOSPLAT_LPIPS_WEIGHTS gives the real
metric (torchmetrics parity, photometric_loss.py:87-100)."""
import numpy as np
import pytest

from geosplatting_tpu.ops import lpips as L

_CHANNELS = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
]
_SLICE_DIMS = [64, 128, 256, 512, 512]


def _fixture_weights(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    w = {}
    for name, cin, cout in _CHANNELS:
        w[f"{name}_w"] = rng.normal(
            0, 0.08, size=(3, 3, cin, cout)
        ).astype(np.float32)
        w[f"{name}_b"] = rng.normal(0, 0.01, size=(cout,)).astype(np.float32)
    for i, c in enumerate(_SLICE_DIMS):
        w[f"lin{i}_w"] = np.abs(rng.normal(0, 0.1, size=(c,))).astype(np.float32)
    return w


def _np_conv_relu(x, w, b):
    """SAME 3x3 conv + relu, NHWC/HWIO — independent of jax.lax."""
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((n, h, wd, co), np.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy:dy + h, dx:dx + wd, :]        # [N,H,W,CI]
            out += np.einsum("nhwc,co->nhwo", patch, w[dy, dx], optimize=True)
    return np.maximum(out + b, 0.0)


def _np_lpips(weights, pred, target):
    def feats(x):
        h = (x * 2.0 - 1.0 - L._SHIFT) / L._SCALE
        out = []
        for i, convs in enumerate(L._VGG_SLICES):
            for name in convs:
                h = _np_conv_relu(h, weights[f"{name}_w"], weights[f"{name}_b"])
            norm = np.sqrt(np.sum(h * h, -1, keepdims=True) + 1e-10)
            out.append(h / norm)
            if i < 4:
                n_, hh, ww, c = h.shape
                h = h[:, : hh // 2 * 2, : ww // 2 * 2, :].reshape(
                    n_, hh // 2, 2, ww // 2, 2, c
                ).max(axis=(2, 4))
        return out

    fp, ft = feats(pred), feats(target)
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, ft)):
        d = (a - b) ** 2
        lin = weights[f"lin{i}_w"].reshape(1, 1, 1, -1)
        total = total + np.mean(np.sum(d * lin, -1), axis=(1, 2))
    return float(np.mean(total))


def test_lpips_graph_matches_numpy_reference(tmp_path, monkeypatch):
    weights = _fixture_weights()
    path = tmp_path / "lpips_fixture.npz"
    np.savez(path, **weights)
    monkeypatch.setenv("GEOSPLAT_LPIPS_WEIGHTS", str(path))
    L._load_weights.cache_clear()

    rng = np.random.default_rng(3)
    pred = rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32)
    target = np.clip(
        pred + rng.normal(0, 0.1, pred.shape).astype(np.float32), 0, 1
    )

    import jax.numpy as jnp

    got = L.lpips(jnp.asarray(pred), jnp.asarray(target))
    want = _np_lpips(weights, pred, target)
    assert got == pytest.approx(want, rel=2e-4, abs=1e-6)
    assert got > 0.0
    # identical images -> exactly zero distance
    same = L.lpips(jnp.asarray(pred), jnp.asarray(pred))
    assert same == pytest.approx(0.0, abs=1e-7)
    L._load_weights.cache_clear()


def test_lpips_without_weights_raises(monkeypatch):
    monkeypatch.delenv("GEOSPLAT_LPIPS_WEIGHTS", raising=False)
    L._load_weights.cache_clear()
    import jax.numpy as jnp

    x = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(FileNotFoundError):
        L.lpips(x, x)
    L._load_weights.cache_clear()
