"""Host-side image IO (parity: ``rfstudio/io/_image.py:15-78``): float32
loads for png/jpg (PIL) and exr/hdr (imageio, when a plugin is available),
optional mask compositing, and float32 dumps."""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def load_float32_image(path: Path | str) -> np.ndarray:
    """[H, W, C] float32; LDR formats are returned in [0, 1] (sRGB-encoded
    values as stored), HDR formats in linear radiance."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".tif", ".webp"):
        img = np.asarray(Image.open(path))
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        elif img.dtype == np.uint16:
            img = img.astype(np.float32) / 65535.0
        else:
            img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        return img
    if suffix in (".exr", ".hdr"):
        # cv2 first: it decodes Radiance RGBE to true float (the reference's
        # loader, rfstudio/io/_image.py:21-24); imageio's default HDR read
        # tone-maps to uint8, which would silently hand 0-255 LDR to callers
        try:
            import cv2

            img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if img is not None:
                img = np.asarray(img).astype(np.float32)
                if img.ndim == 3 and img.shape[-1] >= 3:
                    img = img[..., [2, 1, 0] + list(range(3, img.shape[-1]))]
                if img.ndim == 2:
                    img = img[..., None]
                return img
        except ImportError:
            pass
        import imageio.v3 as iio

        img = np.asarray(iio.imread(path))
        if img.dtype == np.uint8:
            raise ValueError(
                f"HDR load of {path} produced uint8 (no float-capable "
                "plugin); install cv2 or an EXR plugin"
            )
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        return img
    raise ValueError(f"unsupported image format: {path}")


def load_masked_image(
    image_path: Path | str, mask_path: Path | str | None = None
) -> np.ndarray:
    """RGBA [H, W, 4]: alpha from the image itself or a separate mask file."""
    img = load_float32_image(image_path)
    if mask_path is not None:
        mask = load_float32_image(mask_path)[..., :1]
        return np.concatenate((img[..., :3], mask), axis=-1)
    if img.shape[-1] == 4:
        return img
    return np.concatenate((img, np.ones_like(img[..., :1])), axis=-1)


def dump_float32_image(path: Path | str, img: np.ndarray) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    suffix = path.suffix.lower()
    if suffix in (".png", ".jpg", ".jpeg", ".bmp", ".webp"):
        arr = (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        Image.fromarray(arr).save(path)
        return
    if suffix in (".exr", ".hdr"):
        try:
            import cv2

            arr = img.astype(np.float32)
            if arr.ndim == 3 and arr.shape[-1] >= 3:
                arr = arr[..., [2, 1, 0] + list(range(3, arr.shape[-1]))]
            if cv2.imwrite(str(path), arr):
                return
        except ImportError:
            pass
        import imageio.v3 as iio

        iio.imwrite(path, img.astype(np.float32))
        return
    raise ValueError(f"unsupported image format: {path}")


def resize_image(img: np.ndarray, scale_factor: float) -> np.ndarray:
    h, w = img.shape[:2]
    nh, nw = int(h * scale_factor), int(w * scale_factor)
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    out = np.asarray(pil.resize((nw, nh), Image.BILINEAR)).astype(np.float32) / 255.0
    if out.ndim == 2:
        out = out[..., None]
    return out


import contextlib


@contextlib.contextmanager
def open_video_renderer(path, fps: int = 24):
    """Context manager yielding ``put(frame[H, W, 3] float)`` — the analog of
    the reference's ffmpegcv writer (``rfstudio/io/_video.py:19-77``).

    Backend by suffix: ``.gif`` via PIL; ``.mp4``/``.webm`` via imageio when
    an ffmpeg plugin is importable, else falls back to a PNG sequence in a
    sibling directory (zero-egress images lack ffmpeg); a directory path (or
    no suffix) always writes a PNG sequence ``frame_%05d.png``."""
    from pathlib import Path as _Path

    path = _Path(path)
    frames: list = []

    def put(frame) -> None:
        frame = np.asarray(frame)
        frames.append(
            (np.clip(frame[..., :3], 0, 1) * 255).astype(np.uint8)
        )

    yield put

    if not frames:
        return
    suffix = path.suffix.lower()
    if suffix == ".gif":
        ims = [Image.fromarray(f) for f in frames]
        path.parent.mkdir(parents=True, exist_ok=True)
        ims[0].save(
            path, save_all=True, append_images=ims[1:],
            duration=int(1000 / fps), loop=0,
        )
        return
    if suffix in (".mp4", ".webm", ".mkv", ".avi"):
        try:
            import imageio.v3 as iio

            path.parent.mkdir(parents=True, exist_ok=True)
            iio.imwrite(path, np.stack(frames), fps=fps)
            return
        except Exception:
            import warnings

            path = path.with_suffix("")
            warnings.warn(
                f"no video encoder available; writing PNG sequence to {path}/"
            )
    path.mkdir(parents=True, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(path / f"frame_{i:05d}.png")
