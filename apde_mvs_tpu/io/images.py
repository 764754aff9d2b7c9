"""Image reading / resizing.

The reference reads grayscale via OpenCV and keeps raw 0-255 float32 values
with no normalization (APD.cpp:137-160); images are downscaled with bilinear
interpolation for pyramid rounds (APD.cpp:564-588) and auxiliary maps with
nearest (APD.cpp:592-652). We use PIL for decode and implement both resize
kernels in numpy so behavior is library-independent and matches OpenCV's
pixel-center convention (align to pixel centers: src = (dst + 0.5) * scale - 0.5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

SUPPORTED_EXTS = (".jpg", ".png", ".jpeg", ".JPG", ".PNG", ".JPEG")


def read_image_gray(path: Union[str, Path],
                    cache: Optional["MemoryCache"] = None) -> np.ndarray:
    """Grayscale float32 image with raw 0-255 values (reference: APD.cpp:137-160).

    Uses ITU-R 601-2 luma (0.299 R + 0.587 G + 0.114 B), the same weights as
    OpenCV's IMREAD_GRAYSCALE.
    """
    key = str(path)
    if cache is not None and key in cache.img_cache:
        return cache.img_cache[key]
    from PIL import Image
    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.float32)
    gray = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    gray = gray.astype(np.float32)
    if cache is not None:
        cache.img_cache[key] = gray
    return gray


def read_image_color(path: Union[str, Path]) -> np.ndarray:
    """BGR uint8 image (matches OpenCV IMREAD_COLOR channel order used in fusion,
    APD.cpp:1092)."""
    from PIL import Image
    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return rgb[..., ::-1].copy()


def write_image(path: Union[str, Path], img: np.ndarray) -> None:
    """Write a uint8 image; 3-channel input is interpreted as BGR."""
    from PIL import Image
    if img.ndim == 3:
        img = img[..., ::-1]
    Image.fromarray(np.ascontiguousarray(img)).save(str(path))


def _resize_axis_coords(dst_size: int, src_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    scale = src_size / dst_size
    x = (np.arange(dst_size, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = (x - x0).astype(np.float32)
    x0c = np.clip(x0, 0, src_size - 1)
    x1c = np.clip(x0 + 1, 0, src_size - 1)
    return x0c, x1c, frac


def resize_bilinear(img: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize with OpenCV INTER_LINEAR pixel-center convention."""
    h, w = img.shape[:2]
    nh, nw = new_hw
    if (nh, nw) == (h, w):
        return img.copy()
    y0, y1, fy = _resize_axis_coords(nh, h)
    x0, x1, fx = _resize_axis_coords(nw, w)
    img_f = img.astype(np.float32)
    top = img_f[y0][:, x0] * (1 - fx)[None, :, *([None] * (img.ndim - 2))] \
        + img_f[y0][:, x1] * fx[None, :, *([None] * (img.ndim - 2))]
    bot = img_f[y1][:, x0] * (1 - fx)[None, :, *([None] * (img.ndim - 2))] \
        + img_f[y1][:, x1] * fx[None, :, *([None] * (img.ndim - 2))]
    fy_b = fy[:, None] if img.ndim == 2 else fy[:, None, None]
    out = top * (1 - fy_b) + bot * fy_b
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.rint(out), np.iinfo(img.dtype).min,
                      np.iinfo(img.dtype).max).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return out


def resize_nearest(img: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (OpenCV INTER_NEAREST convention: floor of
    dst * scale)."""
    h, w = img.shape[:2]
    nh, nw = new_hw
    if (nh, nw) == (h, w):
        return img.copy()
    ys = np.minimum((np.arange(nh) * (h / nh)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(nw) * (w / nw)).astype(np.int64), w - 1)
    return img[ys][:, xs].copy()


def scaled_size(h: int, w: int, scale_size: int) -> Tuple[int, int]:
    """Target size for a pyramid scale factor (reference: APD.cpp:566-568,
    round(size / scale))."""
    factor = 1.0 / float(scale_size)
    return int(round(h * factor)), int(round(w * factor))
