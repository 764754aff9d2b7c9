"""Red-black checkerboard layout transforms.

The reference serializes PatchMatch propagation into black/red half-grid
kernel launches so neighbor reads never race with same-color writes
(APD.cu:1617-1692; parity: black = (x + y) even). On TPU we keep exactly that
schedule but avoid wasting half the vector lanes: each color phase gathers its
pixels into a dense (H, W/2) layout, evaluates the (gather-based) cost kernels
on the compacted set, and scatters results back. The compaction is a
structured strided view — cheap reshuffles, not general gathers.

Width must be even (the pipeline pads images to even width and masks the pad).
"""

from __future__ import annotations

import jax.numpy as jnp

BLACK = 0
RED = 1


def color_mask(height: int, width: int, color: int) -> jnp.ndarray:
    """Boolean (H, W) mask of pixels with the given color."""
    ys = jnp.arange(height)[:, None]
    xs = jnp.arange(width)[None, :]
    return ((xs + ys) % 2) == color


def _offsets(height: int, color: int) -> jnp.ndarray:
    """Column offset (0 or 1) of the color's pixels in each row."""
    return (jnp.arange(height) + color) % 2


def gather_color(arr: jnp.ndarray, color: int) -> jnp.ndarray:
    """(H, W, ...) -> (H, W//2, ...) view of one color's pixels."""
    h, w = arr.shape[:2]
    assert w % 2 == 0, "checkerboard layout requires even width"
    pairs = arr.reshape((h, w // 2, 2) + arr.shape[2:])
    off = _offsets(h, color)
    idx = off.reshape((h,) + (1,) * (pairs.ndim - 1))
    idx = jnp.broadcast_to(idx, (h, w // 2, 1) + arr.shape[2:])
    return jnp.take_along_axis(pairs, idx, axis=2).squeeze(2)


def scatter_color(arr: jnp.ndarray, vals: jnp.ndarray, color: int) -> jnp.ndarray:
    """Write (H, W//2, ...) values back into the color's positions of arr."""
    h, w = arr.shape[:2]
    assert w % 2 == 0
    pairs = arr.reshape((h, w // 2, 2) + arr.shape[2:])
    off = _offsets(h, color)
    sel = (jnp.arange(2).reshape((1, 1, 2) + (1,) * (pairs.ndim - 3))
           == off.reshape((h, 1, 1) + (1,) * (pairs.ndim - 3)))
    out = jnp.where(sel, vals[:, :, None], pairs)
    return out.reshape(arr.shape)


def color_coords(height: int, width: int, color: int):
    """Pixel coordinates (x, y) int32 of the compacted (H, W//2) cells."""
    h, hw = height, width // 2
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, hw))
    js = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None, :], (h, hw))
    xs = 2 * js + ((ys + color) % 2)
    return xs, ys
