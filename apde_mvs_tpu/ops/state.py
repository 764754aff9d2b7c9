"""PatchMatch per-view state as a structure-of-arrays pytree.

The reference's per-pixel buffers (plane_hypotheses float4, costs,
selected_views bitmask, view_weight uchar[32], weak_info, confidence;
APD.h:150-189) become dense arrays. Pixel-state byte values (WEAK=0,
STRONG=1, UNKNOWN=2) match the on-disk ABI of weak.bin.

`valid` marks real image pixels: the pipeline pads images to even/tile-
friendly sizes, and padded pixels must never update or contribute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import STRONG, UNKNOWN, WEAK


@struct.dataclass
class PMState:
    planes: jnp.ndarray        # (H, W, 4) f32 — camera-frame (n, w) during PM
    costs: jnp.ndarray         # (H, W) f32
    selected: jnp.ndarray      # (H, W, S) bool
    view_weights: jnp.ndarray  # (H, W, S) f32 Monte-Carlo vote counts
    weak: jnp.ndarray          # (H, W) int32 pixel states
    confidence: jnp.ndarray    # (H, W) f32 (uchar semantics, 0..255)
    valid: jnp.ndarray         # (H, W) bool — real (non-padding) pixels

    @staticmethod
    def create(height: int, width: int, num_src: int,
               valid=None) -> "PMState":
        if valid is None:
            valid = jnp.ones((height, width), bool)
        return PMState(
            planes=jnp.zeros((height, width, 4), jnp.float32),
            costs=jnp.full((height, width), 2.0, jnp.float32),
            selected=jnp.zeros((height, width, num_src), bool),
            view_weights=jnp.zeros((height, width, num_src), jnp.float32),
            weak=jnp.where(valid, STRONG, UNKNOWN).astype(jnp.int32),
            confidence=jnp.ones((height, width), jnp.float32),
            valid=valid,
        )
