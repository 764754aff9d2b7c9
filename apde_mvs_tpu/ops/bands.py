"""Static-band gather bounds — the pre-pass behind the big-table fast path.

XLA:TPU's u8 row-gather emitter is bimodal in TABLE BYTES (~405 M rows/s
below ~3.5 MiB, ~175 M above; PERF_NOTES "byte bound"), so full-resolution
quad tables pay ~2.3x per sampled row. The round-2 cond-banded gather
(core.sampling.banded_take) lost its isolated win to fusion breakage at
every production call site; the surviving design (VERDICT r2 next-round #1)
computes band ORIGINS outside the NCC program — this module — and passes
them in as plain traced scalars, so the NCC body does one dynamic-slice per
(candidate, view) and zero conds / index reductions.

Correctness contract: a band origin may be used only when EVERY gather index
of that (candidate, view) pair falls inside [origin, origin + BAND_ROWS).
The bound is exact by construction:

- gather indices are floor(clip(wy)) * W + floor(clip(wx)) with wx, wy the
  homography-warped window taps (core.sampling.quad_coords), so full-row
  bands only need the warped-Y range;
- the homography denominator H20*x + H21*y + H22 is AFFINE in the tap
  coordinates: if it is strictly positive at the 4 corners of the tap
  bounding square it is positive on the whole square, the projective map is
  horizon-free there, the image of the (convex) square is a convex quad and
  the Y extremes are attained at the corners. clip() is monotone, so
  clipped extremes = clipped corner extremes.
- any corner with a non-positive or non-finite denominator makes the pair
  unbandable (warps can clamp anywhere in the table); the driver then
  dispatches the plain full-table program for the chunk.

The refinement hypotheses are generated in-body from the sweep winner, which
the pre-pass cannot know; it bounds them by applying the SAME raw draws
(geometry.unit_normal_facing_from_gaussian / perturbed_normal_from_angles
split for this purpose) to EVERY possible winner and taking the union.

Reference parity target: the NCC hot loop this accelerates is
ComputeBilateralNCC* (reference APD.cu:596-721) at ETH3D-scale tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..core.sampling import BAND_ROWS
from .cost import CostData


class BandBounds(NamedTuple):
    """Per-(plane-set, view) banded-gather decision."""

    origin: jnp.ndarray   # (..., S) int32 table-row origins (clamped)
    fits: jnp.ndarray     # (..., S) bool — every index provably in band


def _corner_taps(max_extent: int) -> np.ndarray:
    """Bounding-square corners covering every window tap: the square window
    (±radius) and the SA star (max offset 5) both fit ±max_extent."""
    e = float(max_extent)
    return np.array([[-e, -e], [e, -e], [-e, e], [e, e]], np.float32)


def plane_view_bounds(data: CostData, src_cam, x, y, plane,
                      max_extent: int) -> tuple:
    """Exact warped-row bounds of one plane batch against one source view.

    x, y: (B,) f32 pixel coords; plane: (B, 4). Returns (lo, hi, ok):
    int32 scalars bounding floor(clip(wy)) over all B pixels x 4 corner
    taps, and a scalar bool that the corner-hull argument applies to every
    pixel (all 4 denominators strictly positive and finite).
    """
    H = geo.homography(data.ref_cam, src_cam, plane)       # (B, 3, 3)
    corners = jnp.asarray(_corner_taps(max_extent))        # (4, 2)
    tx = x[:, None] + corners[None, :, 0]                  # (B, 4)
    ty = y[:, None] + corners[None, :, 1]
    Hb = H[:, None, :, :]
    denom = Hb[..., 2, 0] * tx + Hb[..., 2, 1] * ty + Hb[..., 2, 2]
    ok = jnp.all(jnp.isfinite(denom) & (denom > 1e-12))
    _, wy = geo.warp(Hb, tx, ty)
    wy = jnp.clip(wy, 0.0, data.src_h - 1.0)
    ok &= jnp.all(jnp.isfinite(wy))
    # ±1 row float-safety margin: interior taps are evaluated by the same
    # warp formula but with different rounding; an ulp past a row boundary
    # must still land inside the band. Re-clamped so the span stays within
    # real table rows (actual indices can never leave them).
    lo = jnp.maximum(jnp.floor(jnp.min(wy)).astype(jnp.int32) - 1, 0)
    hi = jnp.minimum(jnp.floor(jnp.max(wy)).astype(jnp.int32) + 1,
                     data.src_h - 1)
    return lo, hi, ok


def strong_bounds(data: CostData, x, y, planes, max_extent: int
                  ) -> BandBounds:
    """Band decisions for a (B, C, 4) candidate-plane set, per (cand, view).

    Returns BandBounds with (C, S) origin/fits. Runs as part of a small
    pre-pass program; only elementwise warp math + reductions (no gathers
    from the big table), ~2-4% of the NCC body it banks.
    """
    C = planes.shape[1]
    n_rows = data.src_quads.shape[1]
    band_rows_img = BAND_ROWS // data.width

    def per_view(s, _):
        src_cam = data.src_cams.view(s)

        def per_cand(c, __):
            lo, hi, ok = plane_view_bounds(data, src_cam, x, y,
                                           planes[:, c], max_extent)
            span = hi - lo + 1
            fits = ok & (span <= band_rows_img)
            origin = jnp.clip(lo * data.width, 0, n_rows - BAND_ROWS)
            return c + 1, (origin, fits)

        _, (origins, fits) = jax.lax.scan(per_cand, 0, None, length=C)
        return s + 1, (origins, fits)

    _, (origins, fits) = jax.lax.scan(per_view, 0, None,
                                      length=data.num_src)
    # scanned (S, C) -> (C, S)
    return BandBounds(origin=jnp.moveaxis(origins, 0, -1),
                      fits=jnp.moveaxis(fits, 0, -1))
