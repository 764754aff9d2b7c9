"""Image sampling primitives — the TPU replacement for CUDA texture fetches.

The reference samples images through bilinear-filtered texture objects
(APD.cpp:687-734) and depth maps through integer-centered fetches
(APD.cu:885, 2319). On TPU there is no texture unit; sampling is a gather.
To keep gathers cheap we pre-pack each image into a (H*W, 4) "quad" layout
holding the 2x2 bilinear footprint of every pixel, so one row-gather per
sample replaces four scalar gathers (rows are the natural fast gather axis
on TPU).

Out-of-range coordinates clamp to the edge. (The reference configures wrap
addressing but every cost path rejects out-of-image centers before sampling,
so wrap vs clamp only affects window taps that stray past the border; clamp
is the saner extrapolation and is what we standardize on.)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def pack_bilinear(img: jnp.ndarray) -> jnp.ndarray:
    """Pack (H, W) -> (H*W, 4) rows [v00, v01, v10, v11] with clamped edges."""
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
    downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    quad = jnp.stack([img, right, down, downright], axis=-1)
    return quad.reshape(-1, 4)


def quad_coords(width: int, height: int, x, y):
    """Shared clamp/floor/fraction decomposition for quad-table sampling.

    Returns (row_index, fx, fy); every quad-layout sampler (per-view table,
    flat multi-view table) must route through this + lerp_quad_rows so the
    two paths cannot drift."""
    x = jnp.clip(x, 0.0, width - 1.0)
    y = jnp.clip(y, 0.0, height - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    idx = y0.astype(jnp.int32) * width + x0.astype(jnp.int32)
    return idx, x - x0, y - y0


def lerp_quad_rows(rows: jnp.ndarray, fx, fy):
    """Bilinear lerp of gathered (..., 4) quad rows [v00, v01, v10, v11]."""
    v = rows.astype(jnp.float32)
    top = v[..., 0] * (1.0 - fx) + v[..., 1] * fx
    bot = v[..., 2] * (1.0 - fx) + v[..., 3] * fx
    return top * (1.0 - fy) + bot * fy


# --------------------------------------------------------------------------
# Banded row gather — a big-table fast path that did NOT survive
# composition (default OFF; see _BAND_SITES below).
#
# XLA:TPU's u8 row-gather emitter is bimodal in TABLE BYTES: ~405 M rows/s
# up to ~3.5 MiB, ~175 M rows/s above (threshold measured to the 0.5 MiB in
# benchmarks/gather_vmem_probe.py; independent of index coherence, row
# blocking, and scoped-VMEM options — gather_locality_probe.py).  Full-res
# quad tables (6 MP = 24 MiB) therefore gather 2.3x slower than the bench's
# 0.5 MP tables.  The idea: one production gather covers ONE (candidate,
# view) pair over a spatially contiguous pixel chunk whose warped
# coordinates usually span a narrow row band, so dynamic-slice a 3 MiB band
# at the indices' min and gather inside it, lax.cond falling back to the
# full-table gather when the span does not fit — bitwise identical either
# way.  In ISOLATION that measures 351 (cond fast branch; 378 for the raw
# band slice+gather) vs 174 M rows/s
# (benchmarks/gather_window_probe.py); inside real NCC programs the
# min/max reduction + cond + band copy cost MORE than the faster gather
# returns at every production call site (band_site_probe.py, PERF_NOTES
# "banded cond regression: closed").
# --------------------------------------------------------------------------

# 3 MiB of (N, 4) u8 rows — comfortably under the ~3.5 MiB fast-path edge.
BAND_ROWS = 786432

_BANDED = os.environ.get("APDE_BANDED_GATHER", "1") != "0"

# APDE_BAND_STATS=1: count fast/slow branch executions per call site (host
# callback per gather — CPU diagnostic runs only; the axon TPU tunnel does
# not support host callbacks). BAND_STATS: site -> [fast, slow] call counts.
_BAND_STATS_ON = os.environ.get("APDE_BAND_STATS", "") == "1"
BAND_STATS: dict = {}

# APDE_BAND_SITES: comma list of call sites that ride the banded gather
# ("all" = every site; "" = none). Site names: strong, classify,
# weak_center, weak_anchor. Default OFF everywhere: controlled per-site
# A/Bs on the real chip at production chunk geometry (24 MiB table,
# benchmarks/band_site_probe.py) measured the cond wrapper as a net LOSS
# at every site inside real NCC programs — weak/deformable 1.68x slower
# banded, strong 1.08x, view-major classify 1.05x — even where the fast
# branch hits; the isolated banded rates (gather_window_probe: 378 M rows/s
# for the raw band slice+gather, 351 M through the cond wrapper's fast
# branch, vs 174 plain) never survive composition. See PERF_NOTES "banded
# cond regression: closed".
_BAND_SITES = os.environ.get("APDE_BAND_SITES", "")


def site_banded(site: str) -> bool:
    """True when the banded gather is enabled for this call site.
    Whitespace around commas is tolerated ("strong, classify")."""
    sites = {s.strip() for s in _BAND_SITES.split(",")}
    return _BAND_SITES == "all" or site in sites


def set_band_sites(spec: str) -> None:
    """Override the band-site set at runtime (A/B probes). Only affects
    traces made AFTER the call — already-jitted programs keep the branch
    they were traced with, so probes must build a fresh jit per arm."""
    global _BAND_SITES
    _BAND_SITES = spec


def _record_band(site: str, fits) -> None:
    c = BAND_STATS.setdefault(site, [0, 0])
    c[0 if bool(fits) else 1] += 1


def banded_take(tab: jnp.ndarray, idx, site: str = "?"):
    """Row gather from a big (N, C) table through a BAND_ROWS window when
    the index span fits (fast path), full-table gather when it does not.
    Results are bitwise identical to ``jnp.take(tab, idx, axis=0)``."""
    n, c = tab.shape
    lo = jnp.min(idx).astype(jnp.int32)
    hi = jnp.max(idx).astype(jnp.int32)
    start = jnp.clip(lo, 0, n - BAND_ROWS)
    fits = hi - start < BAND_ROWS
    if _BAND_STATS_ON:
        import functools
        jax.debug.callback(functools.partial(_record_band, site), fits)

    def fast(_):
        band = jax.lax.dynamic_slice(tab, (start, 0), (BAND_ROWS, c))
        return jnp.take(band, idx - start, axis=0)

    def slow(_):
        return jnp.take(tab, idx, axis=0)

    return jax.lax.cond(fits, fast, slow, None)


def _use_band(tab: jnp.ndarray) -> bool:
    """Banding pays only on u8 tables past the fast-path size edge (f32
    tables have no fast path at any size; small tables already ride it)."""
    return _BANDED and tab.dtype == jnp.uint8 and tab.shape[0] > BAND_ROWS


# Static-band fast path (ops.bands + static_band_take): default ON for u8
# tables past the byte edge; APDE_STATIC_BANDS=0 disables (A/B runs).
_STATIC_BANDS = os.environ.get("APDE_STATIC_BANDS", "1") != "0"


def static_bands_enabled(src_quads) -> bool:
    """True when the static-band dispatch applies to this (S, N, 4) table:
    u8 rows (f32 has no fast path at any size) and N past the fast-path
    byte edge (small tables already ride it)."""
    import sys
    _mod = sys.modules[__name__]
    return _mod._STATIC_BANDS and src_quads.dtype == jnp.uint8 \
        and src_quads.shape[-2] > _mod.BAND_ROWS


def set_static_bands(on: bool) -> None:
    """Runtime override (A/B probes); affects only traces made after."""
    global _STATIC_BANDS
    _STATIC_BANDS = on


def static_band_take(tab: jnp.ndarray, idx, origin):
    """Row gather through a BAND_ROWS window at a PRE-COMPUTED origin.

    `origin` is a traced int32 scalar computed OUTSIDE this program (by the
    ops.bands bound pre-pass, dispatched from the host driver) and already
    clamped to [0, N - BAND_ROWS]; the caller guarantees every index falls
    inside [origin, origin + BAND_ROWS). Unlike `banded_take` there is NO
    per-gather min/max reduction and NO lax.cond — the two constructs the
    round-2 A/Bs showed poison XLA's fusion (PERF_NOTES "banded cond
    regression: closed"); one dynamic-slice per (candidate, view) amortizes
    over the whole chunk's taps. Bitwise-identical to a full-table take when
    the coverage guarantee holds (ops.bands verifies it per chunk and the
    driver falls back to the plain program otherwise)."""
    import sys
    _mod = sys.modules[__name__]
    n, c = tab.shape
    if n == _mod.BAND_ROWS:
        # pre-sliced band (ops.bands.banded_view_tables): rebase only — the
        # caller hoisted ONE slice per view out of the candidate/step scans
        return jnp.take(tab, idx - origin, axis=0)
    band = jax.lax.dynamic_slice(tab, (origin, jnp.int32(0)),
                                 (_mod.BAND_ROWS, c))
    return jnp.take(band, idx - origin, axis=0)


def bilinear_sample_packed(quad: jnp.ndarray, width: int, height: int, x, y,
                           band: bool | None = None, site: str = "?",
                           origin=None):
    """Bilinear sample from a pack_bilinear[_u8]() layout. x, y any shape.

    `origin`: traced band origin for the static-band fast path (see
    static_band_take) — takes precedence over the cond-banded path.
    `band` gates the (legacy, default-off) cond-banded big-table fast path
    per CALL SITE: None = on wherever it can pay (`_use_band`), False =
    plain full-table gather."""
    idx, fx, fy = quad_coords(width, height, x, y)
    if origin is not None:
        return lerp_quad_rows(static_band_take(quad, idx, origin), fx, fy)
    use = _use_band(quad) and (site_banded(site) if band is None else band)
    rows = banded_take(quad, idx, site) if use \
        else jnp.take(quad, idx, axis=0)
    return lerp_quad_rows(rows, fx, fy)


def bilinear_sample(img: jnp.ndarray, x, y):
    """Bilinear sample directly from a (H, W) image (4 scalar gathers)."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    flat = img.reshape(-1)
    v00 = jnp.take(flat, y0i * w + x0i)
    v01 = jnp.take(flat, y0i * w + x1i)
    v10 = jnp.take(flat, y1i * w + x0i)
    v11 = jnp.take(flat, y1i * w + x1i)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# u8 quads — the fast-gather sampling layout.
#
# Probing XLA:TPU's gather emitter (benchmarks/gather_width_probe.py, v5e)
# showed the row-gather rate depends strongly on the row DTYPE: (N, 4) f32
# quad rows gather at ~170 M rows/s, but (N, 4) u8 rows at ~413 M rows/s
# (u16/i32 rows stay at the slow f32 rate; wide u8 rows plateau at ~350).
# So the default table packs the same 2x2 quad layout in u8: 2.4x the
# gather rate AND a 4x smaller table.  u8 is lossless for raw images
# (integer 0..255 values); pyramid-rescaled (fractional) images are rounded
# once at pack time, which is within the reference's own texture-unit
# interpolation precision (tex2D uses 9-bit fixed-point fractions;
# APD.cpp:687-734).  The f32 quad path remains as the exact oracle.
# ---------------------------------------------------------------------------


def pack_bilinear_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Pack (H, W) 0..255 values -> (H*W, 4) u8 quad rows (pack_bilinear
    layout). Fractional values are rounded to the integer grid."""
    return pack_bilinear(jnp.clip(jnp.round(img), 0.0, 255.0)
                         .astype(jnp.uint8))


def take_rows(flat: jnp.ndarray, idx):
    """Row gather that avoids XLA:TPU's pathological scalar-gather
    legalization: 1-D tables compile ~18x slower than (N, C>=2) row tables,
    so scalar tables are widened to row pairs before the take."""
    if flat.ndim == 1:
        return jnp.take(jnp.stack([flat, flat], axis=-1), idx, axis=0)[..., 0]
    if flat.shape[-1] == 1:
        wide = jnp.concatenate([flat, flat], axis=-1)
        return jnp.take(wide, idx, axis=0)[..., :1]
    return jnp.take(flat, idx, axis=0)


def texel_fetch(img: jnp.ndarray, x, y):
    """Integer pixel fetch at truncated coordinates with clamped edges —
    the reference's `tex2D(img, (int)x + 0.5, (int)y + 0.5)` idiom used for
    depth-map lookups (APD.cu:885, 2319)."""
    h, w = img.shape
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    return take_rows(img.reshape(-1), yi * w + xi)


def fetch(arr: jnp.ndarray, xi, yi, fill=0):
    """Integer fetch from a 2-D (or 2-D + trailing dims) array with
    out-of-bounds fill."""
    h, w = arr.shape[:2]
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xic = jnp.clip(xi, 0, w - 1)
    yic = jnp.clip(yi, 0, h - 1)
    flat = arr.reshape((h * w,) + arr.shape[2:])
    v = take_rows(flat, yic * w + xic)
    if arr.ndim > 2:
        inb = inb.reshape(inb.shape + (1,) * (arr.ndim - 2))
    return jnp.where(inb, v, jnp.asarray(fill, arr.dtype))
