"""Pallas software texture unit: bilinear sampling as hat-weight matmuls.

TPU v5e has no fast dynamic gather (measured ~1.3 G elems/s for Mosaic's
`dynamic_gather`, ~0.2 G rows/s for XLA's gather — see PERF_NOTES.md), but
its MXU contracts at 394 TFLOP/s and the VPU runs dense elementwise work at
~276 G ops/s. Bilinear sampling is therefore reformulated as two dense
interpolation contractions against a windowed source patch:

    val[j] = sum_p sum_c hat(y_j - (rmin+p)) * hat(x_j - (cmin+c)) * W[p, c]

where hat(t) = max(0, 1 - |t|) is the linear-interpolation kernel, W is a
(RW, CW) window dynamic-sliced from the VMEM-resident source image, and
(rmin, cmin) are per-block window origins. The y-contraction runs on the
MXU; the x-contraction is an elementwise multiply + row reduction. Samples
outside the window clamp to its edge — callers choose blocks whose requests
are spatially coherent (window overflow is detected and reported).

This module is the primitive for the round-2 NCC kernel; `sample_blocks`
is the standalone, tested entry point.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8 * 128          # requests per block
DEFAULT_RW = 24          # window rows (8-aligned origin + span)
DEFAULT_CW = 256         # window cols (128-aligned origin + span)


def _sampler_kernel(img_ref, xs_ref, ys_ref, out_ref, *, rw: int, cw: int):
    h, w = img_ref.shape
    xs = xs_ref[0]                            # (BLOCK, 1)
    ys = ys_ref[0]
    # window origins must be tile-aligned for vector loads from VMEM
    rmin = jnp.clip(jnp.min(ys).astype(jnp.int32), 0, h - rw) & ~7
    cmin = jnp.clip(jnp.min(xs).astype(jnp.int32), 0, w - cw) & ~127
    rmin = pl.multiple_of(rmin, 8)
    cmin = pl.multiple_of(cmin, 128)
    win = img_ref[pl.ds(rmin, rw), pl.ds(cmin, cw)]        # (rw, cw)

    yl = jnp.clip(ys - rmin.astype(jnp.float32), 0.0, rw - 1.0)
    xl = jnp.clip(xs - cmin.astype(jnp.float32), 0.0, cw - 1.0)

    # y contraction on the MXU: Z[j, c] = sum_p hat(yl_j - p) * win[p, c]
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, rw), 1
                                     ).astype(jnp.float32)
    yhat = jnp.maximum(0.0, 1.0 - jnp.abs(yl - p_ids))
    # HIGHEST precision: the MXU's default bf16 pass loses ~0.4% on
    # 0..255-magnitude image values
    Z = jnp.dot(yhat, win, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # (BLOCK, cw)

    # x contraction: elementwise hat * Z, reduce over columns
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, cw), 1
                                     ).astype(jnp.float32)
    xhat = jnp.maximum(0.0, 1.0 - jnp.abs(xl - c_ids))
    vals = (xhat * Z).sum(axis=1, keepdims=True)
    out_ref[0] = vals


@functools.partial(jax.jit, static_argnames=("rw", "cw"))
def sample_blocks(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                  rw: int = DEFAULT_RW, cw: int = DEFAULT_CW) -> jnp.ndarray:
    """Bilinear-sample `img` at block-coherent coordinates.

    xs, ys: (num_blocks, BLOCK) f32. Each block's requests must fit a
    (rw, cw) window anchored at the block's (tile-aligned) coordinate
    minimum (clamped otherwise). Returns (num_blocks, BLOCK) samples.
    """
    nb = xs.shape[0]
    kernel = functools.partial(_sampler_kernel, rw=rw, cw=cw)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(img.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, BLOCK, 1), jnp.float32),
    )(img, xs.reshape(nb, BLOCK, 1), ys.reshape(nb, BLOCK, 1))
    return out.reshape(nb, BLOCK)


def reference_sample(img, xs, ys):
    """Oracle: plain bilinear sampling with edge clamp."""
    from ...core.sampling import bilinear_sample
    return bilinear_sample(img, xs, ys)
