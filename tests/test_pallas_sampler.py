"""Hat-matmul sampler correctness (interpret mode on CPU; the kernel is
compiled for real on TPU — throughput numbers live in PERF_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core.sampling import bilinear_sample_packed, pack_bilinear


def _sample_interpret(img, xs, ys, rw=24, cw=256):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from apde_mvs_tpu.ops.pallas import sampler

    nb = xs.shape[0]
    kernel = functools.partial(sampler._sampler_kernel, rw=rw, cw=cw)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(img.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, sampler.BLOCK, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sampler.BLOCK, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sampler.BLOCK, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, sampler.BLOCK, 1), jnp.float32),
        interpret=True,
    )(img, xs.reshape(nb, sampler.BLOCK, 1), ys.reshape(nb, sampler.BLOCK, 1))
    return out.reshape(nb, sampler.BLOCK)


def test_sampler_matches_bilinear_oracle():
    from apde_mvs_tpu.ops.pallas.sampler import BLOCK

    H, W = 256, 384
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    NB = 4
    ys = rng.uniform(8, H - 40, NB)[:, None] + rng.uniform(0, 12, (NB, BLOCK))
    xs = rng.uniform(8, W - 270, NB)[:, None] + rng.uniform(0, 120, (NB, BLOCK))
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    out = _sample_interpret(img, xs, ys)
    quad = pack_bilinear(img)
    ref = bilinear_sample_packed(quad, W, H, xs, ys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
