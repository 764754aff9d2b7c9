"""Phase 4: sampler with natural (8,128) tile layout, inner-loop batching.

Layout lesson from phase 3: (B, 1) coordinate columns tile-pad 1 lane to
128, exploding VMEM and DMA; coords/outputs must travel as (8, 128) tiles.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024


def make_sampler_v4(H, W, rw, n_outer, inner, dtype=jnp.float32):
    cw = 128

    def kernel(img_ref, xs_ref, ys_ref, out_ref, ok_ref):
        def body(j, _):
            xs = xs_ref[0, j]                    # (8, 128)
            ys = ys_ref[0, j]
            rmin = jnp.clip(jnp.min(ys).astype(jnp.int32) - 1, 0, H - rw) & ~7
            rmin = pl.multiple_of(rmin, 8)
            cstart = jnp.clip(jnp.min(xs).astype(jnp.int32) - 1, 0, W - cw)
            cal = jnp.minimum(cstart & ~127, W - 256)
            cal = pl.multiple_of(cal, 128)
            off = cstart - cal
            win256 = img_ref[pl.ds(rmin, rw), pl.ds(cal, 256)]
            win = pltpu.roll(win256, 256 - off, 1)[:, :cw].astype(dtype)
            ylf = ys - rmin.astype(jnp.float32)
            xlf = xs - cstart.astype(jnp.float32)
            ok = (xlf >= 0) & (xlf <= cw - 1) & (ylf >= 0) & (ylf <= rw - 1)
            yl = jnp.clip(ylf, 0.0, rw - 1.0).reshape(B, 1)
            xl = jnp.clip(xlf, 0.0, cw - 1.0).reshape(B, 1)
            p_ids = jax.lax.broadcasted_iota(jnp.int32, (B, rw), 1)
            yhat = jnp.maximum(
                0.0, 1.0 - jnp.abs(yl - p_ids.astype(jnp.float32))
            ).astype(dtype)
            z = jnp.dot(yhat, win, preferred_element_type=jnp.float32)
            c_ids = jax.lax.broadcasted_iota(jnp.int32, (B, cw), 1)
            x0 = jnp.floor(xl).astype(jnp.int32)
            fx = xl - x0.astype(jnp.float32)
            left = jnp.where(c_ids == x0, z, 0).sum(-1, keepdims=True)
            right = jnp.where(c_ids == x0 + 1, z, 0).sum(-1, keepdims=True)
            val = (1 - fx) * left + fx * right
            out_ref[0, j] = val.reshape(8, 128)
            ok_ref[0, j] = ok
            return 0
        jax.lax.fori_loop(0, inner, body, 0)

    @jax.jit
    def run(img, xs, ys):
        return pl.pallas_call(
            kernel,
            grid=(n_outer,),
            in_specs=[
                pl.BlockSpec((H, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, inner, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, inner, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_outer, inner, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_outer, inner, 8, 128), jnp.bool_),
            ),
        )(img, xs, ys)
    return run


def _xla_quad_baseline(img, xs, ys):
    from apde_mvs_tpu.core.sampling import bilinear_sample_packed, pack_bilinear
    H, W = img.shape
    quad = pack_bilinear(img)

    @jax.jit
    def run(xs, ys):
        return bilinear_sample_packed(quad, W, H, xs, ys)
    return run


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    H, W = 608, 896
    img = jnp.asarray(rng.random((H, W)) * 255, jnp.float32)
    total_blocks = 512

    def positions(n_outer, inner):
        cx = rng.uniform(20, W - 20, (n_outer, inner, 1, 1))
        cy = rng.uniform(20, H - 20, (n_outer, inner, 1, 1))
        xs0 = np.clip(cx + rng.uniform(-40, 40, (n_outer, inner, 8, 128)),
                      0, W - 2)
        ys0 = np.clip(cy + rng.uniform(-5, 5, (n_outer, inner, 8, 128)),
                      0, H - 2)
        return xs0, ys0

    for inner in (8, 32):
        n_outer = total_blocks // inner
        xs0, ys0 = positions(n_outer, inner)
        variants = [(jnp.asarray(np.clip(xs0 + 0.37 * i, 0, W - 2), jnp.float32),
                     jnp.asarray(np.clip(ys0 + 0.21 * i, 0, H - 2), jnp.float32))
                    for i in range(8)]
        for dtype, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            try:
                fn = make_sampler_v4(H, W, 24, n_outer, inner, dtype)
                out = fn(img, *variants[0])
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for vx, vy in variants:
                    out = fn(img, vx, vy)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / len(variants)
                print(f"sampler-v4 {nm} inner={inner}: "
                      f"{total_blocks * B / dt / 1e6:.0f} M samples/s")
            except Exception as e:
                print(f"sampler-v4 {nm} inner={inner}: FAIL {str(e)[:100]}")

    # XLA quad-gather baseline, same request count, varied inputs
    n_outer, inner = total_blocks // 8, 8
    xs0, ys0 = positions(n_outer, inner)
    variants = [(jnp.asarray(np.clip(xs0 + 0.37 * i, 0, W - 2), jnp.float32),
                 jnp.asarray(np.clip(ys0 + 0.21 * i, 0, H - 2), jnp.float32))
                for i in range(8)]
    fn = _xla_quad_baseline(img, *variants[0])
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for vx, vy in variants:
        out = fn(vx, vy)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / len(variants)
    print(f"XLA quad-gather baseline: {total_blocks * B / dt / 1e6:.0f} "
          f"M samples/s")

    # accuracy
    n_outer, inner = 16, 8
    xs0, ys0 = positions(n_outer, inner)
    xs = jnp.asarray(xs0, jnp.float32)
    ys = jnp.asarray(ys0, jnp.float32)
    fn = make_sampler_v4(H, W, 24, n_outer, inner)
    vals, ok = fn(img, xs, ys)
    from apde_mvs_tpu.core.sampling import bilinear_sample
    want = np.asarray(bilinear_sample(img, xs, ys))
    got = np.asarray(vals)
    okn = np.asarray(ok)
    err = np.abs(got - want)[okn]
    print(f"ok fraction: {okn.mean():.4f}; max err on ok: {err.max():.6f}")


if __name__ == "__main__":
    main()
