"""Phase 3: one-hot x-select + dynamic roll + full sampler-v2 candidate."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOOPS = 64
B = 1024


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_onehot_select(cw, dtype):
    """out[j] = (1-fx)*Z[j,x0] + fx*Z[j,x0+1] via iota compare + reduce."""

    def kernel(z_ref, xl_ref, out_ref):
        z = z_ref[:].astype(dtype)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (B, cw), 1)
        def body(i, carry):
            xl = xl_ref[:, 0] + 0.37 * i
            xl = xl - jnp.floor(xl / (cw - 1.0)) * (cw - 1.0)
            x0 = jnp.floor(xl).astype(jnp.int32)
            fx = (xl - x0.astype(jnp.float32)).astype(dtype)
            left = jnp.where(c_ids == x0[:, None], z, 0).sum(-1)
            right = jnp.where(c_ids == x0[:, None] + 1, z, 0).sum(-1)
            val = (1 - fx) * left + fx * right
            return carry + val.astype(jnp.float32)
        out_ref[:, 0] = jax.lax.fori_loop(
            0, LOOPS, body, jnp.zeros((B,), jnp.float32))

    @jax.jit
    def run(z, xl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, xl)
    return run


def make_dynamic_roll(cw):
    def kernel(z_ref, off_ref, out_ref):
        def body(i, carry):
            off = (off_ref[0] + i) % cw
            r = pltpu.roll(z_ref[:], off, 1)
            return carry + r
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body,
                                       jnp.zeros_like(z_ref[:]))

    @jax.jit
    def run(z, off):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(z.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, off)
    return run


def make_sampler_v2(H, W, rw, n_blocks, dtype):
    """Full candidate: window slice (aligned 256) -> dyn roll to 128 ->
    MXU y-collapse -> one-hot x-select. Positions arrive as (nb, B, 2)."""
    cw = 128

    def kernel(img_ref, xs_ref, ys_ref, out_ref):
        xs = xs_ref[0]                           # (B, 1)
        ys = ys_ref[0]
        rmin = jnp.clip(jnp.min(ys).astype(jnp.int32) - 1, 0, H - rw) & ~7
        rmin = pl.multiple_of(rmin, 8)
        cstart = jnp.clip(jnp.min(xs).astype(jnp.int32) - 1, 0, W - cw)
        cal = jnp.minimum(cstart & ~127, W - 256)
        cal = pl.multiple_of(cal, 128)
        off = cstart - cal
        win256 = img_ref[pl.ds(rmin, rw), pl.ds(cal, 256)]
        win = pltpu.roll(win256, 256 - off, 1)[:, :cw].astype(dtype)
        yl = jnp.clip(ys - rmin.astype(jnp.float32), 0.0, rw - 1.0)
        xl = jnp.clip(xs - cstart.astype(jnp.float32), 0.0, cw - 1.0)
        p_ids = jax.lax.broadcasted_iota(jnp.int32, (B, rw), 1)
        yhat = jnp.maximum(
            0.0, 1.0 - jnp.abs(yl - p_ids.astype(jnp.float32))).astype(dtype)
        z = jnp.dot(yhat, win, preferred_element_type=jnp.float32)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (B, cw), 1)
        x0 = jnp.floor(xl[:, 0]).astype(jnp.int32)
        fx = xl[:, 0] - x0.astype(jnp.float32)
        left = jnp.where(c_ids == x0[:, None], z, 0).sum(-1)
        right = jnp.where(c_ids == x0[:, None] + 1, z, 0).sum(-1)
        out_ref[0, :, 0] = (1 - fx) * left + fx * right

    @jax.jit
    def run(img, xs, ys):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((H, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, B, 1), jnp.float32),
        )(img, xs, ys)
    return run


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    for dtype, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        z = jnp.asarray(rng.random((B, 128)), jnp.float32)
        xl = jnp.asarray(rng.random((B, 1)) * 126, jnp.float32)
        try:
            fn = make_onehot_select(128, dtype)
            dt = _time(fn, z, xl)
            print(f"one-hot bilinear x-select {nm} (1024x128): "
                  f"{B * LOOPS / dt / 1e6:.0f} M samples/s")
        except Exception as e:
            print(f"one-hot x-select {nm}: FAIL {str(e)[:90]}")

    z = jnp.asarray(rng.random((8, 256)), jnp.float32)
    off = jnp.asarray([5], jnp.int32)
    try:
        fn = make_dynamic_roll(256)
        dt = _time(fn, z, off)
        print(f"dynamic roll (8,256): ok, {8*256*LOOPS/dt/1e9:.2f} G elems/s")
    except Exception as e:
        print(f"dynamic roll: FAIL {str(e)[:90]}")

    # full sampler-v2 candidate on a realistic source
    H, W = 608, 896
    img = jnp.asarray(rng.random((H, W)) * 255, jnp.float32)
    n_blocks = 256
    # block-coherent positions: cluster centers + jitter
    cx = rng.uniform(20, W - 20, (n_blocks, 1, 1))
    cy = rng.uniform(20, H - 20, (n_blocks, 1, 1))
    xs = np.clip(cx + rng.uniform(-40, 40, (n_blocks, B, 1)), 0, W - 2)
    ys = np.clip(cy + rng.uniform(-6, 6, (n_blocks, B, 1)), 0, H - 2)
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    # time with DISTINCT inputs per rep: the axon layer memoizes repeated
    # identical computations, which would fake the rate
    variants = [(jnp.asarray(np.clip(np.asarray(xs) + 0.37 * i, 0, W - 2)),
                 jnp.asarray(np.clip(np.asarray(ys) + 0.21 * i, 0, H - 2)))
                for i in range(8)]
    for dtype, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for rw in (16, 24):
            try:
                fn = make_sampler_v2(H, W, rw, n_blocks, dtype)
                out = fn(img, *variants[0])
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for vx, vy in variants:
                    out = fn(img, vx, vy)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / len(variants)
                print(f"sampler-v2 {nm} rw={rw}: "
                      f"{n_blocks * B / dt / 1e6:.0f} M samples/s")
            except Exception as e:
                print(f"sampler-v2 {nm} rw={rw}: FAIL {str(e)[:90]}")
    # accuracy check vs oracle
    from apde_mvs_tpu.core.sampling import bilinear_sample
    fn = make_sampler_v2(H, W, 24, n_blocks, jnp.float32)
    got = np.asarray(fn(img, xs, ys)).reshape(n_blocks, B)
    want = np.asarray(bilinear_sample(img, xs.reshape(-1, B), ys.reshape(-1, B)))
    err = np.abs(got - want)
    print(f"sampler-v2 f32 max err vs oracle: {err.max():.5f} "
          f"(mean {err.mean():.6f})")


if __name__ == "__main__":
    main()
