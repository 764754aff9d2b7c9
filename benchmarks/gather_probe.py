"""Microbenchmark: Mosaic in-kernel gather primitives on the real TPU.

Decides the round-2 fused-sweep kernel design: how fast can a Pallas kernel
gather from a VMEM-resident window, per formulation? Each variant loops the
gather in-kernel with a data dependence between iterations (the axon layer
memoizes repeated identical computations, and back-to-back launches hide
in-kernel rates).

Run: python benchmarks/gather_probe.py
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

N = 8 * 128          # requests per iteration
LOOPS = 256          # in-kernel iterations


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_lane_gather(width):
    """take_along_axis along lanes of an (8, width) tile, per request row."""

    def kernel(z_ref, idx_ref, out_ref):
        def body(i, carry):
            idx = (idx_ref[:] + i) % width
            g = jnp.take_along_axis(z_ref[:], idx, axis=-1)
            return carry + g
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body,
                                       jnp.zeros_like(idx_ref[:], jnp.float32))

    @jax.jit
    def run(z, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, idx)
    return run


def make_flat_take(table_len, idx_shape):
    """jnp.take from a flat VMEM table (shared window) with 2D indices."""

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[0]
        def body(i, carry):
            idx = (idx_ref[:] + i) % table_len
            g = jnp.take(tab, idx, axis=0)
            return carry + g
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body,
                                       jnp.zeros(idx_shape, jnp.float32))

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return run


def make_quad_take(table_rows, n_rows):
    """Row gather from a (table_rows, 4) quad table: 1 row = 1 bilinear."""

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, carry):
            idx = (idx_ref[:, 0] + i) % table_rows
            rows = jnp.take(tab_ref[:], idx, axis=0)        # (n_rows, 4)
            return carry + rows
        acc = jax.lax.fori_loop(0, LOOPS, body,
                                jnp.zeros((n_rows, 4), jnp.float32))
        out_ref[:] = acc

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, 4), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return run


def make_roll_select(width, krange):
    """Gather via select over krange static rolls (bounded-deviation trick)."""

    def kernel(z_ref, d_ref, out_ref):
        z = z_ref[:]
        def body(i, carry):
            d = (d_ref[:] + i) % krange
            acc = jnp.zeros_like(z)
            for k in range(krange):
                rolled = pltpu.roll(z, -k, 1)
                acc = acc + jnp.where(d == k, rolled, 0.0)
            return carry + acc
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body, jnp.zeros_like(z))

    @jax.jit
    def run(z, d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(z.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, d)
    return run


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # 1. lane take_along_axis, (8, 128) source rows
    for width in (128, 512):
        rows = 8
        z = jnp.asarray(rng.random((rows, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, width, (rows, width)), jnp.int32)
        try:
            fn = make_lane_gather(width)
            dt = _time(fn, z, idx)
            rate = rows * width * LOOPS / dt
            print(f"take_along_axis lanes ({rows}x{width}): "
                  f"{rate / 1e9:.2f} G elems/s")
        except Exception as e:
            print(f"take_along_axis lanes width={width}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")

    # 2. flat jnp.take from shared table, 2D (8, 128) indices
    for table_len in (1024, 4096, 32768):
        tab = jnp.asarray(rng.random((1, table_len)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, table_len, (8, 128)), jnp.int32)
        try:
            fn = make_flat_take(table_len, (8, 128))
            dt = _time(fn, tab, idx)
            rate = 8 * 128 * LOOPS / dt
            print(f"jnp.take flat table[{table_len}] -> (8,128): "
                  f"{rate / 1e9:.2f} G elems/s")
        except Exception as e:
            print(f"jnp.take flat table[{table_len}]: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")

    # 3. quad-row take from small VMEM table
    for table_rows in (1024, 8192):
        tab = jnp.asarray(rng.random((table_rows, 4)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, table_rows, (N, 1)), jnp.int32)
        try:
            fn = make_quad_take(table_rows, N)
            dt = _time(fn, tab, idx)
            rate = N * LOOPS / dt
            print(f"quad-row take table[{table_rows},4] x {N}: "
                  f"{rate / 1e6:.0f} M rows/s")
        except Exception as e:
            print(f"quad-row take table[{table_rows},4]: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")

    # 4. roll-select bounded-deviation gather
    for krange in (8, 16, 32):
        z = jnp.asarray(rng.random((8, 128)), jnp.float32)
        d = jnp.asarray(rng.integers(0, krange, (8, 128)), jnp.int32)
        try:
            fn = make_roll_select(128, krange)
            dt = _time(fn, z, d)
            rate = 8 * 128 * LOOPS / dt
            print(f"roll-select K={krange} (8x128): "
                  f"{rate / 1e9:.2f} G elems/s")
        except Exception as e:
            print(f"roll-select K={krange}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__" and "--phase2" not in _sys.argv:
    main()


def make_lane_gather_smallsrc(width, src_w):
    """take_along_axis where the source is (8, src_w) but idx covers width."""

    def kernel(z_ref, idx_ref, out_ref):
        def body(i, carry):
            idx = (idx_ref[:] + i) % src_w
            g = jnp.take_along_axis(z_ref[:], idx, axis=-1)
            return carry + g
        out_ref[:] = jax.lax.fori_loop(0, LOOPS, body,
                                       jnp.zeros_like(idx_ref[:], jnp.float32))

    @jax.jit
    def run(z, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, idx)
    return run


def make_unaligned_slice(img_w, cw):
    """Dynamic lane-offset window slice from a VMEM image."""

    def kernel(img_ref, off_ref, out_ref):
        def body(i, carry):
            off = (off_ref[0] + i * 7) % (img_w - cw)
            win = img_ref[:, pl.ds(off, cw)]
            return carry + win
        out_ref[:] = jax.lax.fori_loop(
            0, LOOPS, body, jnp.zeros((8, cw), jnp.float32))

    @jax.jit
    def run(img, off):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, cw), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, off)
    return run


def make_mxu_y_collapse(rw, cw, block):
    """yhat (block, rw) @ win (rw, cw) on the MXU, in-kernel loop."""

    def kernel(win_ref, yl_ref, out_ref):
        win = win_ref[:]
        def body(i, carry):
            yl = yl_ref[:] + (i % 3) * 0.25
            p_ids = jax.lax.broadcasted_iota(
                jnp.int32, (block, rw), 1).astype(jnp.float32)
            yhat = jnp.maximum(0.0, 1.0 - jnp.abs(yl - p_ids))
            z = jnp.dot(yhat, win, preferred_element_type=jnp.float32)
            return carry + z
        out_ref[:] = jax.lax.fori_loop(
            0, LOOPS, body, jnp.zeros((block, cw), jnp.float32))

    @jax.jit
    def run(win, yl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, cw), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(win, yl)
    return run


def main2():
    rng = np.random.default_rng(0)
    # gather width sweep: source (8, w)
    for w in (128, 192, 256, 384):
        z = jnp.asarray(rng.random((8, w)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, w, (8, w)), jnp.int32)
        try:
            fn = make_lane_gather(w)
            dt = _time(fn, z, idx)
            print(f"take_along_axis src width {w}: "
                  f"{8 * w * LOOPS / dt / 1e9:.2f} G elems/s")
        except Exception as e:
            print(f"take_along_axis src width {w}: FAIL {str(e)[:90]}")
    # gather (8,128) idx from WIDER source
    for src_w in (256, 384):
        z = jnp.asarray(rng.random((8, src_w)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, src_w, (8, 128)), jnp.int32)
        try:
            fn = make_lane_gather_smallsrc(128, src_w)
            dt = _time(fn, z, idx)
            print(f"take_along_axis idx(8,128) from (8,{src_w}): "
                  f"{8 * 128 * LOOPS / dt / 1e9:.2f} G elems/s")
        except Exception as e:
            print(f"take_along_axis idx(8,128) from (8,{src_w}): FAIL {str(e)[:90]}")
    # unaligned dynamic lane slice
    img = jnp.asarray(rng.random((8, 1024)), jnp.float32)
    off = jnp.asarray([3], jnp.int32)
    try:
        fn = make_unaligned_slice(1024, 128)
        dt = _time(fn, img, off)
        print(f"unaligned lane window slice (8,128): "
              f"{8 * 128 * LOOPS / dt / 1e9:.2f} G elems/s equivalent")
    except Exception as e:
        print(f"unaligned lane window slice: FAIL {str(e)[:90]}")
    # MXU y-collapse rate
    for rw, block in ((16, 1024), (32, 1024)):
        win = jnp.asarray(rng.random((rw, 128)), jnp.float32)
        yl = jnp.asarray(rng.random((block, rw)) * rw, jnp.float32)
        try:
            fn = make_mxu_y_collapse(rw, 128, block)
            dt = _time(fn, win, yl)
            print(f"MXU y-collapse rw={rw} block={block}: "
                  f"{block * LOOPS / dt / 1e6:.0f} M samples/s")
        except Exception as e:
            print(f"MXU y-collapse rw={rw}: FAIL {str(e)[:90]}")


if __name__ == "__main__" and "--phase2" in _sys.argv:
    main2()
