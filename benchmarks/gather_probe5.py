"""Phase 5 probes for the fused-sweep sampler design.

Two families:

P0 — XLA gather economics: measured rate is "row-count-bound" (~193 M
rows/s for (N,4) quad rows).  If wider rows / bigger slice_sizes gather at
the same row rate, one gathered row can serve several taps of a warped
window row (strip packing), multiplying effective sample throughput without
any Mosaic risk.

P2 — Mosaic lane-gather capabilities: dtype support (i32 for u8-quad
packing, u16 pairs) and source-width limits for `jnp.take_along_axis`
inside a Pallas kernel.

All loops carry data dependences (axon memoizes identical calls).
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


def _time_varied(fn, make_args, reps=3):
    """Time with FRESH inputs per rep: the axon layer memoizes repeated
    identical computations, so identical-args reps measure nothing."""
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(1, reps + 1):
        args = make_args(r)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------- P0: XLA

def make_xla_row_take(n_rows, width, n_idx, loops=8):
    """take rows from an (n_rows, width) table, chained."""
    def run(tab, idx):
        acc = jnp.zeros((n_idx, width), jnp.float32)
        for i in range(loops):
            rows = jnp.take(tab, (idx + i) % n_rows, axis=0)
            acc = acc + rows
        return acc
    return jax.jit(run)


def make_xla_slice_gather(n_rows, width, n_idx, k, loops=8):
    """lax.gather with slice_sizes (k, width) per index (strip fetch)."""
    import jax.lax as lax

    def run(tab, idx):
        acc = jnp.zeros((n_idx, k, width), jnp.float32)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        for i in range(loops):
            st = ((idx + i) % (n_rows - k))[:, None]
            g = lax.gather(tab, st, dn, slice_sizes=(k, width))
            acc = acc + g
        return acc
    return jax.jit(run)


def p0():
    rng = np.random.default_rng(0)
    n_rows = 1 << 19
    n_idx = 1 << 17
    print("== P0: XLA row-take, width sweep ==")
    for width in (4, 8, 16, 32, 64):
        tab = jnp.asarray(rng.random((n_rows, width)), jnp.float32)
        fn = make_xla_row_take(n_rows, width, n_idx)
        mk = lambda r: (tab, jnp.asarray(
            rng.integers(0, n_rows, (n_idx,)), jnp.int32))
        dt = _time_varied(fn, mk)
        rate = n_idx * 8 / dt
        print(f"  take rows (N,{width}): {rate/1e6:.0f} M rows/s "
              f"({rate*width*4/1e9:.1f} GB/s)")
    print("== P0b: XLA gather slice_sizes (k,4) strip fetch ==")
    tab = jnp.asarray(rng.random((n_rows, 4)), jnp.float32)
    for k in (1, 2, 4, 8, 16):
        try:
            fn = make_xla_slice_gather(n_rows, 4, n_idx, k)
            mk = lambda r: (tab, jnp.asarray(
                rng.integers(0, n_rows - 64, (n_idx,)), jnp.int32))
            dt = _time_varied(fn, mk)
            rate = n_idx * 8 / dt
            print(f"  gather slice ({k},4): {rate/1e6:.0f} M slices/s "
                  f"({rate*k*16/1e9:.1f} GB/s)")
        except Exception as e:
            print(f"  gather slice ({k},4): FAIL {str(e)[:90]}")


# -------------------------------------------------------------- P2: Mosaic

def make_lane_gather_dtype(shape, dtype, loops=256):
    w = shape[-1]

    def kernel(z_ref, idx_ref, out_ref):
        def body(i, carry):
            idx = (idx_ref[:] + i) % w
            g = jnp.take_along_axis(z_ref[:], idx, axis=-1)
            if g.dtype != jnp.float32:
                g = g.astype(jnp.float32) if g.dtype != jnp.int32 \
                    else g.astype(jnp.float32)
            return carry + g
        out_ref[:] = jax.lax.fori_loop(
            0, loops, body, jnp.zeros(shape, jnp.float32))

    @jax.jit
    def run(z, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, idx)
    return run


def make_quad_u8_sampler(rows, w, loops=256):
    """Full bilinear via ONE i32 gather of a u8x4 quad + unpack + lerp."""

    def kernel(q_ref, xi_ref, fx_ref, fy_ref, out_ref):
        def body(i, carry):
            idx = (xi_ref[:] + i) % w
            q = jnp.take_along_axis(q_ref[:], idx, axis=-1)
            v00 = (q & 0xFF).astype(jnp.float32)
            v01 = ((q >> 8) & 0xFF).astype(jnp.float32)
            v10 = ((q >> 16) & 0xFF).astype(jnp.float32)
            v11 = ((q >> 24) & 0xFF).astype(jnp.float32)
            fx = fx_ref[:] + i * 1e-4
            fy = fy_ref[:]
            top = v00 + fx * (v01 - v00)
            bot = v10 + fx * (v11 - v10)
            return carry + top + fy * (bot - top)
        out_ref[:] = jax.lax.fori_loop(
            0, loops, body, jnp.zeros((rows, w), jnp.float32))

    @jax.jit
    def run(q, xi, fx, fy):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(q, xi, fx, fy)
    return run


def make_col_gather_collapse(w, loops=256):
    """Column-replicated gather from an 8-row slab + one-hot row collapse:
    2D sampling from an (8, w) window at 8 gathered elems/tap."""

    def kernel(slab_ref, xi_ref, ly_ref, out_ref):
        slab = slab_ref[:]
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (8, w), 0)

        def body(i, carry):
            idx = (xi_ref[:] + i) % w
            g = jnp.take_along_axis(slab, idx, axis=-1)     # col per lane
            ly = (ly_ref[:] + i) % 8
            top = jnp.where(s_ids == ly, g, 0.0).sum(0, keepdims=True)
            return carry + top
        out_ref[:] = jax.lax.fori_loop(
            0, loops, body, jnp.zeros((1, w), jnp.float32))

    @jax.jit
    def run(slab, xi, ly):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(slab, xi, ly)
    return run


def p2():
    rng = np.random.default_rng(1)
    print("== P2: Mosaic lane-gather dtype/width support ==")
    cases = [
        ((8, 128), jnp.float32), ((8, 128), jnp.int32),
        ((8, 128), jnp.bfloat16), ((8, 256), jnp.bfloat16),
        ((8, 256), jnp.uint16) if hasattr(jnp, "uint16") else None,
        ((16, 128), jnp.float32), ((64, 128), jnp.float32),
        ((8, 256), jnp.float32),
    ]
    loops = 256
    for case in cases:
        if case is None:
            continue
        shape, dtype = case
        w = shape[-1]
        if dtype in (jnp.float32, jnp.bfloat16):
            z = jnp.asarray(rng.random(shape), dtype)
        else:
            z = jnp.asarray(rng.integers(0, 1 << 30, shape), dtype)
        try:
            fn = make_lane_gather_dtype(shape, dtype, loops)
            mk = lambda r: (z, jnp.asarray(
                rng.integers(0, w, shape), jnp.int32))
            dt = _time_varied(fn, mk)
            n = shape[0] * shape[1] * loops
            print(f"  take_along_axis {shape} {dtype.__name__}: "
                  f"{n/dt/1e9:.2f} G elems/s")
        except Exception as e:
            print(f"  take_along_axis {shape} {dtype.__name__}: "
                  f"FAIL {str(e)[:80]}")

    print("== P2b: u8-quad one-gather bilinear ==")
    for rows in (8, 32):
        q = jnp.asarray(rng.integers(0, 1 << 31, (rows, 128)), jnp.int32)
        try:
            fn = make_quad_u8_sampler(rows, 128)
            mk = lambda r: (q,
                jnp.asarray(rng.integers(0, 128, (rows, 128)), jnp.int32),
                jnp.asarray(rng.random((rows, 128)), jnp.float32),
                jnp.asarray(rng.random((rows, 128)), jnp.float32))
            dt = _time_varied(fn, mk)
            n = rows * 128 * 256
            print(f"  u8-quad bilinear ({rows},128): "
                  f"{n/dt/1e6:.0f} M samples/s")
        except Exception as e:
            print(f"  u8-quad bilinear ({rows},128): FAIL {str(e)[:80]}")

    print("== P2c: column gather + one-hot row collapse (2D from slab) ==")
    slab = jnp.asarray(rng.random((8, 128)), jnp.float32)
    try:
        fn = make_col_gather_collapse(128)
        mk = lambda r: (slab,
            jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32),
            jnp.asarray(rng.integers(0, 8, (8, 128)), jnp.int32))
        dt = _time_varied(fn, mk)
        n = 128 * 256   # taps per loop = lane count (w)
        print(f"  col-gather+collapse (8,128) slab: "
              f"{n/dt/1e6:.0f} M taps/s")
    except Exception as e:
        print(f"  col-gather+collapse: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    p0()
    p2()
