"""Re-verify Mosaic in-kernel lane-gather rates with READBACK-forced timing.

Earlier probes timed with block_until_ready only, which the axon tunnel
sometimes treats as async (impossible TB/s readings observed).  Every
measurement here ends with a host readback, and the in-kernel loop count is
large enough that one call is O(100 ms) at the hypothesized rates.

Key numbers wanted:
  - take_along_axis (8,128) f32 in-kernel loop   (claimed 4.1 G elems/s)
  - same, int32 (u8-quad candidate)              (claimed 2.8 G elems/s)
  - u8-quad bilinear: gather i32 + unpack + lerp (full sample pipeline)
  - XLA quad-row take reference on identical request count
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

LOOPS = 65536         # in-kernel iterations
R, W = 8, 128         # request tile


def timed_readback(fn, args_fn, work, label, reps=3):
    out = fn(*args_fn(0))
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    ts = []
    for r in range(reps):
        a = args_fn(r + 1)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"  {label:28s}: {dt*1e3:8.1f} ms  {work/dt/1e9:6.2f} G elems/s")


def make_lane_gather(dtype):
    def kernel(z_ref, idx_ref, out_ref):
        def body(i, carry):
            idx = (idx_ref[:] + i) % W
            g = jnp.take_along_axis(z_ref[:], idx, axis=-1)
            return carry + g.astype(jnp.float32)
        out_ref[:] = jax.lax.fori_loop(
            0, LOOPS, body, jnp.zeros((R, W), jnp.float32))

    @jax.jit
    def run(z, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(z, idx)
    return run


def make_u8quad(loops=LOOPS):
    def kernel(q_ref, xi_ref, fx_ref, fy_ref, out_ref):
        def body(i, carry):
            idx = (xi_ref[:] + i) % W
            q = jnp.take_along_axis(q_ref[:], idx, axis=-1)
            v00 = (q & 0xFF).astype(jnp.float32)
            v01 = ((q >> 8) & 0xFF).astype(jnp.float32)
            v10 = ((q >> 16) & 0xFF).astype(jnp.float32)
            v11 = ((q >> 24) & 0xFF).astype(jnp.float32)
            fx = fx_ref[:]
            fy = fy_ref[:]
            top = v00 + fx * (v01 - v00)
            bot = v10 + fx * (v11 - v10)
            return carry + top + fy * (bot - top)
        out_ref[:] = jax.lax.fori_loop(
            0, loops, body, jnp.zeros((R, W), jnp.float32))

    @jax.jit
    def run(q, xi, fx, fy):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(q, xi, fx, fy)
    return run


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}  loops={LOOPS}")
    rng = np.random.default_rng(31)
    work = R * W * LOOPS

    z32 = jnp.asarray(rng.random((R, W)), jnp.float32)
    mkf = lambda r: (z32, jnp.asarray(
        rng.integers(0, W, (R, W)), jnp.int32))
    timed_readback(make_lane_gather(jnp.float32), mkf, work,
                   "lane gather f32 (8,128)")

    zi = jnp.asarray(rng.integers(0, 1 << 31, (R, W)), jnp.int32)
    mki = lambda r: (zi, jnp.asarray(
        rng.integers(0, W, (R, W)), jnp.int32))
    timed_readback(make_lane_gather(jnp.int32), mki, work,
                   "lane gather i32 (8,128)")

    mkq = lambda r: (zi,
                     jnp.asarray(rng.integers(0, W, (R, W)), jnp.int32),
                     jnp.asarray(rng.random((R, W)), jnp.float32),
                     jnp.asarray(rng.random((R, W)), jnp.float32))
    timed_readback(make_u8quad(), mkq, work, "u8-quad bilinear (8,128)")

    # XLA reference: same sample count via quad-row take, chained in-graph
    HW = 480000
    tab = jnp.asarray(rng.random((HW, 4)), jnp.float32)
    BX = 1 << 17
    xl = 256  # in-graph loop count

    def xla_chain(tab, idx):
        acc = jnp.zeros((BX,), jnp.float32)
        for i in range(xl):
            v = jnp.take(tab, idx, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % HW
        return acc
    mkx = lambda r: (tab, jnp.asarray(
        rng.integers(0, HW, (BX,)), jnp.int32))
    timed_readback(jax.jit(xla_chain), mkx, BX * xl, "XLA quad-row take")


if __name__ == "__main__":
    main()
