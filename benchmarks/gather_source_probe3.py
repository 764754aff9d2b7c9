"""Refine the gather fast-path conditions: is lax.scan fatal per se, or
only when the gather count per body is small?

probe2: arg+flat -> 242 G rows/s (VMEM bandwidth); arg+scan -> 148 M rows/s.
If a scan whose BODY contains several unrolled gathers still runs the body's
gathers on the fast path, the framework can keep its compile-friendly outer
iteration scans and only unroll the inner candidate/view loops.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

HW = 480000
B, T = 240000, 36


def timed(fn, args_fn, rows, label):
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    ts = []
    for r in range(3):
        a = args_fn(r + 1)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"  {label:24s}: {dt*1e3:8.1f} ms  {rows/dt/1e6:8.0f} M rows/s")


def body_once(tab, idx, acc):
    v = jnp.take(tab, idx, axis=0)
    s = v.sum(-1)
    return (idx + s.astype(jnp.int32)) % HW, acc + s


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(11)
    tab = jnp.asarray(rng.random((HW, 4)), jnp.float32)
    jax.block_until_ready(tab)
    mk = lambda r: (tab, jnp.asarray(
        rng.integers(0, HW, (B, T)), jnp.int32))

    # scan(2) x 4 unrolled gathers per body
    def scan2_unroll4(tab, idx):
        def sbody(carry, _):
            idx, acc = carry
            for i in range(4):
                idx, acc = body_once(tab, idx, acc)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(
            sbody, (idx, jnp.zeros((B, T), jnp.float32)), None, length=2)
        return acc
    timed(jax.jit(scan2_unroll4), mk, B * T * 8, "scan(2) x unroll(4)")

    # fori_loop x 4 gathers
    def fori4(tab, idx):
        def fbody(i, carry):
            idx, acc = carry
            idx, acc = body_once(tab, idx, acc)
            return idx, acc
        idx, acc = jax.lax.fori_loop(
            0, 4, fbody, (idx, jnp.zeros((B, T), jnp.float32)))
        return acc
    timed(jax.jit(fori4), mk, B * T * 4, "fori(4) x 1")

    # flat 16 gathers (bigger flat baseline; also compile-time feel)
    def flat16(tab, idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(16):
            idx, acc = body_once(tab, idx, acc)
        return acc
    t0 = time.perf_counter()
    fn = jax.jit(flat16)
    out = fn(*mk(0))
    jax.block_until_ready(out)
    print(f"    (flat16 compile+1st: {time.perf_counter()-t0:.1f} s)")
    timed(fn, mk, B * T * 16, "flat x 16")

    # table 2x bigger than VMEM-friendly (15.4 MB): still fast?
    tab2 = jnp.asarray(rng.random((2 * HW, 4)), jnp.float32)
    mk2 = lambda r: (tab2, jnp.asarray(
        rng.integers(0, 2 * HW, (B, T)), jnp.int32))

    def flat4_big(tab, idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(4):
            v = jnp.take(tab, idx, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % (2 * HW)
        return acc
    timed(jax.jit(flat4_big), mk2, B * T * 4, "flat x 4, 15MB table")


if __name__ == "__main__":
    main()
