"""Settle the timing question: block_until_ready through the axon tunnel is
sometimes async (impossible TB/s readings).  Re-measure the gather matrix
with HOST READBACK (np.asarray) forcing completion, both styles side by side.
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
LOOPS = 8


def timed(fn, args_fn, rows, label):
    out = fn(*args_fn(0))
    _ = float(jnp.mean(out))          # force
    tb, trb = [], []
    for r in range(3):
        a = args_fn(r + 1)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        _ = np.asarray(out[:1, :1])   # host readback forces completion
        t2 = time.perf_counter()
        tb.append(t1 - t0)
        trb.append(t2 - t0)
    dt_b, dt_r = min(tb), min(trb)
    print(f"  {label:20s}: block {dt_b*1e3:8.1f} ms ({rows/dt_b/1e6:.0f} M/s)"
          f"   readback {dt_r*1e3:8.1f} ms ({rows/dt_r/1e6:.0f} M/s)")


def body_once(tab, idx, acc):
    v = jnp.take(tab, idx, axis=0)
    s = v.sum(-1)
    return (idx + s.astype(jnp.int32)) % HW, acc + s


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(23)
    tab = jnp.asarray(rng.random((HW, 4)), jnp.float32)
    jax.block_until_ready(tab)
    mk = lambda r: (tab, jnp.asarray(
        rng.integers(0, HW, (B, T)), jnp.int32))
    rows = B * T * LOOPS

    def arg_flat(tab, idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            idx, acc = body_once(tab, idx, acc)
        return acc
    timed(jax.jit(arg_flat), mk, rows, "arg+flat")

    def arg_scan(tab, idx):
        def sbody(carry, _):
            idx, acc = carry
            idx, acc = body_once(tab, idx, acc)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(
            sbody, (idx, jnp.zeros((B, T), jnp.float32)), None,
            length=LOOPS)
        return acc
    timed(jax.jit(arg_scan), mk, rows, "arg+scan")

    def clo_flat(idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            idx, acc = body_once(tab, idx, acc)
        return acc
    timed(jax.jit(clo_flat), lambda r: (mk(r)[1],), rows, "closure+flat")

    def scan_unroll(tab, idx):
        def sbody(carry, _):
            idx, acc = carry
            for i in range(LOOPS // 2):
                idx, acc = body_once(tab, idx, acc)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(
            sbody, (idx, jnp.zeros((B, T), jnp.float32)), None, length=2)
        return acc
    timed(jax.jit(scan_unroll), mk, rows, "scan(2)xunroll(4)")


if __name__ == "__main__":
    main()
