"""Pin the XLA:TPU gather fast-path conditions.

Matrix: table provenance {jit argument, closure constant} x graph structure
{flat python loop, lax.scan body} x {static table, dynamic view slice}.

gather_shape_probe (table=argument, flat graph): ~100 G rows/s.
gather_source_probe (table=closure):             ~147 M rows/s.
The real sweep (table=argument but gathers inside nested lax.scan):
~170 M rows/s.  Which condition kills the fast path?
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

HW = 480000
S = 10
B, T = 240000, 36
LOOPS = 4


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
    print(f"  {label:16s}: {dt*1e3:8.1f} ms  {rows/dt/1e6:8.0f} M rows/s")


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(7)
    quads = jnp.asarray(rng.random((S, HW, 4)), jnp.float32)
    tab_c = quads[0]
    jax.block_until_ready(tab_c)
    rows = B * T * LOOPS
    mk1 = lambda r: (jnp.asarray(rng.integers(0, HW, (B, T)), jnp.int32),)
    mk2 = lambda r: (tab_c, mk1(r)[0])
    mk3 = lambda r: (quads, mk1(r)[0])

    def body_once(tab, idx, acc):
        v = jnp.take(tab, idx, axis=0)
        s = v.sum(-1)
        return (idx + s.astype(jnp.int32)) % HW, acc + s

    # 1. argument table, flat python loop
    def arg_flat(tab, idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            idx, acc = body_once(tab, idx, acc)
        return acc
    timed(jax.jit(arg_flat), mk2, rows, "arg+flat")

    # 2. closure table, flat python loop
    def clo_flat(idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            idx, acc = body_once(tab_c, idx, acc)
        return acc
    timed(jax.jit(clo_flat), mk1, rows, "closure+flat")

    # 3. argument table, gathers inside lax.scan
    def arg_scan(tab, idx):
        def sbody(carry, _):
            idx, acc = carry
            idx, acc = body_once(tab, idx, acc)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(
            sbody, (idx, jnp.zeros((B, T), jnp.float32)), None, length=LOOPS)
        return acc
    timed(jax.jit(arg_scan), mk2, rows, "arg+scan")

    # 4. argument (S,HW,4), dynamic view slice inside scan
    def arg_scan_dyn(qs, idx):
        def sbody(carry, _):
            s, idx, acc = carry
            idx, acc = body_once(qs[s], idx, acc)
            return (s + 1, idx, acc), None
        (_, _, acc), _ = jax.lax.scan(
            sbody, (jnp.int32(0), idx, jnp.zeros((B, T), jnp.float32)),
            None, length=LOOPS)
        return acc
    timed(jax.jit(arg_scan_dyn), mk3, rows, "arg+scan+dynsl")

    # 5. argument flat big table, flat loop, offset indices
    def arg_flatbig(qs, idx):
        flat = qs.reshape(-1, 4)
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            v = jnp.take(flat, idx + i * HW, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % HW
        return acc
    timed(jax.jit(arg_flatbig), mk3, rows, "arg+flatbig")


if __name__ == "__main__":
    main()
