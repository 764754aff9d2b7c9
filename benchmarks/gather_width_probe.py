"""Row-WIDTH scaling of the XLA:TPU row gather.

All prior probes (gather_source_probe*) fixed the table row at (N, 4) f32 —
the quad layout — and measured ~165 M rows/s regardless of graph structure.
If the gather unit is ROW-COUNT bound (issue-limited, ~5 cyc/row) rather
than byte bound, a wider row is free: a (N, 128) u8 row can carry an
8-row x 16-col source-image span tile, and ONE gather then serves every
tap of an NCC window that lands in that tile — turning the 1-gather-per-tap
economics (the round-2 ceiling) into 2-4 gathers per 36-tap window.

Timing discipline per CLAUDE.md: fresh indices per rep, chained data
dependencies between loop iterations (axon memoizes repeated identical
calls), host readback inside the timed region, O(100ms)+ work per call,
marginal rate across two LOOP counts to subtract dispatch overhead.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

HW = 480000
B, T = 240000, 36          # one color half x 36 taps (bench shapes)


def chain(tab, idx, loops):
    # consume EVERY gathered column: summing only [..., :4] would let
    # XLA narrow the gather's slice_sizes for wide rows and the probe
    # would no longer measure full-row gathers
    acc = jnp.zeros((B, T), jnp.float32)
    for _ in range(loops):
        v = jnp.take(tab, idx, axis=0)
        s = v.astype(jnp.float32).sum(-1)
        idx = (idx + s.astype(jnp.int32)) % HW
        acc = acc + s
    return acc


def measure(tab, label, loops_a=4, loops_b=8):
    rng = np.random.default_rng(hash(label) % 2**32)
    f_a = jax.jit(lambda t, i: chain(t, i, loops_a))
    f_b = jax.jit(lambda t, i: chain(t, i, loops_b))
    mk = lambda: jnp.asarray(rng.integers(0, HW, (B, T)), np.int32)
    # warm both compiles
    _ = np.asarray(f_a(tab, mk())[:1, :1])
    _ = np.asarray(f_b(tab, mk())[:1, :1])
    times = {}
    for name, f in (("a", f_a), ("b", f_b)):
        ts = []
        for _ in range(3):
            i = mk()
            jax.block_until_ready((tab, i))
            t0 = time.perf_counter()
            out = f(tab, i)
            _ = np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        times[name] = min(ts)
    marg = (times["b"] - times["a"]) / ((loops_b - loops_a) * B * T)
    rate = 1.0 / marg if marg > 0 else float("inf")
    bw = rate * tab.shape[1] * tab.dtype.itemsize
    print(f"  {label:16s}: marginal {rate/1e6:8.0f} M rows/s "
          f"({bw/1e9:6.1f} GB/s table traffic)  "
          f"[a={times['a']*1e3:.0f}ms b={times['b']*1e3:.0f}ms]")
    return rate


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(7)
    print("f32 tables:")
    for w in (4, 8, 16, 32, 64):
        tab = jnp.asarray(rng.random((HW, w)), jnp.float32)
        measure(tab, f"f32 (N,{w})")
    print("u8 tables:")
    for w in (2, 4, 8, 16, 32, 64, 128, 256):
        tab = jnp.asarray(rng.integers(0, 255, (HW, w)), jnp.uint8)
        measure(tab, f"u8  (N,{w})")
    # narrow integer rows that hold a full 2x2 bilinear quad in 2-4 bytes:
    # all columns are consumed by the chain so XLA cannot shrink the slice
    print("packed-quad candidate rows:")
    for dt, w, hi in ((jnp.uint16, 2, 1 << 16), (jnp.int32, 2, 1 << 30),
                      (jnp.uint16, 4, 1 << 16)):
        tab = jnp.asarray(
            rng.integers(0, hi, (HW, w)).astype(np.int64), dt)
        measure(tab, f"{dt.__name__} (N,{w})")


if __name__ == "__main__":
    main()
