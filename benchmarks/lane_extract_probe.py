"""Can one span-tile row gather serve MULTIPLE taps?

The u8 span-tile layout (core/sampling.py) fetches a (64,) u8 row per tap
at ~357 M rows/s — 2.2x the quad-row rate, but still 1 gather per tap.
The warped positions of a reference-row of NCC taps (spacing `increment`)
land within a few pixels of each other (homographies are locally affine),
so a 4x16 or 8x16 tile anchored at the row's min corner could cover the
2x2 footprints of SEVERAL taps — IF extracting values at dynamic LANE
positions from already-gathered (B, 64|128) rows is cheap.

This probe measures that second stage alone: `take_along_axis(rows, idx,
axis=-1)` for (B, T) lane indices into (B, C) u8/f32 rows, which XLA:TPU
may lower to the fast lane dynamic-gather (~7 G elems/s in Mosaic) or to
a slow generic gather — the measurement decides the design.

Timing discipline per CLAUDE.md: fresh inputs, chained deps, host readback
in the timed region, marginal rate across two loop counts.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 240000
T = 16                       # extracted lanes per row


def chain_extract(rows, idx, loops):
    """idx: (B, T) int32 lane positions. Chains via value-dependent index."""
    C = rows.shape[1]
    acc = jnp.zeros((B, T), jnp.float32)
    for _ in range(loops):
        v = jnp.take_along_axis(rows, idx, axis=-1).astype(jnp.float32)
        acc = acc + v
        idx = (idx + v.astype(jnp.int32)) % C
    return acc


def chain_row_gather(tab, idx, loops):
    """Baseline: plain row gather at (B*T,) granularity for comparison."""
    N = tab.shape[0]
    acc = jnp.zeros((B, T), jnp.float32)
    for _ in range(loops):
        v = jnp.take(tab, idx, axis=0)[..., 0].astype(jnp.float32)
        acc = acc + v
        idx = (idx + v.astype(jnp.int32)) % N
    return acc


def measure(fn, mk_args, label, loops_a=4, loops_b=8, per_loop_elems=B * T):
    f_a = jax.jit(lambda *a: fn(*a, loops_a))
    f_b = jax.jit(lambda *a: fn(*a, loops_b))
    args = mk_args()
    _ = np.asarray(f_a(*args)[:1, :1])
    _ = np.asarray(f_b(*args)[:1, :1])
    times = {}
    for name, f in (("a", f_a), ("b", f_b)):
        ts = []
        for _ in range(3):
            args = mk_args()
            jax.block_until_ready(args)
            t0 = time.perf_counter()
            out = f(*args)
            _ = np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        times[name] = min(ts)
    marg = (times["b"] - times["a"]) / ((loops_b - loops_a) * per_loop_elems)
    rate = 1.0 / marg if marg > 0 else float("inf")
    print(f"  {label:34s}: marginal {rate/1e6:8.0f} M elems/s  "
          f"[a={times['a']*1e3:.0f}ms b={times['b']*1e3:.0f}ms]")
    return rate


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(11)
    for C in (64, 128):
        for dt, hi in ((jnp.uint8, 255), (jnp.float32, 1)):
            rows = jnp.asarray(
                rng.integers(0, hi + 1, (B, C)).astype(np.float32), dt)
            mk = lambda C=C, rows=rows: (
                rows, jnp.asarray(rng.integers(0, C, (B, T)), np.int32))
            measure(chain_extract, mk,
                    f"lane extract ({B},{C}) {dt.__name__} T={T}")
    tab = jnp.asarray(rng.integers(0, 255, (480000, 4)), jnp.uint8)
    mk = lambda: (tab, jnp.asarray(rng.integers(0, 480000, (B, T)), np.int32))
    measure(chain_row_gather, mk, "row gather (N,4) u8 baseline")


if __name__ == "__main__":
    main()
