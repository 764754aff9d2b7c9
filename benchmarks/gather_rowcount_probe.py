"""Is the u8 gather fast-path threshold a BYTE bound or a ROW-COUNT bound?

gather_vmem_probe.py pinned the fast/slow edge between 0.92 M and 1.05 M
rows of (N, 4) u8 — i.e. exactly at 2^20 rows == 4 MiB, which is ambiguous.
Scoped-VMEM compiler options do not move it.  This probe varies row WIDTH:

  - if the edge tracks  N * width = 4 MiB  -> byte bound (nothing to pack)
  - if the edge tracks  N = 2^20           -> row-count bound: packing k
    pixels' quads per row (width 4k) divides the row count by k and could
    keep the fast path at full-resolution tables (6.1 M pixels / 8 = 0.76 M
    rows of 32 B), at the cost of a lane-extract per sample.

Also measures the lane-extract idiom (gather (B,T,32) then select the
4-byte group by take_along_axis) to see if the extraction keeps the win.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T = 240000, 36


def measure(fn_loops, mk_idx, label, loops_a=2, loops_b=6):
    f_a = jax.jit(lambda t, i: fn_loops(t, i, loops_a))
    f_b = jax.jit(lambda t, i: fn_loops(t, i, loops_b))
    tab = fn_loops.tab
    _ = np.asarray(f_a(tab, mk_idx())[:1, :1])
    _ = np.asarray(f_b(tab, mk_idx())[:1, :1])
    times = {}
    for name, f in (("a", f_a), ("b", f_b)):
        ts = []
        for _ in range(3):
            i = mk_idx()
            jax.block_until_ready((tab, i))
            t0 = time.perf_counter()
            out = f(tab, i)
            _ = np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        times[name] = min(ts)
    marg = (times["b"] - times["a"]) / ((loops_b - loops_a) * B * T)
    rate = (1.0 / marg if marg > 0 else float("inf"))
    print(f"  {label:44s}: {rate / 1e6:7.0f} M rows/s", flush=True)
    return rate


def plain_chain(n):
    def fn(tab, idx, loops):
        acc = jnp.zeros((B, T), jnp.float32)
        for _ in range(loops):
            v = jnp.take(tab, idx, axis=0)
            s = v.astype(jnp.float32)[..., :4].sum(-1)
            idx = (idx + s.astype(jnp.int32)) % n
            acc = acc + s
        return acc
    return fn


def extract_chain(n_pix, k):
    """Wide-row gather + lane extract: pixel idx -> row idx>>log2(k),
    quad = 4 bytes at (idx & (k-1)) * 4."""
    shift = int(np.log2(k))
    n_rows = n_pix // k
    def fn(tab, idx, loops):
        acc = jnp.zeros((B, T), jnp.float32)
        for _ in range(loops):
            rows = jnp.take(tab, idx >> shift, axis=0)      # (B, T, 4k)
            lane = (idx & (k - 1))[..., None] * 4 + jnp.arange(4)[None, None]
            v = jnp.take_along_axis(rows, lane, axis=-1)    # (B, T, 4)
            s = v.astype(jnp.float32).sum(-1)
            idx = (idx + s.astype(jnp.int32)) % n_pix
            acc = acc + s
        return acc
    return fn


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(3)

    print("A. row-count vs byte bound (plain wide-row gather):", flush=True)
    for width, n in [(8, 2**19), (8, 2**20), (8, 2**21),
                     (16, 2**18), (16, 2**20),
                     (32, 2**17), (32, 2**20)]:
        tab = jnp.asarray(rng.integers(0, 255, (n, width)), jnp.uint8)
        fn = plain_chain(n)
        fn.tab = tab
        measure(fn, lambda: jnp.asarray(rng.integers(0, n, (B, T)), np.int32),
                f"(N={n/2**20:.2f}M, {width}B) = {n*width/2**20:.0f} MiB")

    print("B. packed-pixel rows + lane extract (6.1 M pixels):", flush=True)
    n_pix = 6100992  # divisible by 32
    for k in (8, 16):
        n_rows = n_pix // k
        tab = jnp.asarray(
            rng.integers(0, 255, (n_rows, 4 * k)), jnp.uint8)
        fn = extract_chain(n_pix, k)
        fn.tab = tab
        measure(fn, lambda: jnp.asarray(
            rng.integers(0, n_pix, (B, T)), np.int32),
            f"k={k} ({n_rows/2**20:.2f}M rows x {4*k}B = "
            f"{n_rows*4*k/2**20:.0f} MiB)")


if __name__ == "__main__":
    main()
