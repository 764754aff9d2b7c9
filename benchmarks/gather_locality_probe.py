"""u8 quad-row gather rate vs TABLE SIZE, index coherence, and row layout.

The sweep's 390 M rows/s gather rate (PERF_NOTES "u8 quads") was measured on
a 0.5 MP table; the full-resolution stress run showed the rate collapsing to
~150-190 M rows/s at 1.5 MP and beyond — an HBM locality effect, not an
issue-rate bound. This probe maps it:

  - table rows N = {0.49M, 1.5M, 6.1M, 24.4M}  (bench .. ETH3D native)
  - index streams: uniform-random rows, and WINDOW-COHERENT streams shaped
    like real NCC taps (36 taps in a +-5 px window around spatially-ordered
    pixel centers, warped to a random global offset)
  - row layouts: row-major (y*W+x, the shipped layout) vs 8x128 blocked
    tiles (one NCC window touches ~2-4 contiguous 4 KiB blocks instead of
    ~12 rows 4*W bytes apart)

Timing discipline per CLAUDE.md: fresh indices per rep, chained dependency
between loop iterations, host readback in the timed region, marginal rate
across two loop counts.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T = 240000, 36


def chain(tab, idx, loops, n):
    acc = jnp.zeros((B, T), jnp.float32)
    for _ in range(loops):
        v = jnp.take(tab, idx, axis=0)
        s = v.astype(jnp.float32).sum(-1)
        idx = (idx + s.astype(jnp.int32)) % n
        acc = acc + s
    return acc


def measure(tab, mk_idx, label, loops_a=2, loops_b=6):
    n = tab.shape[0]
    f_a = jax.jit(lambda t, i: chain(t, i, loops_a, n))
    f_b = jax.jit(lambda t, i: chain(t, i, loops_b, n))
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
    print(f"  {label:34s}: {rate / 1e6:7.0f} M rows/s "
          f"[a={times['a']*1e3:.0f}ms b={times['b']*1e3:.0f}ms]", flush=True)
    return rate


def window_indices(rng, H, W, blocked: bool):
    """(B, 36) indices shaped like NCC taps: consecutive same-color pixels
    (row-major order, stride 2) x a 6x6 tap grid (+-5, step 2), plus a
    per-pixel random warp offset (coherent within the window)."""
    n_pix = B
    start = rng.integers(0, H * W // 2)
    lin = (np.arange(n_pix) * 2 + start) % (H * W)
    cy, cx = lin // W, lin % W
    # window-coherent warp: same shift for all taps of one pixel
    cy = (cy + rng.integers(-64, 64, n_pix)) % H
    cx = (cx + rng.integers(-64, 64, n_pix)) % W
    off = np.arange(-5, 6, 2)
    dx, dy = np.meshgrid(off, off)
    ty = np.clip(cy[:, None] + dy.reshape(-1)[None, :], 0, H - 1)
    tx = np.clip(cx[:, None] + dx.reshape(-1)[None, :], 0, W - 1)
    if blocked:
        ntx = W // 128
        idx = (((ty >> 3) * ntx + (tx >> 7)) << 10) \
            | ((ty & 7) << 7) | (tx & 127)
    else:
        idx = ty * W + tx
    return jnp.asarray(idx, jnp.int32)


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(3)
    sizes = [(608, 768), (1008, 1536), (2016, 3072), (4032, 6144)]
    for H, W in sizes:
        n = H * W
        tab = jnp.asarray(rng.integers(0, 255, (n, 4)), jnp.uint8)
        print(f"table {H}x{W} = {n/1e6:.1f} M rows ({n*4/2**20:.0f} MiB):",
              flush=True)
        measure(tab, lambda: jnp.asarray(
            rng.integers(0, n, (B, T)), np.int32), "uniform random")
        measure(tab, lambda: window_indices(rng, H, W, blocked=False),
                "window-coherent row-major")
        measure(tab, lambda: window_indices(rng, H, W, blocked=True),
                "window-coherent 8x128-blocked")


if __name__ == "__main__":
    main()
