"""Windowed band gather: can a dynamic-sliced row band of a BIG u8 quad
table ride the small-table fast path (~405 M rows/s)?

gather_vmem_probe.py pinned the fast/slow edge at ~3.5-4 MiB of table
bytes (row-layout- and coherence-independent; scoped-VMEM options do not
move it).  Full-res tables (24 MiB) gather at ~180 M rows/s.  The fix
candidate: indices for one host-mode chunk usually span a narrow row band
(DepthToWeak's 61-step sweep is depth-bounded; post-warmup candidates are
coherent), so

    lo = min(idx); band = dynamic_slice(tab, (clamp(lo), 0), (Wnd, 4))
    rows = take(band, idx - lo)          # fast path if Wnd <= ~0.9 M rows

with a lax.cond fallback to the full-table take when max-min exceeds the
window (bitwise-identical results either way).  This probe measures:

  1. take from a traced-start dynamic_slice band (in-window indices)
  2. the same wrapped in lax.cond against a full-table fallback
  3. the cond taking the SLOW branch (regression check)

vs the plain full-table take, on a 24 MiB (6.29 M row) table.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, T = 240000, 36
N = 6291456          # 24 MiB of (N, 4) u8
WND = 786432         # 3 MiB band — comfortably under the ~3.5 MiB edge


def plain(tab, idx):
    return jnp.take(tab, idx, axis=0)


def banded(tab, idx):
    lo = jnp.min(idx)
    start = jnp.clip(lo, 0, N - WND)
    band = lax.dynamic_slice(tab, (start, 0), (WND, 4))
    return jnp.take(band, idx - start, axis=0)


def cond_banded(tab, idx):
    lo = jnp.min(idx)
    hi = jnp.max(idx)
    start = jnp.clip(lo, 0, N - WND)
    return lax.cond(hi - start < WND,
                    lambda: banded(tab, idx),
                    lambda: plain(tab, idx))


def chain(gather, tab, idx, loops):
    acc = jnp.zeros((B, T), jnp.float32)
    lo0 = jnp.min(idx)
    span = jnp.max(idx) - lo0
    for _ in range(loops):
        v = gather(tab, idx)
        s = v.astype(jnp.float32).sum(-1)
        # preserve the index distribution's span: re-offset, don't rescatter
        idx = lo0 + (idx - lo0 + s.astype(jnp.int32)) % (span + 1)
        acc = acc + s
    return acc


def measure(gather, mk_idx, label, loops_a=2, loops_b=6):
    f_a = jax.jit(lambda t, i: chain(gather, t, i, loops_a))
    f_b = jax.jit(lambda t, i: chain(gather, t, i, loops_b))
    rng = np.random.default_rng(5)
    tab = jnp.asarray(rng.integers(0, 255, (N, 4)), jnp.uint8)
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
    print(f"  {label:40s}: {rate / 1e6:7.0f} M rows/s", flush=True)
    return rate


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(11)

    def idx_in_window():
        base = int(rng.integers(0, N - WND))
        return jnp.asarray(
            base + rng.integers(0, WND - 8 * B * T // (B * T), (B, T)),
            np.int32)

    def idx_full_span():
        return jnp.asarray(rng.integers(0, N, (B, T)), np.int32)

    measure(plain, idx_full_span, "full-table take (baseline slow)")
    measure(banded, idx_in_window, "banded take, traced start")
    measure(cond_banded, idx_in_window, "cond: fast branch taken")
    measure(cond_banded, idx_full_span, "cond: slow branch taken")

    # correctness: banded == plain on in-window indices
    tab = jnp.asarray(rng.integers(0, 255, (N, 4)), jnp.uint8)
    i = idx_in_window()
    assert np.array_equal(np.asarray(plain(tab, i)),
                          np.asarray(cond_banded(tab, i)))
    i = idx_full_span()
    assert np.array_equal(np.asarray(plain(tab, i)),
                          np.asarray(cond_banded(tab, i)))
    print("  correctness: cond_banded == plain on both index regimes",
          flush=True)


if __name__ == "__main__":
    main()
