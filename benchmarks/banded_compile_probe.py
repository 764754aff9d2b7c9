"""Compile-time cost of the banded gather constructs on XLA:TPU.

The banded cond gather (core.sampling.banded_take) made full-res stage
bodies compile in ~9-10 min (was 20 s - 3 min).  Isolate the construct:
a body with K gather sites over a 24 MiB u8 table, compiled as

  plain        jnp.take(tab, idx)
  band-nocond  dynamic_slice band + take (no fallback — wrong results OK,
               compile probe only)
  band-cond    the shipped lax.cond fast/slow form

Reports wall compile seconds for K = 4, 14 (a sweep body has ~14 gather
sites per view scan body).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 6291456
WND = 786432
B, T = 65536, 36


def g_plain(tab, idx):
    return jnp.take(tab, idx, axis=0)


def g_band(tab, idx):
    lo = jnp.min(idx)
    start = jnp.clip(lo, 0, N - WND)
    band = lax.dynamic_slice(tab, (start, 0), (WND, 4))
    return jnp.take(band, idx - start, axis=0)


def g_cond(tab, idx):
    lo = jnp.min(idx)
    hi = jnp.max(idx)
    start = jnp.clip(lo, 0, N - WND)
    return lax.cond(hi - start < WND,
                    lambda: g_band(tab, idx),
                    lambda: g_plain(tab, idx))


def body(gather, k):
    def f(tab, idx):
        acc = jnp.zeros((B,), jnp.float32)
        for j in range(k):
            v = gather(tab, (idx + j) % N)
            s = v.astype(jnp.float32).sum(-1)
            acc = acc + s.sum(-1)
            idx = idx + s.astype(jnp.int32)
        return acc
    return f


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    # NOTE: cache deliberately NOT enabled — we time fresh compiles.
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 255, (N, 4)), jnp.uint8)
    idx = jnp.asarray(rng.integers(0, N, (B, T)), np.int32)
    for k in (4, 14):
        for name, g in (("plain", g_plain), ("band-nocond", g_band),
                        ("band-cond", g_cond)):
            f = jax.jit(body(g, k))
            t0 = time.perf_counter()
            f.lower(tab, idx).compile()
            dt = time.perf_counter() - t0
            print(f"  K={k:2d} {name:12s}: compile {dt:7.1f} s", flush=True)


if __name__ == "__main__":
    main()
