"""Locate the u8 row-gather fast/slow table-size threshold and test whether
XLA's scoped-VMEM limit moves it.

gather_locality_probe.py showed the rate is bimodal — ~405 M rows/s at a
2 MiB table, ~181 M rows/s from 6 MiB up to 94 MiB — and INSENSITIVE to
index coherence and row layout (8x128 blocking does nothing).  That is the
signature of a table-residency effect, not an HBM-locality one: when the
table fits in (scoped) VMEM the gather runs from VMEM; above the threshold
it becomes an HBM-resident gather at the memory-system rate.

This probe walks table sizes 2..8 MiB to find the edge, then re-runs the
big sizes under --xla_tpu_scoped_vmem_limit_kib to see if the fast path can
be extended.  Run twice:

  python benchmarks/gather_vmem_probe.py
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python benchmarks/gather_vmem_probe.py
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


def measure(tab, label, loops_a=2, loops_b=6):
    n = tab.shape[0]
    rng = np.random.default_rng(7)
    mk_idx = lambda: jnp.asarray(rng.integers(0, n, (B, T)), np.int32)
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
    print(f"  {label:28s}: {rate / 1e6:7.0f} M rows/s", flush=True)
    return rate


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}  "
          f"XLA_FLAGS={_os.environ.get('XLA_FLAGS', '')}", flush=True)
    rng = np.random.default_rng(3)
    for mib in (2.0, 2.5, 3.0, 3.5, 4.0, 5.0, 6.0, 8.0, 16.0, 24.0):
        n = int(mib * 2**20 / 4)
        tab = jnp.asarray(rng.integers(0, 255, (n, 4)), jnp.uint8)
        measure(tab, f"{mib:5.1f} MiB ({n/1e6:.2f} M rows)")


if __name__ == "__main__":
    main()
