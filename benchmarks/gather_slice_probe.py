"""Does the u8 fast-gather path survive the PRODUCTION graph shapes?

gather_width_probe showed a static (N, 4) u8 table gathers at ~413 M
rows/s, yet sweep_ablation's per-view pipeline (quad = src_quads[s]
dynamically sliced from (S, N, 4) inside a lax.scan, then row-gather)
runs at ~165 M. This probe isolates WHICH graph feature kills the fast
emitter:

  static     — table is a (N, 4) jit argument (the known-fast case)
  dynslice   — table = big[s] with s a traced scan carry (ablation shape)
  flat-base  — table = (S*N, 4) jit argument, indices + s*N offset
  flat-const — same flat table, s fixed to 0 (offset constant-folded)

Timing discipline per CLAUDE.md: fresh inputs, chained deps, readback in
the timed region, marginal rate across two loop counts.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 480000
S = 10
B, T = 240000, 36


def chain(variant, tab, idx, loops):
    acc = jnp.zeros((B, T), jnp.float32)

    def body(carry, _):
        s, idx, acc = carry
        if variant == "static":
            v = jnp.take(tab, idx, axis=0)
        elif variant == "dynslice":
            v = jnp.take(tab[s % S], idx, axis=0)
        elif variant == "flat-base":
            v = jnp.take(tab, (s % S) * N + idx, axis=0)
        elif variant == "flat-const":
            v = jnp.take(tab, idx, axis=0)
        sv = v.astype(jnp.float32).sum(-1)
        idx = (idx + sv.astype(jnp.int32)) % N
        return (s + 1, idx, acc + sv), None

    (s, idx, acc), _ = jax.lax.scan(body, (jnp.int32(0), idx, acc), None,
                                    length=loops)
    return acc


def measure(variant, tab, loops_a=4, loops_b=8):
    rng = np.random.default_rng(hash(variant) % 2**32)
    f_a = jax.jit(lambda t, i: chain(variant, t, i, loops_a))
    f_b = jax.jit(lambda t, i: chain(variant, t, i, loops_b))
    mk = lambda: jnp.asarray(rng.integers(0, N, (B, T)), np.int32)
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
    print(f"  {variant:10s}: marginal {rate/1e6:8.0f} M rows/s  "
          f"[a={times['a']*1e3:.0f}ms b={times['b']*1e3:.0f}ms]")


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(3)
    small = jnp.asarray(rng.integers(0, 255, (N, 4)), jnp.uint8)
    big = jnp.asarray(rng.integers(0, 255, (S, N, 4)), jnp.uint8)
    flat = big.reshape(S * N, 4)
    measure("static", small)
    measure("dynslice", big)
    measure("flat-base", flat)
    measure("flat-const", flat)


if __name__ == "__main__":
    main()
