"""Which gather-table provenance hits XLA:TPU's fast path?

gather_shape_probe: static (480000,4) table -> ~90 G rows/s (VMEM-class).
sweep_ablation: same gather but table = src_quads[s] dynamically sliced in a
scan over views -> ~170 M rows/s.  This probe isolates the variable.

Variants (all B*T = 8.64 M rows/loop, 4 chained loops):
  static      — table passed directly                    (expected fast)
  scan_dyn    — table = quads[s] inside lax.scan over s  (the framework's
                current structure; expected slow)
  unrolled    — python loop over views, static slices    (candidate fix)
  flat_big    — one (S*HW, 4) table, view-offset indices (ncc_selected's
                structure; HBM-resident)
  huge        — (16M, 4) table, beyond VMEM              (HBM gather rate)
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


def run_timed(fn, mk_idx, rows_per_call, label):
    out = fn(mk_idx(0))
    jax.block_until_ready(out)
    ts = []
    for r in range(3):
        idx = mk_idx(r + 1)
        jax.block_until_ready(idx)
        t0 = time.perf_counter()
        out = fn(idx)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"  {label:10s}: {dt*1e3:8.1f} ms  "
          f"{rows_per_call/dt/1e6:8.0f} M rows/s")


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    quads = jnp.asarray(rng.random((S, HW, 4)), jnp.float32)
    tab0 = quads[0]

    def chain_static(idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            v = jnp.take(tab0, idx, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % HW
        return acc

    def chain_scan_dyn(idx):
        def body(carry, _):
            sidx, idxc, acc = carry
            tab = quads[sidx]
            v = jnp.take(tab, idxc, axis=0)
            sm = v.sum(-1)
            idxc = (idxc + sm.astype(jnp.int32)) % HW
            return (sidx + 1, idxc, acc + sm), None
        (_, _, acc), _ = jax.lax.scan(
            body, (jnp.int32(0), idx, jnp.zeros((B, T), jnp.float32)),
            None, length=LOOPS)
        return acc

    def chain_unrolled(idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            v = jnp.take(quads[i], idx, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % HW
        return acc

    flat = quads.reshape(-1, 4)

    def chain_flat_big(idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            v = jnp.take(flat, idx + i * HW, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % HW
        return acc

    huge = jnp.asarray(rng.random((1 << 24, 4)), jnp.float32)

    def chain_huge(idx):
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            v = jnp.take(huge, idx, axis=0)
            s = v.sum(-1)
            acc = acc + s
            idx = (idx + s.astype(jnp.int32)) % (1 << 24)
        return acc

    rows = B * T * LOOPS
    mk = lambda r: jnp.asarray(rng.integers(0, HW, (B, T)), jnp.int32)
    run_timed(jax.jit(chain_static), mk, rows, "static")
    run_timed(jax.jit(chain_scan_dyn), mk, rows, "scan_dyn")
    run_timed(jax.jit(chain_unrolled), mk, rows, "unrolled")
    run_timed(jax.jit(chain_flat_big), mk, rows, "flat_big")
    mkh = lambda r: jnp.asarray(
        rng.integers(0, 1 << 24, (B, T)), jnp.int32)
    run_timed(jax.jit(chain_huge), mkh, rows, "huge")


if __name__ == "__main__":
    main()
