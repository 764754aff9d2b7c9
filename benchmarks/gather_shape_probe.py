"""Does index RANK change XLA:TPU gather throughput?

sweep_ablation.py showed the (240000, 36)-indexed quad take runs at ~170 M
rows/s while an isolated (131072,)-indexed take ran ~50x faster.  This probe
compares identical work with different index/result shapes, in-graph chained
(each iteration's indices derive from the previous gather's values).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 480000
B, T = 240000, 36
LOOPS = 4


def make(variant):
    def chain(tab, idx):
        # idx: (B, T) int32
        acc = jnp.zeros((B, T), jnp.float32)
        for i in range(LOOPS):
            if variant == "idx2d":
                v = jnp.take(tab, idx, axis=0)              # (B, T, 4)
            elif variant == "flat":
                v = jnp.take(tab, idx.reshape(-1), axis=0).reshape(B, T, 4)
            elif variant == "flat_sorted_cols":
                v = jnp.take(tab, idx.reshape(-1), axis=0).reshape(B, T, 4)
            s = v.sum(-1)
            acc = acc + s
            # serialize: next indices depend on this gather
            idx = (idx + s.astype(jnp.int32)) % N_ROWS
        return acc
    return jax.jit(chain)


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(int(_os.environ.get("PROBE_SEED","0")))
    tab = jnp.asarray(rng.random((N_ROWS, 4)), jnp.float32)

    for variant in ("idx2d", "flat"):
        fn = make(variant)
        idx0 = jnp.asarray(rng.integers(0, N_ROWS, (B, T)), jnp.int32)
        out = fn(tab, idx0)
        jax.block_until_ready(out)
        ts = []
        for r in range(3):
            idx = jnp.asarray(rng.integers(0, N_ROWS, (B, T)), jnp.int32)
            jax.block_until_ready(idx)
            t0 = time.perf_counter()
            out = fn(tab, idx)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rate = B * T * LOOPS / dt
        print(f"  {variant:8s}: {dt*1e3:8.1f} ms  {rate/1e6:8.0f} M rows/s")


if __name__ == "__main__":
    main()
