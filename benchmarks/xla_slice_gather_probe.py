"""XLA:TPU lax.gather slice-size economics, readback-timed.

If gathering a (4, 32) block costs the same per-slice as a (1, 4) quad row
(~200 M slices/s), one block fetch can serve a whole warped tap-row
(6 taps), turning the sweep's 2.4 G row-gathers into 0.4 G block-gathers.

Chained in-graph (each iteration's start indices derive from the previous
gather's values); fresh inputs per rep; host readback in the timed region.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

H, W = 608, 896
N = 1 << 20          # slices per gather op
LOOPS = 8


def make_block_gather(ky, kx):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def run(img, ys, xs):
        acc = jnp.zeros((N,), jnp.float32)
        for i in range(LOOPS):
            st = jnp.stack([ys, xs], axis=-1)                  # (N, 2)
            g = lax.gather(img, st, dn, slice_sizes=(ky, kx),
                           mode="clip")                        # (N, ky, kx)
            s = g.sum((1, 2))
            acc = acc + s
            ys = (ys + s.astype(jnp.int32)) % (H - ky)
            xs = (xs + 1) % (W - kx)
        return acc
    return jax.jit(run)


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}  N={N} loops={LOOPS}")
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((H, W)), jnp.float32)

    for (ky, kx) in ((1, 2), (1, 4), (2, 8), (2, 16), (4, 32), (2, 32),
                     (8, 32), (4, 16)):
        try:
            fn = make_block_gather(ky, kx)
            mk = lambda r: (img,
                jnp.asarray(rng.integers(0, H - ky, (N,)), jnp.int32),
                jnp.asarray(rng.integers(0, W - kx, (N,)), jnp.int32))
            out = fn(*mk(0))
            _ = np.asarray(out[:1])
            ts = []
            for r in range(2):
                a = mk(r + 1)
                jax.block_until_ready(a)
                t0 = time.perf_counter()
                out = fn(*a)
                _ = np.asarray(out[:1])
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            n = N * LOOPS
            print(f"  slice ({ky:2d},{kx:2d}): {dt*1e3:8.1f} ms  "
                  f"{n/dt/1e6:6.0f} M slices/s  "
                  f"{n*ky*kx*4/dt/1e9:6.1f} GB/s")
        except Exception as e:
            print(f"  slice ({ky:2d},{kx:2d}): FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
