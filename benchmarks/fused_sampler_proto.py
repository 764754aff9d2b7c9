"""Prototype of the fused-sweep sampler core (readback-timed).

Pipeline per block (B requests = pixels x taps sharing one source window):
  1. window  = img[ds(rmin, RW), ds(cal, 256)] rolled to (RW, CW)   [staging]
  2. yhat    = hat(wy - rmin - iota_rw)           (B, RW)  [VPU, 4 ops/elem]
  3. z       = yhat @ window                      (B, CW)  [MXU]
  4. val     = lerp(z[b, x0], z[b, x0+1], fx)     (B, 2) take_along_axis
  5. sums    = A_T @ vals                         (NP, k)  [MXU tap-reduce]

Unknowns probed: (B,1) compact inputs viability, (B,1)->(B,RW) broadcast,
take_along_axis with narrow (B,2) indices on a (B,CW) source, and the
sustained samples/s of the whole pipeline.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 608, 896
RW, CW = 24, 128
NPX = 64                  # pixels per block
T = 36                    # taps per pixel
B = NPX * T               # 2304 requests per block
LOOPS = 256               # blocks per kernel call (fori, data-dependent)


def make_proto(x_select: str):
    a_red = np.zeros((NPX, B), np.float32)     # tap-reduction matrix
    for p in range(NPX):
        a_red[p, p * T:(p + 1) * T] = 1.0
    a_red = jnp.asarray(a_red)

    def kernel(img_ref, wy_ref, wx_ref, ared_ref, out_ref):
        def body(i, carry):
            # per-iteration varying request stream (data dependence)
            wy = wy_ref[:] + (carry[0, 0] * 1e-6)
            wx = wx_ref[:]
            rmin = jnp.clip(jnp.min(wy).astype(jnp.int32) - 1, 0, H - RW)
            rmin = pl.multiple_of(rmin & ~7, 8)
            cstart = jnp.clip(jnp.min(wx).astype(jnp.int32) - 1, 0, W - CW)
            cal = jnp.minimum(cstart & ~127, W - 256)
            cal = pl.multiple_of(cal, 128)
            off = cstart - cal
            win256 = img_ref[pl.ds(rmin, RW), pl.ds(cal, 256)]
            win = pltpu.roll(win256, 256 - off, 1)[:, :CW]
            # 2. yhat from (B,1) via lane broadcast + iota
            ylf = jnp.clip(wy - rmin.astype(jnp.float32), 0.0, RW - 1.0)
            p_ids = jax.lax.broadcasted_iota(
                jnp.int32, (B, RW), 1).astype(jnp.float32)
            yhat = jnp.maximum(0.0, 1.0 - jnp.abs(ylf - p_ids))
            # 3. MXU y-collapse
            z = jnp.dot(yhat, win, preferred_element_type=jnp.float32)
            # 4. x-select
            xlf = jnp.clip(wx - cstart.astype(jnp.float32), 0.0, CW - 1.0)
            x0 = jnp.floor(xlf).astype(jnp.int32)
            fx = xlf - x0.astype(jnp.float32)
            if x_select == "gather2":
                idx2 = jnp.concatenate(
                    [x0, jnp.minimum(x0 + 1, CW - 1)], axis=1)   # (B, 2)
                g = jnp.take_along_axis(z, idx2, axis=-1)
                val = g[:, :1] * (1.0 - fx) + g[:, 1:] * fx
            else:  # onehot
                c_ids = jax.lax.broadcasted_iota(jnp.int32, (B, CW), 1)
                left = jnp.where(c_ids == x0, z, 0.0).sum(-1, keepdims=True)
                right = jnp.where(c_ids == x0 + 1, z, 0.0).sum(
                    -1, keepdims=True)
                val = left * (1.0 - fx) + right * fx
            # 5. tap reduce: (NPX, B) @ (B, 3)
            vals3 = jnp.concatenate([val, val * val, val * 0.5], axis=1)
            sums = jnp.dot(ared_ref[:], vals3,
                           preferred_element_type=jnp.float32)   # (NPX, 3)
            return carry + jnp.sum(sums, axis=1, keepdims=True)
        out_ref[:] = jax.lax.fori_loop(
            0, LOOPS, body, jnp.zeros((NPX, 1), jnp.float32))

    @jax.jit
    def run(img, wy, wx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NPX, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, wy, wx, a_red)
    return run


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind} "
          f"B={B} RW={RW} CW={CW} loops={LOOPS}")
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((H, W)) * 255.0, jnp.float32)

    def mk(r):
        cy = rng.uniform(40, H - 40)
        cx = rng.uniform(40, W - 40)
        wy = np.clip(cy + rng.uniform(-10, 10, (B, 1)), 0, H - 2)
        wx = np.clip(cx + rng.uniform(-50, 50, (B, 1)), 0, W - 2)
        return (img, jnp.asarray(wy, jnp.float32),
                jnp.asarray(wx, jnp.float32))

    for variant in ("gather2", "onehot"):
        try:
            fn = make_proto(variant)
            out = fn(*mk(0))
            _ = np.asarray(out[:1])
            ts = []
            for r in range(3):
                a = mk(r + 1)
                jax.block_until_ready(a)
                t0 = time.perf_counter()
                out = fn(*a)
                _ = np.asarray(out[:1])
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            n = B * LOOPS
            print(f"  proto[{variant:8s}]: {dt*1e3:8.1f} ms  "
                  f"{n/dt/1e6:7.0f} M samples/s")
        except Exception as e:
            print(f"  proto[{variant:8s}]: FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
