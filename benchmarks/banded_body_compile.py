"""Compile-time A/B of the PRODUCTION strong-sweep chunk body at full-res
shapes, banded vs unbanded gathers.

Run twice (the flag is read at import):

  APDE_BANDED_GATHER=1 python benchmarks/banded_body_compile.py
  APDE_BANDED_GATHER=0 python benchmarks/banded_body_compile.py

The compilation cache is deliberately NOT enabled.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import apde_mvs_tpu.core.sampling as samp
    print(f"banded={samp._BANDED}  device={jax.devices()[0].device_kind}",
          flush=True)

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.ops.propagation import PropCfg, _strong_chunk_jit
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.testing import synthetic

    h, w, views = 2016, 3024, 6
    scene = synthetic.make_scene(num_views=views, height=96, width=128)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    # scale intrinsics to the target resolution (compile only cares about
    # shapes; values are irrelevant)
    rng = np.random.default_rng(0)
    src_ids = np.asarray(range(1, views))
    ref = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.float32)
    srcs = jnp.asarray(rng.integers(0, 255, (views - 1, h, w)), jnp.float32)
    data = CostData.build(cams.view(0),
                          geo.CameraArrays(*[a[src_ids] for a in cams]),
                          ref, srcs, sampler_u8=True)
    state = PMState.create(h, w, views - 1)
    cfg = PropCfg(use_sa=False)
    body = _strong_chunk_jit(cfg)
    chunk = 32768
    xc = jnp.zeros((chunk,), jnp.int32)
    yc = jnp.zeros((chunk,), jnp.int32)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    lowered = body.lower(data, state, jnp.int32(0), key, key, xc, yc,
                         jnp.float32(1.0), jnp.float32(10.0),
                         jnp.float32(0.2))
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"trace+lower {t1-t0:.1f} s   compile {t2-t1:.1f} s", flush=True)


if __name__ == "__main__":
    main()
