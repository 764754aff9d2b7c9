"""Compile-time A/B of ALL full-res host-mode chunk bodies, banded vs not.

  APDE_BANDED_GATHER={0,1} python benchmarks/banded_body_compile2.py \
      [init|weak_rescore|weak|classify|refine]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    import apde_mvs_tpu.core.sampling as samp
    print(f"banded={samp._BANDED}  body={which}", flush=True)

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.ops.propagation import PropCfg, _weak_chunk_jit
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.pipeline.patchmatch import StaticCfg, _jit_classify, \
        _jit_init_chunk, _jit_local_refine, _jit_weak_rescore_chunk
    from apde_mvs_tpu.testing import synthetic

    h, w, views = 2016, 3024, 6
    S = views - 1
    scene = synthetic.make_scene(num_views=views, height=96, width=128)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    rng = np.random.default_rng(0)
    src_ids = np.asarray(range(1, views))
    ref = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.float32)
    srcs = jnp.asarray(rng.integers(0, 255, (S, h, w)), jnp.float32)
    data = CostData.build(cams.view(0),
                          geo.CameraArrays(*[a[src_ids] for a in cams]),
                          ref, srcs, sampler_u8=True)
    state = PMState.create(h, w, S)
    prop = PropCfg(use_sa=False)
    cfg = StaticCfg(prop=prop, use_apd=True, max_iterations=3, rotate_time=2)

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        print(f"  {name:14s}: trace+compile {time.perf_counter()-t0:7.1f} s",
              flush=True)

    key = jax.random.PRNGKey(0)
    f1, f10 = jnp.float32(1.0), jnp.float32(10.0)
    f02 = jnp.float32(0.2)

    if which in ("init", "all"):
        chunk = 1 << 19
        body = _jit_init_chunk(S, cfg)
        planes_c = jnp.zeros((chunk, 4), jnp.float32)
        xc = jnp.zeros((chunk,), jnp.float32)
        timed("init", lambda: body.lower(data, planes_c, xc, xc).compile())

    nw = 1 << 15
    wx = jnp.zeros((nw,), jnp.int32)
    wv = jnp.ones((nw,), bool)
    anchors_c = jnp.zeros((nw, 9, 2), jnp.int32)

    if which in ("weak_rescore", "all"):
        body = _jit_weak_rescore_chunk(S, cfg)
        timed("weak_rescore",
              lambda: body.lower(data, state, wx, wx, anchors_c).compile())

    if which in ("weak", "all"):
        body = _weak_chunk_jit(prop)
        fit = jnp.zeros((nw, 4), jnp.float32)
        timed("weak_sweep", lambda: body.lower(
            data, state, jnp.int32(0), key, key, wx, wx, anchors_c, fit,
            f1, f10, f02).compile())

    if which in ("classify", "all"):
        chunk = 1 << 16
        body = _jit_classify((h, w), S, cfg, chunk, False, 4)
        xc = jnp.zeros((chunk,), jnp.int32)
        timed("classify", lambda: body.lower(
            data, state, xc, xc, jnp.int32(2), f02, f1, f10).compile())

    if which in ("refine", "all"):
        chunk = 1 << 16
        body = _jit_local_refine((h, w), S, cfg, chunk, 4)
        xc = jnp.zeros((chunk,), jnp.int32)
        timed("local_refine", lambda: body.lower(
            data, state, xc, xc, f02, f1, f10).compile())


if __name__ == "__main__":
    main()
