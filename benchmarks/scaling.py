"""View-parallel scaling measurement (BASELINE.md fleet metrics).

Runs the SPMD view-parallel PatchMatch step (`parallel.mesh`) on meshes of
1..N devices and reports step time, per-view throughput, and scaling
efficiency. On real multi-chip hardware the mesh spans chips over ICI; on a
dev box, a virtual device mesh validates FUNCTION only (virtual CPU devices
share the same cores, so views/s stays flat and efficiency numbers are not
meaningful — real scaling requires real chips):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --platform cpu --devices 1 2 4 8

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--views", type=int, default=16)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu for virtual meshes)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    from apde_mvs_tpu.ops.propagation import PropCfg
    from apde_mvs_tpu.parallel import mesh as pmesh
    from apde_mvs_tpu.testing import synthetic

    enable_compilation_cache()
    V = args.views
    scene = synthetic.make_scene(num_views=V, height=args.height,
                                 width=args.width)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    pair = np.stack([[(v + 1) % V, (v - 1) % V] for v in range(V)])
    cfg = PropCfg(use_sa=False, geom_consistency=True)

    base_time = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            continue
        if V % nd != 0:
            continue
        m = pmesh.make_mesh(nd)
        batch = pmesh.scene_batch_from_arrays(
            jnp.asarray(scene.images), cams, pair, jax.random.PRNGKey(0))
        step = pmesh.build_sharded_step(m, cfg)
        with m:
            out = step(batch, jnp.int32(0), jax.random.PRNGKey(1),
                       jnp.float32(1.0), jnp.float32(10.0), jnp.float32(0.2))
            jax.block_until_ready(out.depths)
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = step(out, jnp.int32(0), jax.random.PRNGKey(2 + i),
                           jnp.float32(1.0), jnp.float32(10.0),
                           jnp.float32(0.2))
            jax.block_until_ready(out.depths)
        dt = (time.perf_counter() - t0) / args.iters
        if base_time is None:
            base_time = dt * nd  # normalize vs 1-device-equivalent
        eff = (base_time / nd) / dt if dt > 0 else 0.0
        print(json.dumps({
            "metric": "view_parallel_step",
            "devices": nd,
            "views": V,
            "step_s": round(dt, 4),
            "views_per_s": round(V / dt, 2),
            "scaling_efficiency": round(eff, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
