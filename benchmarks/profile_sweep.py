"""Per-op device-time breakdown of one production strong sweep.

Captures a jax.profiler trace of the bench sweep (800x608, 10 views) and
converts the xplane to the op_profile summary, attributing device time to
HLO categories (gather / fusion / convert / ...) — the ground truth for
where the non-gather 25% of the sweep goes.
"""
import glob
import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.ops.init import initial_cost, random_planes
    from apde_mvs_tpu.ops.propagation import PropCfg, propagate_strong
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.config import PatchMatchParams
    from apde_mvs_tpu.testing import synthetic

    height, width, num_views = 600, 800, 11
    scene = synthetic.make_scene(num_views=num_views, height=height,
                                 width=width, baseline=0.12)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(num_views) if v != 0])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        sampler_u8=True)
    params = PatchMatchParams()
    cfg = PropCfg(use_sa=False)
    key = jax.random.PRNGKey(0)
    dmin = jnp.float32(scene.cameras[0].depth_min * 0.6)
    dmax = jnp.float32(scene.cameras[0].depth_max * 1.2)

    @jax.jit
    def setup(data, key):
        state = PMState.create(height, width, data.num_src)
        state = state.replace(planes=random_planes(key, data, dmin, dmax))
        return initial_cost(data, state, params, use_apd=False, chunk=1 << 18)

    state = setup(data, key)

    @jax.jit
    def sweep(data, state, key):
        def color_sweep(state, inp):
            color, kc = inp
            return propagate_strong(data, state, cfg, 0, kc, color, dmin,
                                    dmax, jnp.float32(0.2)), None
        kcs = jax.random.split(key, 2)
        state, _ = jax.lax.scan(color_sweep, state, (jnp.arange(2), kcs))
        return state

    state = sweep(data, state, key)          # compile + warm
    jax.block_until_ready(state.costs)
    return data, state, sweep


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    data, state, sweep = build()
    key = jax.random.PRNGKey(7)
    tmp = tempfile.mkdtemp(prefix="apde_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(2):
            key, k = jax.random.split(key)
            state = sweep(data, state, k)
        _ = np.asarray(state.costs[0, 0])

    paths = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    for tool in ("op_profile", "overview_page"):
        try:
            out = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
            blob = out[0] if isinstance(out, tuple) else out
            fn = f"/tmp/sweep_{tool}.json"
            mode = "wb" if isinstance(blob, bytes) else "w"
            with open(fn, mode) as f:
                f.write(blob)
            print(f"wrote {fn} ({len(blob)} bytes)")
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
