"""Bisect which stage faults the device at full resolution.

Runs the first_init stages one jit at a time with a HOST READBACK after
each (block_until_ready through the tunnel can return early — CLAUDE.md),
so the first stage whose readback raises is the faulting kernel.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fullres_bisect.py \
      --width 3024 --height 2016 --views 11 --stop median
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=11)
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from apde_mvs_tpu import config as cfg
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops import filters
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.ops.init import initial_cost, random_planes
    from apde_mvs_tpu.ops.propagation import PropCfg, propagate_strong
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.pipeline.patchmatch import pad_to_multiple
    from apde_mvs_tpu.pipeline.driver import PAD_H, PAD_W
    from apde_mvs_tpu.config import PatchMatchParams
    from apde_mvs_tpu.testing import synthetic

    H, W, V = args.height, args.width, args.views
    t0 = time.time()
    scene = synthetic.make_scene(num_views=V, height=H, width=W,
                                 baseline=0.12, focal=1.25 * W)
    print(f"scene gen: {time.time() - t0:.1f} s", flush=True)

    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    ref_p = pad_to_multiple(scene.images[0], PAD_H, PAD_W)
    ph, pw = ref_p.shape
    src_imgs = np.stack(
        [pad_to_multiple(scene.images[s], PAD_H, PAD_W) for s in src_ids])

    last = [time.time()]

    def mark(name, arr):
        v = float(np.asarray(arr.reshape(-1)[:8]).sum())  # true readback
        now = time.time()
        st = jax.local_devices()[0].memory_stats() or {}
        peak = st.get("peak_bytes_in_use", 0) / 2**30
        print(f"[ok] {name}: {now - last[0]:.1f} s (probe {v:.3g}, "
              f"peak {peak:.2f} GiB)", flush=True)
        last[0] = now

    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(ref_p), jnp.asarray(src_imgs),
        real_width=W, real_height=H, sampler_u8=True)
    mark("costdata", data.src_quads[0, :64].astype(jnp.int32))

    params = PatchMatchParams()
    pcfg = PropCfg(use_sa=False)
    key = jax.random.PRNGKey(7)
    dmin = jnp.float32(scene.cameras[0].depth_min * cfg.DEPTH_MIN_FACTOR)
    dmax = jnp.float32(scene.cameras[0].depth_max * cfg.DEPTH_MAX_FACTOR)

    state = PMState.create(ph, pw, data.num_src)
    key, k0 = jax.random.split(key)
    planes = jax.jit(random_planes)(k0, data, dmin, dmax)
    mark("random_planes", planes)

    state = state.replace(planes=planes)
    state = jax.jit(
        lambda d, s: initial_cost(d, s, params, use_apd=False,
                                  chunk=1 << 19))(data, state)
    mark("initial_cost", state.costs)

    for it in range(2):
        for color in (0, 1):
            key, kc = jax.random.split(key)
            state = jax.jit(
                lambda d, s, k: propagate_strong(
                    d, s, pcfg, jnp.int32(it), k, color, dmin, dmax,
                    jnp.float32(0.2)),
                static_argnames=())(data, state, kc)
            mark(f"sweep it{it} color{color}", state.costs)

    planes_dn = jax.jit(
        lambda d, p: filters.planes_to_depth_normal(d, p))(data, state.planes)
    mark("depth_normal", planes_dn)

    state = state.replace(planes=planes_dn)
    state = jax.jit(
        lambda s: filters.median_filter_color(s, 0))(state)
    mark("median color0", state.planes)
    state = jax.jit(
        lambda s: filters.median_filter_color(s, 1))(state)
    mark("median color1", state.planes)
    print("all stages ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
