"""Mesh scaling of the SHARDED weak machinery in the tile engine.

VERDICT r4 next-round #1's "done" criterion: an 8-device virtual-mesh
run showing the weak-sweep work dividing by device count. Real multi-chip
hardware is environment-blocked (one v5e chip), so this measures the tile
engine's sweeps program on the forced-host-platform CPU mesh at
n = 1/2/4/8 devices two ways:

1. **per-device FLOPs from XLA cost analysis** (deterministic, thread-pool
   independent): the compiled sweeps program's flop count per device must
   fall ~1/n as the weak list shards, with a floor from the replicated
   JFA + image-table work;
2. **wall clock** (secondary, noisy on this shared 4-core box: virtual CPU
   devices contend for the same cores, so wall speedup saturates at the
   physical core count, not n).

The pass is weak-dominated by construction (large low-texture region, the
weak share of the sweeps is >70% of flops at n=1), matching the full-res
regime where init+sweeps 1908 s of a 2812 s APD pass are the weak-heavy
stages (PERF_NOTES r4).
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from apde_mvs_tpu import config as cfg
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.parallel.tile_pass import TileInputs, build_tile_pass
from apde_mvs_tpu.pipeline.full_pass import PassStatic
from apde_mvs_tpu.testing import synthetic

H, W, V = 128, 128, 4
CAP = 8192


def build_inputs():
    scene = synthetic.make_scene(num_views=V, height=H, width=W,
                                 weak_region=(-0.45, 0.45, -0.35, 0.35))
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = [v for v in range(V) if v != 0]
    imgs = np.clip(np.round(scene.images), 0, 255).astype(np.uint8)
    gt = scene.depths[0]
    rng = np.random.default_rng(0)
    prior_depth = (gt * (1 + 0.01 * rng.standard_normal(gt.shape))
                   ).astype(np.float32)
    weak_map = np.full((H, W), cfg.STRONG, np.int32)
    weak_map[gt < 0.95 * np.median(gt)] = cfg.WEAK
    wy, wx = np.nonzero(weak_map == cfg.WEAK)
    assert len(wx) <= CAP, len(wx)
    wxp = np.zeros(CAP, np.int32)
    wyp = np.zeros(CAP, np.int32)
    wvp = np.zeros(CAP, bool)
    wxp[:len(wx)] = wx
    wyp[:len(wy)] = wy
    wvp[:len(wx)] = True
    print(f"weak pixels: {len(wx)} / {H * W} = {len(wx) / H / W:.0%}",
          flush=True)
    tp = TileInputs(
        ref_image=jnp.asarray(imgs[0]),
        src_images=jnp.asarray(imgs[src_ids]),
        ref_cam=cams.view(0),
        src_cams=geo.CameraArrays(*[a[np.asarray(src_ids)] for a in cams]),
        sa=jnp.zeros((H, W), jnp.int32),
        src_depths=jnp.zeros((len(src_ids), H, W), jnp.float32),
        prior_depth=jnp.asarray(prior_depth),
        prior_normal=jnp.asarray(scene.normals[0].astype(np.float32)),
        prior_weak=jnp.asarray(weak_map),
        prior_conf=jnp.full((H, W), 4.0, jnp.float32),
        valid=jnp.ones((H, W), bool),
        weak_x=jnp.asarray(wxp), weak_y=jnp.asarray(wyp),
        weak_valid=jnp.asarray(wvp),
        key=jax.random.PRNGKey(11),
        dmin=jnp.float32(float(gt[gt > 0].min()) * 0.7),
        dmax=jnp.float32(float(gt.max()) * 1.3))
    return tp


def main():
    tp = build_inputs()
    params = cfg.PatchMatchParams(state="refine_init", max_iterations=2,
                                  use_sa=False, use_apd=True,
                                  geom_consistency=False, rotate_time=2)
    rows = {}
    for mode in ("apd", "no_weak"):
        pcfg = PassStatic.from_params(params, nw_cap=CAP if mode == "apd"
                                      else 0)
        for n in (1, 2, 4, 8):
            mesh = Mesh(np.asarray(jax.devices()[:n]), ("tiles",))
            step = build_tile_pass(mesh, pcfg, V - 1, (H, W), (H, W))
            args = (tp, jnp.float32(params.ransac_threshold),
                    jnp.float32(params.geom_factor))
            lowered = step.sweeps.lower(*args)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", float("nan")))
            out = step.sweeps(*args)          # warm
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = step.sweeps(*args)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            rows[(mode, n)] = (flops, dt)
            print(json.dumps({
                "mode": mode, "devices": n,
                "sweeps_flops_per_device_G": round(flops / 1e9, 2),
                "vs_1dev": round(rows[(mode, 1)][0] / flops, 2),
                "wall_s": round(dt, 2),
                "wall_speedup": round(rows[(mode, 1)][1] / dt, 2),
            }), flush=True)
    # weak share at n=1 and the weak-only scaling (apd minus no_weak)
    for n in (1, 2, 4, 8):
        weak_f = rows[("apd", n)][0] - rows[("no_weak", n)][0]
        weak_1 = rows[("apd", 1)][0] - rows[("no_weak", 1)][0]
        print(json.dumps({
            "devices": n,
            "weak_flops_per_device_G": round(weak_f / 1e9, 2),
            "weak_share_of_sweeps": round(
                weak_f / rows[("apd", n)][0], 2),
            "weak_vs_1dev": round(weak_1 / weak_f, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
