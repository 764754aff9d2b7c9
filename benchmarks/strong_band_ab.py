"""Drop-tolerant strong-sweep A/B: base-only vs full-variant banding.

The full-res pass-B A/B (benchmarks/fullres_stress.py) needs ~40-70 min
per arm; on nights when the remote tunnel drops client streams every
10-40 min (round-5 log: three drops in three hours) it cannot complete.
This probe isolates exactly what the round-5 banding change touches — the
banded strong-sweep dispatch (pre-pass + chunk bodies) — on the full-res
pass-B entry state, in ~3-4 min per arm:

  arm refine-banded   round-4 behavior (APDE_BAND_REFINE=1): bounds cover
                      all 27 variants, refine slots 3/4 ride the band
  arm base-only       round-5 default: bounds cover the 9 winners, all 5
                      refine probes gather plain
  arm bands-off       plain dispatch reference

Each arm runs one full iteration's TWO color sweeps (production
propagate_strong_host at the banded 2^16 cap) from the same uploaded
state, fresh PRNG keys per rep. Banded-vs-plain gathers are bitwise
identical, so all arms must produce identical state checksums — a free
correctness pin on top of the timing.

Usage (real chip):
  python benchmarks/strong_band_ab.py \
      --prior_npz /root/logs/fullres_prior_3024.npz
"""

import argparse
import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior_npz", default="/root/logs/fullres_prior_3024.npz")
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=11)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu import config as cfg_mod
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops import bands, filters
    from apde_mvs_tpu.ops.cost import CostData, initial_cost_and_selection
    from apde_mvs_tpu.ops.init import initial_cost_chunk
    from apde_mvs_tpu.ops.propagation import BAND_DISPATCH_STATS, PropCfg, \
        propagate_strong_host
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.pipeline import patchmatch as pm
    from apde_mvs_tpu.pipeline.driver import PAD_H, PAD_W
    from apde_mvs_tpu.testing import synthetic

    H, W, V = args.height, args.width, args.views
    t0 = time.time()
    scene = synthetic.make_scene(
        num_views=V, height=H, width=W, baseline=0.12,
        focal=1.25 * W, weak_region=(-0.3, 0.3, -0.2, 0.2))
    print(f"scene gen: {time.time() - t0:.1f} s", flush=True)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    dmin = jnp.float32(scene.cameras[0].depth_min * cfg_mod.DEPTH_MIN_FACTOR)
    dmax = jnp.float32(scene.cameras[0].depth_max * cfg_mod.DEPTH_MAX_FACTOR)
    ref_p = pm.pad_to_multiple(scene.images[0], PAD_H, PAD_W)
    src_imgs = np.stack(
        [pm.pad_to_multiple(scene.images[s], PAD_H, PAD_W) for s in src_ids])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(ref_p), jnp.asarray(src_imgs),
        real_width=W, real_height=H, sampler_u8=True)
    ph, pw = ref_p.shape

    pr = np.load(args.prior_npz)
    valid = np.zeros((ph, pw), bool)
    valid[:H, :W] = True

    @jax.jit
    def make_planes(data, depth, normal):
        return filters.depth_normal_to_planes(data, depth, normal)

    planes = make_planes(data, jnp.asarray(pr["depth"], jnp.float32),
                         jnp.asarray(pr["normal"], jnp.float32))

    params = cfg_mod.PatchMatchParams()
    chunk0 = 1 << 17
    n = ph * pw
    ys, xs = np.mgrid[0:ph, 0:pw]
    xf = np.pad(xs.reshape(-1).astype(np.float32), (0, (-n) % chunk0),
                mode="edge")
    yf = np.pad(ys.reshape(-1).astype(np.float32), (0, (-n) % chunk0),
                mode="edge")
    pf = np.asarray(planes.reshape(-1, 4))
    pf = np.concatenate([pf, np.repeat(pf[-1:], (-n) % chunk0, 0)])

    @jax.jit
    def init_chunk(data, p, x, y):
        return initial_cost_chunk(data, p, x, y, params)

    t0 = time.time()
    outs = []
    for ci in range(len(xf) // chunk0):
        sl = slice(ci * chunk0, (ci + 1) * chunk0)
        outs.append(init_chunk(data, jnp.asarray(pf[sl]),
                               jnp.asarray(xf[sl]), jnp.asarray(yf[sl])))
        pm._throttle(outs, site="ab-init")
    costs_all = jnp.concatenate(outs, 0)[:n]
    mean_cost, selected = initial_cost_and_selection(costs_all, params.top_k)
    print(f"init costs: {time.time() - t0:.1f} s", flush=True)

    # host copies: the commit donates the state, so each arm re-uploads
    state_np = dict(
        planes=np.asarray(planes),
        costs=np.asarray(jnp.where(jnp.asarray(valid),
                                   mean_cost.reshape(ph, pw), 1e9)),
        selected=np.asarray(selected.reshape(ph, pw, -1)
                            & valid[:, :, None]),
        weak=np.where(valid, np.asarray(pr["weak"], np.int32),
                      cfg_mod.UNKNOWN),
        confidence=np.asarray(pr["confidence"], np.float32))

    def fresh_state():
        st = PMState.create(ph, pw, data.num_src, valid=jnp.asarray(valid))
        return st.replace(
            planes=jnp.asarray(state_np["planes"]),
            costs=jnp.asarray(state_np["costs"]),
            selected=jnp.asarray(state_np["selected"]),
            weak=jnp.asarray(state_np["weak"]),
            confidence=jnp.asarray(state_np["confidence"]))

    prop_cfg = PropCfg(
        top_k=params.top_k, geom_consistency=False, use_impetus=True,
        use_sa=False, refine_init=True,
        strong_radius=params.strong_radius,
        strong_increment=params.strong_increment,
        weak_radius=params.weak_radius,
        weak_increment=params.weak_increment)
    chunk_s, _ = pm._host_chunks(data.num_src, banded=True)
    print(json.dumps({"strong_chunk": chunk_s}), flush=True)

    arms = [("refine-banded", True, True),
            ("base-only", False, True),
            ("bands-off", False, False)]
    results = {}
    for tag, band_refine, enable in arms:
        bands.set_band_refine(band_refine)
        walls = []
        chk = None
        for rep in range(args.reps):
            st = fresh_state()
            key = jax.random.PRNGKey(1000 + rep)   # same keys across arms
            for v in BAND_DISPATCH_STATS.values():
                v[0] = v[1] = 0
            t0 = time.time()
            for color in (0, 1):
                st = propagate_strong_host(
                    data, st, prop_cfg, jnp.int32(0),
                    jax.random.fold_in(key, color), color, dmin, dmax,
                    jnp.float32(0.2), chunk=chunk_s, enable_bands=enable)
            c = float(np.asarray(st.costs[valid].sum()))
            walls.append(time.time() - t0)
            chk = c
        stats = {k: list(v) for k, v in BAND_DISPATCH_STATS.items()}
        results[tag] = (min(walls), chk)
        print(json.dumps({
            "arm": tag, "wall_s": [round(w, 1) for w in walls],
            "best_s": round(min(walls), 1),
            "checksum": chk, "band_dispatch": stats["strong"]}), flush=True)
    base = results["refine-banded"][0]
    print(json.dumps({
        "speedup_vs_refine_banded": {
            t: round(base / r[0], 3) for t, r in results.items()},
        "checksums_equal": len({round(r[1], 2)
                                for r in results.values()}) == 1}),
        flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
