"""Sweep throughput/stability vs image size and chunking (random data).

Isolates two full-resolution questions measured on real TPU:
  (a) does the per-row u8 gather rate hold when the quad table grows from
      0.5 MP (bench) to 6-24 MP (ETH3D-native)?
  (b) which stage of the chunked strong sweep crashes the worker at 6 MP?

Random images/planes (content-free) keep setup seconds-fast; the sweep's
cost is data-independent.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/sweep_size_probe.py \
      --width 3024 --height 2016 --views 11 [--stage cands|ncc|sweep]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1512)
    ap.add_argument("--height", type=int, default=1008)
    ap.add_argument("--views", type=int, default=11)
    ap.add_argument("--stage", default="sweep",
                    choices=("cands", "window", "ncc", "selection", "sweep",
                             "median"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from apde_mvs_tpu.core import checkerboard as cb
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops import propagation as prop
    from apde_mvs_tpu.ops.cost import CostData, ncc_strong, \
        precompute_ref_window
    from apde_mvs_tpu.ops.propagation import PropCfg, propagate_strong
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.testing import synthetic

    H, W, V = args.height, args.width, args.views
    S = V - 1
    rng = np.random.default_rng(0)

    # camera ring borrowed from the synthetic generator (content irrelevant)
    scene = synthetic.make_scene(num_views=V, height=32, width=32)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    # patch the intrinsics to the probe resolution
    K = np.asarray(cams.K).copy()
    K[:, 0, 0] = K[:, 1, 1] = 1.25 * W
    K[:, 0, 2] = W / 2.0
    K[:, 1, 2] = H / 2.0
    cams = cams._replace(K=jnp.asarray(K))

    src_ids = np.arange(1, V)
    imgs = rng.integers(0, 256, (V, H, W)).astype(np.float32)
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(imgs[0]), jnp.asarray(imgs[src_ids]), sampler_u8=True)

    dmin, dmax = jnp.float32(2.0), jnp.float32(6.0)
    state = PMState.create(H, W, S)
    planes = np.zeros((H, W, 4), np.float32)
    planes[..., 2] = -1.0
    planes[..., 3] = rng.uniform(2.5, 5.5, (H, W)).astype(np.float32)
    state = state.replace(
        planes=jnp.asarray(planes),
        costs=jnp.asarray(rng.uniform(0, 2, (H, W)).astype(np.float32)),
        selected=jnp.asarray(rng.random((H, W, S)) < 0.4),
    )
    cfg = PropCfg(use_sa=False)
    key = jax.random.PRNGKey(0)

    xs2, ys2 = cb.color_coords(H, W, 0)
    x = xs2.reshape(-1)
    y = ys2.reshape(-1)
    B = int(x.shape[0])
    print(f"B={B} chunk={prop._SWEEP_CHUNK} stage={args.stage}", flush=True)

    def timed(name, fn, *a):
        out = fn(*a)                     # compile
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:4])
        ts = []
        for _r in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:4])
            ts.append(time.perf_counter() - t0)
        print(f"[{name}] min {min(ts):.2f} s over {args.reps}", flush=True)
        return out

    if args.stage == "cands":
        f = jax.jit(lambda c, xx, yy: prop.checkerboard_candidates(c, xx, yy))
        timed("cands", f, state.costs, x, y)
        return 0

    chunk = min(prop._SWEEP_CHUNK, B)
    xc, yc = x[:chunk], y[:chunk]
    if args.stage == "window":
        f = jax.jit(lambda d, xx, yy: precompute_ref_window(
            d, xx.astype(jnp.float32), yy.astype(jnp.float32), 5, 2, False))
        timed("window", f, data, xc, yc)
        return 0

    if args.stage == "ncc":
        pl = jnp.asarray(planes.reshape(-1, 4)[: chunk])

        def one_ncc(d, xx, yy, p):
            win = precompute_ref_window(d, xx.astype(jnp.float32),
                                        yy.astype(jnp.float32), 5, 2, False)
            return ncc_strong(d, xx.astype(jnp.float32),
                              yy.astype(jnp.float32), p, win)
        f = jax.jit(one_ncc)
        out = timed("ncc_1plane", f, data, xc, yc, pl)
        rows = chunk * 36 * S
        print(f"  -> {rows / 1e6:.0f} M rows per call", flush=True)
        return 0

    if args.stage == "median":
        from apde_mvs_tpu.ops import filters

        def dn_median(d, s):
            s = s.replace(planes=filters.planes_to_depth_normal(d, s.planes))
            for color in (0, 1):
                s = filters.median_filter_color(s, color)
            return s
        f = jax.jit(dn_median)
        timed("depth_normal+median", f, data, state)
        return 0

    if args.stage == "selection":
        from apde_mvs_tpu.ops import selection as selm
        probs = jnp.asarray(rng.random((chunk, 8, S)).astype(np.float32))
        pri = jnp.asarray(rng.random((chunk, S)).astype(np.float32))

        def sel_fn(pr, p, k):
            sp = selm.sampling_probabilities(pr, p, jnp.int32(0))
            return selm.monte_carlo_view_weights(k, sp)
        f = jax.jit(sel_fn)
        timed("selection", f, probs, pri, key)
        return 0

    # full sweep
    def sweep(d, s, k):
        return propagate_strong(d, s, cfg, jnp.int32(0), k, 0, dmin, dmax,
                                jnp.float32(0.2))
    f = jax.jit(sweep)
    out = timed("sweep", f, data, state, key)
    hyp = B * 14
    rows = hyp * S * 36
    print(f"  -> {hyp / 1e6:.1f} M hyp, {rows / 1e9:.1f} G rows per sweep",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
