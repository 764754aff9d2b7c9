"""Single-pixel cost inspection (the runtime analogue of the reference's
compile-time DEBUG_POINT_X/Y hooks, main.h:43-44 / DEBUG_COST_LINE,
APD.h:187-189 — but usable without recompiling).

Loads a scan's current state for one reference view and prints, for one
pixel: its plane hypothesis, per-source-view NCC and geometric-consistency
costs, the selected views, and the 61-sample reliability curve.

Usage:
    python -m apde_mvs_tpu.tools.debug_point --dense_folder <scan> \
        --view 3 --point 417,266 [--scale 1]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dense_folder", required=True)
    p.add_argument("--view", type=int, required=True)
    p.add_argument("--point", required=True, help="x,y pixel")
    p.add_argument("--scale", type=int, default=1,
                   help="pyramid scale_size to inspect at")
    p.add_argument("--geom", action="store_true",
                   help="include geometric-consistency costs")
    p.add_argument("--sampler", choices=("u8", "f32"), default="u8",
                   help="sampling-table dtype; must match what the engine "
                        "ran with (cli defaults to u8) or the printed costs "
                        "will not reproduce the engine's")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..config import PatchMatchParams, STRONG, UNKNOWN, WEAK
    from ..core import geometry as geo
    from ..io.binmat import read_bin_mat
    from ..ops import filters
    from ..ops.cost import CostData, geom_cost, ncc_strong, \
        precompute_ref_window
    from ..ops.state import PMState
    from ..pipeline import driver as drv

    x, y = (int(v) for v in args.point.split(","))
    problems = drv.generate_sample_list(args.dense_folder)
    problem = next(pb for pb in problems if pb.ref_image_id == args.view)

    ref_img, ref_cam = drv._load_scaled_view(problem, problem.ref_image_id,
                                             args.scale, None)
    src = [drv._load_scaled_view(problem, sid, args.scale, None)
           for sid in problem.src_image_ids]
    h, w = ref_img.shape
    depth = read_bin_mat(problem.result_folder / "depths.bin")
    normal = read_bin_mat(problem.result_folder / "normals.bin")
    weak = read_bin_mat(problem.result_folder / "weak.bin")
    if depth.shape != (h, w):
        from ..io.images import resize_nearest
        depth = resize_nearest(depth, (h, w))
        normal = resize_nearest(normal, (h, w))
        weak = resize_nearest(weak, (h, w))

    src_depths = None
    if args.geom:
        from ..io.images import resize_nearest
        ds = []
        for sid in problem.src_image_ids:
            d = read_bin_mat(problem.dense_folder / "APD" / f"{sid:08d}"
                             / "depths.bin")
            ds.append(resize_nearest(d, (h, w)) if d.shape != (h, w) else d)
        src_depths = jnp.asarray(np.stack(ds))

    cams = geo.CameraArrays.from_cameras([ref_cam] + [c for _, c in src])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[1:] for a in cams]),
        jnp.asarray(ref_img), jnp.asarray(np.stack([s[0] for s in src])),
        src_depths=src_depths, real_width=w, real_height=h,
        sampler_u8=(args.sampler == "u8"))

    state_names = {0: "WEAK", 1: "STRONG", 2: "UNKNOWN"}
    print(f"pixel ({x}, {y}) of view {args.view} at scale 1/{args.scale}:")
    print(f"  depth   : {depth[y, x]:.6f}")
    print(f"  normal  : {normal[y, x]}")
    print(f"  state   : {state_names.get(int(weak[y, x]), '?')}")

    planes = filters.depth_normal_to_planes(
        data, jnp.asarray(depth, jnp.float32),
        jnp.asarray(normal, jnp.float32))
    plane = planes[y, x][None]
    xf = jnp.asarray([float(x)])
    yf = jnp.asarray([float(y)])
    win = precompute_ref_window(data, xf, yf, 5, 2, False)
    ncc = np.asarray(ncc_strong(data, xf, yf, plane, win))[0]
    print("  per-view NCC cost:")
    for i, sid in enumerate(problem.src_image_ids):
        line = f"    src {sid:3d}: ncc={ncc[i]:.4f}"
        print(line)
    if args.geom:
        g = np.asarray(geom_cost(data, xf, yf, plane))[0]
        print("  per-view geometric cost:")
        for i, sid in enumerate(problem.src_image_ids):
            print(f"    src {sid:3d}: geom={g[i]:.4f}")

    # reliability curve (the DEBUG_COST_LINE analogue)
    S = data.num_src
    st = PMState.create(h, w, S)
    st = st.replace(planes=planes,
                    selected=jnp.ones((h, w, S), bool),
                    view_weights=jnp.full((h, w, S), 1.0))
    curve_weak, curve = filters.depth_to_weak(
        data, st, jnp.asarray([x]), jnp.asarray([y]), jnp.int32(2), False,
        bool(args.geom), jnp.float32(0.2),
        jnp.float32(depth[depth > 0].min() * 0.6 if (depth > 0).any() else 0),
        jnp.float32(depth.max() * 1.2 + 1e-6), return_curve=True)
    c = np.asarray(curve)[0]
    print(f"  reliability curve (61 samples, center=current depth): "
          f"min={c.min():.4f} at offset {int(c.argmin()) - 30}")
    print("   ", " ".join(f"{v:.2f}" for v in c))
    print(f"  reclassification -> "
          f"{state_names.get(int(np.asarray(curve_weak)[0]), '?')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
