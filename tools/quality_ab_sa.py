"""A/B the SA-mask gating deviation against reference semantics.

Reference (/root/reference/APD.cu:614-621): the square-vs-star window CHOICE
is gated on `sa_mask[center]` where `center` is computed from the *warped
source* coordinates — i.e. the ref view's mask indexed with src-view
positions (per pixel, per view, per hypothesis, since the warp depends on
the plane).  This rebuild gates on the ref pixel's own segment
(ops/cost.py:128-139), the sane reading of the intent.

This script quantifies the divergence on an SA-enabled synthetic scene:
  - gate disagreement rate over (pixel, view, hypothesis)
  - cost deltas where gates disagree
  - fraction of pixels whose best-candidate choice flips
  - depth impact of the flips against analytic ground truth

Run: python tools/quality_ab_sa.py   (CPU or TPU; small scene)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_sa_scene(height=120, width=160):
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.testing import synthetic

    scene = synthetic.make_scene(
        num_views=4, height=height, width=width,
        weak_region=(-0.35, 0.35, -0.25, 0.25))
    # SA mask for the ref view: the weak plane's hit region is one segment
    weak_depth = 4.0 * 0.82
    dep = scene.depths[0]
    sa = ((np.abs(dep - weak_depth) < 0.05 * weak_depth) & (dep > 0)
          ).astype(np.int32)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([1, 2, 3])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        sa_mask=jnp.asarray(sa))
    return scene, data, sa


def main():
    import jax
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops import cost as cost_ops
    from apde_mvs_tpu.ops.cost import precompute_ref_window
    from apde_mvs_tpu.ops.propagation import checkerboard_candidates
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.ops.init import random_planes, initial_cost
    from apde_mvs_tpu.config import PatchMatchParams

    scene, data, sa = build_sa_scene()
    h, w = data.height, data.width
    S = data.num_src

    # converge a few plain iterations to get realistic planes
    from apde_mvs_tpu.pipeline.patchmatch import run_patchmatch
    from apde_mvs_tpu.config import PatchMatchParams as P

    params = PatchMatchParams(state="first_init", use_sa=True,
                              max_iterations=3, use_apd=False)
    out = run_patchmatch(
        data, params, depth_min=scene.cameras[0].depth_min,
        depth_max=scene.cameras[0].depth_max, seed=0)
    planes = jnp.concatenate(
        [jnp.asarray(out.normal), jnp.asarray(out.depth)[..., None]],
        axis=-1)
    # normals back to camera plane encoding for cost evaluation
    ys, xs = np.mgrid[6:h - 6, 6:w - 6]
    x = jnp.asarray(xs.ravel(), jnp.int32)
    y = jnp.asarray(ys.ravel(), jnp.int32)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    B = int(x.shape[0])

    from apde_mvs_tpu.core.sampling import fetch
    cam = data.ref_cam
    n_world = fetch(jnp.asarray(out.normal), x, y)
    d_pix = fetch(jnp.asarray(out.depth), x, y)
    n4 = jnp.concatenate([n_world, jnp.zeros_like(n_world[..., :1])], -1)
    n_cam = geo.normal_world_to_cam(cam.R, n4)[..., :3]
    plane = geo.make_plane(cam, xf, yf, d_pix, n_cam)

    # candidate set: current plane + 8 checkerboard candidates
    costs_map = jnp.asarray(out.cost) if hasattr(out, "cost") else \
        jnp.zeros((h, w), jnp.float32)
    cand_x, cand_y, flags = checkerboard_candidates(costs_map, x, y)
    planes_map = jnp.zeros((h, w, 4), jnp.float32)
    planes_map = planes_map.at[
        jnp.asarray(ys), jnp.asarray(xs)].set(plane.reshape(ys.shape + (4,)))
    cand_planes = fetch(planes_map, cand_x, cand_y)        # (B, 8, 4)
    all_planes = jnp.concatenate([plane[:, None], cand_planes], 1)  # (B,9,4)

    # our semantics: window per ref pixel
    win_ours = precompute_ref_window(data, xf, yf, 5, 2, True)
    # reference-gate windows: both pure variants
    win_sq = precompute_ref_window(data, xf, yf, 5, 2, False)
    data_star = data.replace(sa_mask=jnp.where(
        data.sa_mask > 0, data.sa_mask, 999))   # force star everywhere
    win_star = precompute_ref_window(data_star, xf, yf, 5, 2, True)

    @jax.jit
    def eval_all(plane9):
        def one(c, _):
            p = plane9[:, c]
            ours = cost_ops.ncc_strong(data, xf, yf, p, win_ours)
            csq = cost_ops.ncc_strong(data, xf, yf, p, win_sq)
            cst = cost_ops.ncc_strong(data, xf, yf, p, win_star)
            # reference gate: sa_mask (ref view) indexed at the WARPED pos
            gates = []
            for s in range(S):
                H = geo.homography(cam, data.src_cams.view(s), p)
                cx, cy = geo.warp(H, xf, yf)
                xi = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
                yi = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
                gates.append(fetch(data.sa_mask, xi, yi) > 0)
            gate = jnp.stack(gates, -1)                     # (B, S)
            ref_cost = jnp.where(gate, cst, csq)
            return c + 1, (ours, ref_cost, gate)
        _, (ours, refc, gate) = jax.lax.scan(one, 0, None, length=9)
        return (jnp.moveaxis(ours, 0, 1), jnp.moveaxis(refc, 0, 1),
                jnp.moveaxis(gate, 0, 1))

    ours, refc, gate = eval_all(all_planes)
    ours = np.asarray(ours)      # (B, 9, S)
    refc = np.asarray(refc)
    gate = np.asarray(gate)

    ours_gate = np.asarray(fetch(data.sa_mask, x, y) > 0)[:, None, None]
    ours_gate = np.broadcast_to(ours_gate, gate.shape)
    disagree = gate != ours_gate

    in_seg = np.asarray(fetch(data.sa_mask, x, y) > 0)
    print(f"pixels evaluated: {B} ({in_seg.mean()*100:.1f}% in-segment)")
    print(f"gate disagreement over (pixel,hyp,view): "
          f"{disagree.mean()*100:.3f}%")
    print(f"gate disagreement among in-segment pixels: "
          f"{disagree[in_seg].mean()*100:.3f}%")
    dc = np.abs(ours - refc)
    print(f"|cost delta| where gates disagree: "
          f"mean {dc[disagree].mean():.4f}  p95 "
          f"{np.percentile(dc[disagree], 95) if disagree.any() else 0:.4f}")

    # best-candidate flip rate (equal-weight view aggregation)
    best_ours = ours.mean(-1).argmin(1)
    best_ref = refc.mean(-1).argmin(1)
    flips = best_ours != best_ref
    print(f"best-hypothesis flips: {flips.mean()*100:.3f}% of pixels")

    # depth impact of the flips
    depths = np.asarray(jax.vmap(
        lambda p9, xx, yy: geo.depth_from_plane(cam, p9, xx, yy),
        in_axes=(0, 0, 0))(all_planes, xf, yf))             # (B, 9)
    gt = scene.depths[0][6:h - 6, 6:w - 6].ravel()
    valid = gt > 0
    e_ours = np.abs(depths[np.arange(B), best_ours] - gt) / np.maximum(gt, 1e-6)
    e_ref = np.abs(depths[np.arange(B), best_ref] - gt) / np.maximum(gt, 1e-6)
    print(f"median rel depth err — ours-gate: {np.median(e_ours[valid]):.5f}  "
          f"ref-gate: {np.median(e_ref[valid]):.5f}")


if __name__ == "__main__":
    main()
