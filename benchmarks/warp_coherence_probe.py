"""Warp-coherence measurement: is a Mosaic slab-gather sampler viable?

The only unexploited sampling primitive on v5e is the dense (8, 128) Mosaic
lane gather (~6.4 G samples/s, PERF_NOTES "Round-2 re-measurement"). To use
it, a GROUP of sampling requests must share one <=128-lane-wide source
window (the gather source is capped at 128 lanes) spanning few sublane rows
(window copy costs 8*K gathered elems per sample, K = y-coverage/8). This
probe measures the actual warped-coordinate spans of the natural request
groups — runs of consecutive same-color checkerboard pixels in one row —
on a converged depth map (ground-truth planes of the bench scene, the
best-case coherence any real sweep iteration can reach).

Geometry predicts failure at MVS-typical warp scale ~1: G same-color pixels
span 2G reference columns, so warped x spans ~2G * dwx/dx ~ 2G; a 128-lane
window caps G at ~60 before accounting for disparity variation. The probe
quantifies exactly that, per group size and per source view.
"""

import json

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.testing import synthetic

    height, width, num_views = 600, 800, 11
    scene = synthetic.make_scene(num_views=num_views, height=height,
                                 width=width, baseline=0.12)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    ref = cams.view(0)

    ys, xs = np.mgrid[0:height, 0:width]
    xs = xs.astype(np.float32)
    ys = ys.astype(np.float32)
    depth = scene.depths[0]
    normal_w = scene.normals[0]
    # world->camera normals, then camera-frame plane per pixel (as the
    # engine stores hypotheses)
    R = np.asarray(ref.R)
    n_cam = normal_w @ R.T
    planes = np.asarray(jax.vmap(geo.make_plane, in_axes=(None, 0, 0, 0, 0))(
        ref, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
        jnp.asarray(depth.ravel()), jnp.asarray(n_cam.reshape(-1, 3))))

    results = {}
    for color in (0,):  # black half; red is symmetric
        # same-color pixels in one row sit 2 apart (checkerboard)
        for G in (32, 64, 128):
            xspans, yspans = [], []
            for v in range(1, num_views):
                src = cams.view(v)
                H = np.asarray(jax.vmap(
                    lambda p: geo.homography(ref, src, p))(
                        jnp.asarray(planes)))
                Hr = H.reshape(height, width, 3, 3)
                wx, wy = geo.warp(jnp.asarray(Hr), jnp.asarray(xs),
                                  jnp.asarray(ys))
                wx = np.asarray(wx)
                wy = np.asarray(wy)
                for y0 in range(100, height, 100):
                    row_x = np.arange((y0 + color) % 2, width, 2)
                    for g0 in range(0, len(row_x) - G, G):
                        gx = row_x[g0:g0 + G]
                        vx = wx[y0, gx]
                        vy = wy[y0, gx]
                        ok = (vx >= 0) & (vx < width) & (vy >= 0) \
                            & (vy < height)
                        if ok.sum() < G // 2:
                            continue
                        xspans.append(vx[ok].max() - vx[ok].min())
                        yspans.append(vy[ok].max() - vy[ok].min())
            xspans = np.asarray(xspans)
            yspans = np.asarray(yspans)
            results[G] = {
                "groups": int(len(xspans)),
                "xspan_p50": float(np.percentile(xspans, 50)),
                "xspan_p90": float(np.percentile(xspans, 90)),
                "xspan_fit128_pct":
                    float((xspans <= 115).mean() * 100),  # 128 - 13 tap halo
                "yspan_p50": float(np.percentile(yspans, 50)),
                "yspan_p90": float(np.percentile(yspans, 90)),
            }
            print(f"G={G}: {json.dumps(results[G])}")

    # economics: slab gather moves 8*K elems/sample; the current u8 quad
    # row-gather moves 1 row/sample at 413 M rows/s; Mosaic lane gather
    # runs 6.9 G elems/s. samples/s(slab) = 6.9e9 / (8 * K) per group that
    # FITS; non-fitting groups fall back to the row-gather path.
    for G, r in results.items():
        K = max(1.0, (r["yspan_p50"] + 13) / 8.0)
        fit = r["xspan_fit128_pct"] / 100.0
        slab_rate = 6.9e9 / (8.0 * K)
        blended = 1.0 / (fit / slab_rate + (1 - fit) / 413e6)
        print(f"G={G}: K~{K:.1f} fit={fit:.0%} slab={slab_rate/1e6:.0f}M "
              f"blended={blended/1e6:.0f}M rows/s (current 413M)")


if __name__ == "__main__":
    main()
