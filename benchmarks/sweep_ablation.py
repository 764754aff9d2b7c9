"""Ablate the strong-sweep NCC hot path on real bench shapes.

Round-1 attributed the sweep's ~15 s to the quad-row gather ("193 M rows/s
ceiling"), but isolated re-measurement of XLA row-takes with fresh inputs
shows ~10 G rows/s — two orders faster. This probe times the REAL per-view
NCC pipeline (B=240k pixels, T=36 taps, S=10 views, bench geometry) with
components knocked out one at a time, all inside ONE lax.scan whose carry
feeds the next iteration's plane (serialized, memoization-proof).

Variants:
  full        — exact _per_view_ncc math (warp, gather, interp, sums, ncc)
  const-idx   — gather with indices forced to a constant (kills the
                data-dependent address stream, keeps the op count)
  no-gather   — bilinear replaced by a cheap function of the coords
  gather-only — just idx computation + row gather + interp, no NCC sums
  warp-only   — homography + tap warp only
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops.cost import CostData, ncc_from_sums, precompute_ref_window
from apde_mvs_tpu.ops.init import random_planes
from apde_mvs_tpu.testing import synthetic

H, W, S1 = 600, 800, 11
LOOPS = 4


def build():
    scene = synthetic.make_scene(num_views=S1, height=H, width=W,
                                 baseline=0.12)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(S1) if v != 0])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        sampler_u8=True)
    return scene, data


def make_fn(data, variant, B, T):
    S = data.num_src
    hw = data.height * data.width

    def per_view(src_index, x, y, plane, win):
        src_cam = data.src_cams.view(src_index)
        quad = data.src_quads[src_index]
        Hm = geo.homography(data.ref_cam, src_cam, plane)
        tx = x[..., None] + win.tap_dx
        ty = y[..., None] + win.tap_dy
        wx, wy = geo.warp(Hm[..., None, :, :], tx, ty)
        if variant == "warp-only":
            return wx.sum(-1) + wy.sum(-1)
        if variant == "no-gather":
            sv = wx * 0.25 + wy * 0.125
        else:
            wxc = jnp.clip(wx, 0.0, data.width - 1.0)
            wyc = jnp.clip(wy, 0.0, data.height - 1.0)
            x0 = jnp.floor(wxc)
            y0 = jnp.floor(wyc)
            fx = wxc - x0
            fy = wyc - y0
            idx = y0.astype(jnp.int32) * data.width + x0.astype(jnp.int32)
            if variant == "const-idx":
                idx = jnp.ones_like(idx)
            v = jnp.take(quad, idx, axis=0).astype(jnp.float32)
            top = v[..., 0] * (1.0 - fx) + v[..., 1] * fx
            bot = v[..., 2] * (1.0 - fx) + v[..., 3] * fx
            sv = top * (1.0 - fy) + bot * fy
        if variant == "gather-only":
            return sv.sum(-1)
        tw = win.tap_w
        s_src = (tw * sv).sum(-1)
        s_ss = (tw * sv * sv).sum(-1)
        s_rs = (tw * win.tap_val * sv).sum(-1)
        return ncc_from_sums(win.sum_ref, win.sum_rr, s_src, s_ss, s_rs,
                             win.wsum)

    def step(carry, _):
        plane, acc = carry
        x = carry_x
        y = carry_y
        win = carry_win

        def view_scan(carry, _):
            s, accv = carry
            c = per_view(s, x, y, plane, win)
            return (s + 1, accv + c), None
        (_, total), _ = jax.lax.scan(
            view_scan, (jnp.int32(0), jnp.zeros(x.shape, jnp.float32)),
            None, length=S)
        # feed cost back into the plane so iterations serialize
        plane = plane + (total[:, None] * 1e-9)
        return (plane, acc + total.mean()), None

    carry_x = None
    carry_y = None
    carry_win = None

    @jax.jit
    def run(x, y, win, plane):
        nonlocal carry_x, carry_y, carry_win
        carry_x, carry_y, carry_win = x, y, win
        (plane, acc), _ = jax.lax.scan(step, (plane, jnp.float32(0.0)), None,
                                       length=LOOPS)
        return acc

    return run


def main():
    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    scene, data = build()
    ys, xs = np.mgrid[0:H, 0:W]
    sel = ((xs + ys) % 2 == 0)
    x = jnp.asarray(xs[sel].ravel(), jnp.int32)
    y = jnp.asarray(ys[sel].ravel(), jnp.int32)
    B = x.shape[0]
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    dmin = jnp.float32(scene.cameras[0].depth_min * 0.6)
    dmax = jnp.float32(scene.cameras[0].depth_max * 1.2)

    win = jax.jit(lambda: precompute_ref_window(data, xf, yf, 5, 2, False))()
    planes_full = random_planes(key, data, dmin, dmax)
    plane = planes_full.reshape(-1, 4)[(y * W + x).astype(jnp.int32)]
    jax.block_until_ready((win, plane))
    T = int(win.tap_dx.shape[-1])
    S = data.num_src
    print(f"B={B} T={T} S={S} loops={LOOPS} "
          f"-> {B*T*S*LOOPS/1e9:.2f} G taps/call")

    for variant in ("warp-only", "no-gather", "const-idx", "gather-only",
                    "full"):
        fn = make_fn(data, variant, B, T)
        out = fn(xf, yf, win, plane)
        jax.block_until_ready(out)
        ts = []
        for r in range(3):
            p2 = plane.at[0, 3].add(1e-6 * (r + 1))   # fresh input per rep
            jax.block_until_ready(p2)
            t0 = time.perf_counter()
            out = fn(xf, yf, win, p2)
            _ = np.asarray(out)        # host readback forces completion
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rate = B * T * S * LOOPS / dt
        print(f"  {variant:11s}: {dt*1e3:7.1f} ms/call  "
              f"{rate/1e6:8.0f} M taps/s")


if __name__ == "__main__":
    main()
