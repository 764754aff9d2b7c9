"""Synthetic multi-view scenes with analytic ground truth.

The reference has no test fixtures at all (SURVEY.md §4); this module is the
foundation of our test pyramid: scenes are planes rendered through the exact
same pinhole model the engine uses, with a continuous procedural texture, so
every view is geometrically and photometrically consistent by construction and
ground-truth depth/normal maps are available analytically.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..io.cameras import Camera


def procedural_texture(X: np.ndarray, amplitude: float = 55.0,
                       seed: int = 0) -> np.ndarray:
    """Continuous multi-frequency texture over world points X (..., 3).

    Values in roughly [0, 255]; high-frequency content gives NCC enough
    signal at small windows.
    """
    rng = np.random.default_rng(seed)
    val = np.zeros(X.shape[:-1])
    for freq in (1.7, 3.9, 8.3, 17.0, 31.0):
        w = rng.normal(size=3)
        phase = rng.uniform(0, 2 * np.pi)
        val += np.sin(freq * (X @ w) + phase)
    val = 127.5 + amplitude * val / np.sqrt(5)
    return np.clip(val, 0.0, 255.0)


@dataclasses.dataclass
class PlanePrimitive:
    """World plane n . X + w = 0 covering an (optional) rectangle in x/y."""

    normal: np.ndarray
    w: float
    bounds: Optional[Tuple[float, float, float, float]] = None  # x0, x1, y0, y1
    texture_amplitude: float = 55.0
    texture_seed: int = 0


@dataclasses.dataclass
class SyntheticScene:
    cameras: List[Camera]
    images: np.ndarray        # (V, H, W) float32, 0..255
    depths: np.ndarray        # (V, H, W) float32, 0 where no surface
    normals: np.ndarray       # (V, H, W, 3) world-frame unit normals
    planes: List[PlanePrimitive]

    @property
    def num_views(self) -> int:
        return len(self.cameras)


def _look_at_camera(center: np.ndarray, target: np.ndarray, up: np.ndarray,
                    K: np.ndarray) -> Camera:
    z = target - center
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # rows: camera axes in world frame
    t = -R @ center
    return Camera(K=K, R=R, t=t)


def render_view(cam: Camera, planes: List[PlanePrimitive], height: int,
                width: int):
    """Ray-cast the plane set for one camera; returns (image, depth, normal)."""
    xs, ys = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    # ray directions in world frame through pixel centers
    d_cam = np.stack([(xs - cam.K[0, 2]) / cam.K[0, 0],
                      (ys - cam.K[1, 2]) / cam.K[1, 1],
                      np.ones_like(xs)], axis=-1)
    d_world = d_cam @ cam.R  # (R^T d)
    c = cam.c

    depth = np.full((height, width), np.inf)
    img = np.zeros((height, width))
    nrm = np.zeros((height, width, 3))
    for pl in planes:
        n = pl.normal / np.linalg.norm(pl.normal)
        denom = d_world @ n
        tnum = -(pl.w + c @ n)
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = tnum / denom
        X = c[None, None] + tt[..., None] * d_world
        z_cam = tt * d_cam[..., 2]  # camera-frame depth = t * 1 along optical axis
        hit = (tt > 0) & np.isfinite(tt)
        if pl.bounds is not None:
            x0, x1, y0, y1 = pl.bounds
            hit &= (X[..., 0] >= x0) & (X[..., 0] <= x1) \
                & (X[..., 1] >= y0) & (X[..., 1] <= y1)
        hit &= z_cam < depth
        tex = procedural_texture(X, pl.texture_amplitude, pl.texture_seed)
        img = np.where(hit, tex, img)
        nrm = np.where(hit[..., None], n[None, None], nrm)
        depth = np.where(hit, z_cam, depth)
    depth = np.where(np.isfinite(depth), depth, 0.0)
    return img.astype(np.float32), depth.astype(np.float32), nrm.astype(np.float32)


def make_scene(
    num_views: int = 4,
    height: int = 96,
    width: int = 128,
    baseline: float = 0.25,
    focal: float = 160.0,
    plane_depth: float = 4.0,
    plane_tilt: Tuple[float, float] = (0.25, -0.15),
    with_foreground: bool = False,
    texture_amplitude: float = 55.0,
    weak_region: Optional[Tuple[float, float, float, float]] = None,
) -> SyntheticScene:
    """Cameras on a horizontal arc looking at a slanted textured plane.

    ``weak_region`` (if set) is currently realized as a second, low-texture
    plane segment to exercise weak-texture classification.
    """
    K = np.array([[focal, 0.0, width / 2.0],
                  [0.0, focal, height / 2.0],
                  [0.0, 0.0, 1.0]])
    # background plane: z ~ plane_depth with a tilt
    n = np.array([plane_tilt[0], plane_tilt[1], -1.0])
    n = n / np.linalg.norm(n)
    w = -n @ np.array([0.0, 0.0, plane_depth])
    planes = [PlanePrimitive(normal=n, w=w, texture_amplitude=texture_amplitude)]
    if with_foreground:
        nf = np.array([0.05, 0.0, -1.0])
        nf = nf / np.linalg.norm(nf)
        wf = -nf @ np.array([0.0, 0.0, plane_depth * 0.6])
        planes.append(PlanePrimitive(
            normal=nf, w=wf, bounds=(-0.45, 0.45, -0.35, 0.35),
            texture_amplitude=texture_amplitude, texture_seed=3))
    if weak_region is not None:
        nw_ = np.array([0.0, 0.0, -1.0])
        ww = -nw_ @ np.array([0.0, 0.0, plane_depth * 0.82])
        planes.append(PlanePrimitive(
            normal=nw_, w=ww, bounds=weak_region, texture_amplitude=1.5,
            texture_seed=7))

    target = np.array([0.0, 0.0, plane_depth])
    up = np.array([0.0, -1.0, 0.0])
    cams, imgs, deps, nrms = [], [], [], []
    for v in range(num_views):
        offset = (v - (num_views - 1) / 2.0) * baseline
        center = np.array([offset, 0.05 * offset, 0.0])
        cam = _look_at_camera(center, target, up, K)
        img, dep, nrm = render_view(cam, planes, height, width)
        d_valid = dep[dep > 0]
        cam.depth_min = float(d_valid.min() * 0.8) if d_valid.size else 0.1
        cam.depth_max = float(d_valid.max() * 1.2) if d_valid.size else 10.0
        cam.interval = (cam.depth_max - cam.depth_min) / 192.0
        cam.width, cam.height = width, height
        cams.append(cam)
        imgs.append(img)
        deps.append(dep)
        nrms.append(nrm)
    return SyntheticScene(cams, np.stack(imgs), np.stack(deps), np.stack(nrms),
                          planes)


def write_scene_to_disk(scene: SyntheticScene, root) -> None:
    """Materialize a scene as an MVSNet-format scan folder (images/, cams/,
    pair.txt) so end-to-end CLI tests can run on it."""
    import os

    from ..io.cameras import write_camera, write_pair
    from ..io.images import write_image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cams"), exist_ok=True)
    entries = []
    V = scene.num_views
    for v in range(V):
        img8 = np.clip(scene.images[v], 0, 255).astype(np.uint8)
        write_image(os.path.join(root, "images", f"{v:08d}.png"), img8)
        write_camera(os.path.join(root, "cams", f"{v:08d}_cam.txt"),
                     scene.cameras[v])
        neighbors = [(u, float(V - abs(u - v))) for u in range(V) if u != v]
        neighbors.sort(key=lambda e: -e[1])
        entries.append((v, neighbors))
    write_pair(os.path.join(root, "pair.txt"), entries)
