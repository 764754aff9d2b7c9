"""Camera geometry for PatchMatch MVS, as vectorized JAX ops.

All functions broadcast over arbitrary leading batch dimensions; pixel
coordinates are (x, y) float pairs in image space, planes are
(nx, ny, nz, w) with the normal in the reference-camera frame and w the
signed plane distance to the camera origin (the float4 "plane hypothesis"
of the reference, main.h / APD.cu:218-240).

Reference formulas (cited per function) are re-derived, not transcribed:
the reference assumes zero-skew intrinsics (it never reads K[0,1]); we do the
same and document it.

Camera convention: x_cam = R @ x_world + t;  world center c = -R^T t.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mat3_vec(M, v):
    """Unrolled 3x3 matrix-vector product: stays in f32 on the VPU (einsum on
    tiny matrices would route to the MXU at bf16 precision on TPU)."""
    return jnp.stack([
        M[..., 0, 0] * v[..., 0] + M[..., 0, 1] * v[..., 1] + M[..., 0, 2] * v[..., 2],
        M[..., 1, 0] * v[..., 0] + M[..., 1, 1] * v[..., 1] + M[..., 1, 2] * v[..., 2],
        M[..., 2, 0] * v[..., 0] + M[..., 2, 1] * v[..., 1] + M[..., 2, 2] * v[..., 2],
    ], axis=-1)


def mat3t_vec(M, v):
    """Unrolled transpose(3x3) matrix-vector product."""
    return jnp.stack([
        M[..., 0, 0] * v[..., 0] + M[..., 1, 0] * v[..., 1] + M[..., 2, 0] * v[..., 2],
        M[..., 0, 1] * v[..., 0] + M[..., 1, 1] * v[..., 1] + M[..., 2, 1] * v[..., 2],
        M[..., 0, 2] * v[..., 0] + M[..., 1, 2] * v[..., 1] + M[..., 2, 2] * v[..., 2],
    ], axis=-1)


def mat3_mat3t(A, B):
    """Unrolled A @ B^T for 3x3 matrices."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(A[..., i, 0] * B[..., j, 0]
                        + A[..., i, 1] * B[..., j, 1]
                        + A[..., i, 2] * B[..., j, 2])
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


class CameraArrays(NamedTuple):
    """A batch of pinhole cameras as stacked arrays (leading dim = view).

    fx, fy, cx, cy are pre-extracted from K for cheap scalar math on TPU.
    """

    K: jnp.ndarray    # (..., 3, 3)
    R: jnp.ndarray    # (..., 3, 3)
    t: jnp.ndarray    # (..., 3)
    c: jnp.ndarray    # (..., 3) world center

    @property
    def fx(self):
        return self.K[..., 0, 0]

    @property
    def fy(self):
        return self.K[..., 1, 1]

    @property
    def cx(self):
        return self.K[..., 0, 2]

    @property
    def cy(self):
        return self.K[..., 1, 2]

    @staticmethod
    def from_cameras(cams, dtype=jnp.float32) -> "CameraArrays":
        """Stack a list of io.cameras.Camera into device arrays."""
        K = np.stack([c.K for c in cams]).astype(np.float32)
        R = np.stack([c.R for c in cams]).astype(np.float32)
        t = np.stack([c.t for c in cams]).astype(np.float32)
        cw = np.stack([c.c for c in cams]).astype(np.float32)
        return CameraArrays(jnp.asarray(K, dtype), jnp.asarray(R, dtype),
                            jnp.asarray(t, dtype), jnp.asarray(cw, dtype))

    def view(self, i) -> "CameraArrays":
        return CameraArrays(self.K[i], self.R[i], self.t[i], self.c[i])


def backproject(cam: CameraArrays, x, y, depth):
    """Pixel + depth -> point in camera frame (reference: Get3DPoint,
    APD.cu:190-202). Returns (..., 3)."""
    X = depth * (x - cam.cx) / cam.fx
    Y = depth * (y - cam.cy) / cam.fy
    return jnp.stack([X, Y, depth * jnp.ones_like(X)], axis=-1)


def cam_to_world(cam: CameraArrays, X_cam):
    """Camera-frame point -> world (reference: Get3DPointonWorld_cu,
    APD.cu:831-851): R^T X + c."""
    return mat3t_vec(cam.R, X_cam) + cam.c


def backproject_world(cam: CameraArrays, x, y, depth):
    return cam_to_world(cam, backproject(cam, x, y, depth))


def project(cam: CameraArrays, X_world):
    """World point -> (x, y, depth) in a camera (reference: ProjectonCamera_cu,
    APD.cu:853-863)."""
    Xc = mat3_vec(cam.R, X_world) + cam.t
    uvw = mat3_vec(cam.K, Xc)
    depth = uvw[..., 2]
    x = uvw[..., 0] / depth
    y = uvw[..., 1] / depth
    return x, y, depth


def view_direction(cam: CameraArrays, x, y, depth=1.0):
    """Unit vector from the camera origin through the pixel (reference:
    GetViewDirection, APD.cu:204-216)."""
    X = backproject(cam, x, y, jnp.asarray(depth, jnp.float32) * jnp.ones_like(x))
    return X / jnp.linalg.norm(X, axis=-1, keepdims=True)


def plane_dist_to_origin(cam: CameraArrays, x, y, depth, normal):
    """w = -(n . X) for the backprojected point (reference: GetDistance2Origin,
    APD.cu:218-223). normal (..., 3) -> scalar (...)."""
    X = backproject(cam, x, y, depth)
    return -jnp.sum(normal * X, axis=-1)


def depth_from_plane(cam: CameraArrays, plane, x, y):
    """Depth induced at pixel (x, y) by plane (nx, ny, nz, w)
    (reference: ComputeDepthfromPlaneHypothesis, APD.cu:237-240)."""
    nx, ny, nz, w = plane[..., 0], plane[..., 1], plane[..., 2], plane[..., 3]
    denom = (x - cam.cx) * nx + (cam.fx / cam.fy) * (y - cam.cy) * ny + cam.fx * nz
    return -w * cam.fx / denom


def make_plane(cam: CameraArrays, x, y, depth, normal):
    """Assemble a plane hypothesis (normal, w) for a pixel at given depth."""
    w = plane_dist_to_origin(cam, x, y, depth, normal)
    return jnp.concatenate([normal, w[..., None]], axis=-1)


def normal_cam_to_world(R, normal4):
    """Rotate a plane hypothesis' normal from ref-camera frame to world
    (reference: TransformNormal, APD.cu:405-413): n_w = R^T n_c; w unchanged."""
    n = mat3t_vec(R, normal4[..., :3])
    return jnp.concatenate([n, normal4[..., 3:4]], axis=-1)


def normal_world_to_cam(R, normal4):
    """Inverse of normal_cam_to_world (reference: TransformNormal2RefCam,
    APD.cu:415-423): n_c = R n_w."""
    n = mat3_vec(R, normal4[..., :3])
    return jnp.concatenate([n, normal4[..., 3:4]], axis=-1)


def relative_pose(ref: CameraArrays, src: CameraArrays):
    """R_rel = R_src R_ref^T; t_rel = R_src (c_ref - c_src)
    (reference: ComputeHomography, APD.cu:334-362)."""
    R_rel = mat3_mat3t(src.R, ref.R)
    t_rel = mat3_vec(src.R, ref.c - src.c)
    return R_rel, t_rel


def homography(ref: CameraArrays, src: CameraArrays, plane):
    """Plane-induced homography H = K_src (R_rel - t_rel n^T / w) K_ref^{-1}
    mapping ref pixels to src pixels (reference: ComputeHomography,
    APD.cu:334-394; zero skew assumed, as in the reference).

    plane: (..., 4). Returns (..., 3, 3).
    """
    R_rel, t_rel = relative_pose(ref, src)
    n = plane[..., :3]
    w = plane[..., 3:4]
    M = R_rel - t_rel[..., :, None] * (n / w)[..., None, :]

    # Right-multiply by K_ref^{-1} (zero skew):
    # K^{-1} = [[1/fx, 0, -cx/fx], [0, 1/fy, -cy/fy], [0, 0, 1]]
    fx_r, fy_r = ref.fx[..., None], ref.fy[..., None]
    cx_r, cy_r = ref.cx[..., None], ref.cy[..., None]
    col0 = M[..., 0] / fx_r
    col1 = M[..., 1] / fy_r
    col2 = M[..., 2] - col0 * cx_r - col1 * cy_r
    MKinv = jnp.stack([col0, col1, col2], axis=-1)

    # Left-multiply by K_src (zero skew).
    fx_s, fy_s = src.fx[..., None], src.fy[..., None]
    cx_s, cy_s = src.cx[..., None], src.cy[..., None]
    row0 = fx_s * MKinv[..., 0, :] + cx_s * MKinv[..., 2, :]
    row1 = fy_s * MKinv[..., 1, :] + cy_s * MKinv[..., 2, :]
    row2 = MKinv[..., 2, :]
    return jnp.stack([row0, row1, row2], axis=-2)


def warp(H, x, y):
    """Apply a homography to pixel coordinates (reference:
    ComputeCorrespondingPoint, APD.cu:396-403). H (..., 3, 3); x, y (...)."""
    px = H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]
    py = H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]
    pz = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    return px / pz, py / pz


def angle_between(v1, v2, eps=1e-12):
    """Angle in radians between two vectors; 0 where degenerate
    (reference: GetAngle, APD.cpp:902-910)."""
    dot = jnp.sum(v1 * v2, axis=-1)
    denom = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    cosang = jnp.clip(dot / jnp.maximum(denom, eps), -1.0, 1.0)
    ang = jnp.arccos(cosang)
    return jnp.where(jnp.isfinite(ang), ang, 0.0)


# ---------------------------------------------------------------------------
# Random plane hypothesis generation (deterministic key-split JAX PRNG
# replacing clock-seeded curand; reference: APD.cu:242-332, 904-917).
# ---------------------------------------------------------------------------

def unit_normal_facing_from_gaussian(g, cam: CameraArrays, x, y, depth):
    """Deterministic tail of `random_unit_normal_facing` given the raw
    Gaussian draw `g` (..., 3) — split out so the static-band bound pre-pass
    (ops.bands) can re-apply one shared draw to every possible refinement
    winner bitwise-identically."""
    n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    vd = view_direction(cam, x, y, depth)
    flip = jnp.sum(n * vd, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def random_unit_normal_facing(key, cam: CameraArrays, x, y, depth):
    """Uniform random unit normal flipped to face the camera (reference:
    GenerateRandomNormal, APD.cu:242-268; Marsaglia sampling replaced by
    normalized Gaussians — identical distribution, no rejection loop)."""
    g = jax.random.normal(key, x.shape + (3,), dtype=jnp.float32)
    return unit_normal_facing_from_gaussian(g, cam, x, y, depth)


def _euler_rotation(a1, a2, a3):
    """Small-angle Euler rotation matrix (reference: GeneratePerturbedNormal,
    APD.cu:270-305)."""
    s1, s2, s3 = jnp.sin(a1), jnp.sin(a2), jnp.sin(a3)
    c1, c2, c3 = jnp.cos(a1), jnp.cos(a2), jnp.cos(a3)
    row0 = jnp.stack([c2 * c3, c3 * s1 * s2 - c1 * s3, s1 * s3 + c1 * c3 * s2], -1)
    row1 = jnp.stack([c2 * s3, c1 * c3 + s1 * s2 * s3, c1 * s2 * s3 - c3 * s1], -1)
    row2 = jnp.stack([-s2, c2 * s1, c1 * c2], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def perturbed_normal_from_angles(angles, cam: CameraArrays, x, y, normal):
    """Deterministic tail of `perturbed_normal` given the Euler-angle draw
    (..., 3) — see unit_normal_facing_from_gaussian for why it is split."""
    Rp = _euler_rotation(angles[..., 0], angles[..., 1], angles[..., 2])
    n_p = mat3_vec(Rp, normal)
    vd = view_direction(cam, x, y, 1.0)
    bad = jnp.sum(n_p * vd, axis=-1, keepdims=True) >= 0
    n_p = jnp.where(bad, normal, n_p)
    return n_p / jnp.maximum(jnp.linalg.norm(n_p, axis=-1, keepdims=True), 1e-12)


def perturbed_normal(key, cam: CameraArrays, x, y, normal, perturbation):
    """Randomly perturbed normal; falls back to the original when the
    perturbed normal faces away (reference: APD.cu:270-305)."""
    angles = (jax.random.uniform(key, x.shape + (3,), dtype=jnp.float32) - 0.5) \
        * perturbation
    return perturbed_normal_from_angles(angles, cam, x, y, normal)


def random_plane_hypothesis(key, cam: CameraArrays, x, y, depth_min, depth_max):
    """Random depth in range + random facing normal -> plane
    (reference: GenerateRandomPlaneHypothesis, APD.cu:307-313)."""
    kd, kn = jax.random.split(key)
    depth = jax.random.uniform(kd, x.shape, dtype=jnp.float32,
                               minval=depth_min, maxval=depth_max)
    n = random_unit_normal_facing(kn, cam, x, y, depth)
    return make_plane(cam, x, y, depth, n)
