"""ctypes bindings for the native host runtime (native/apde_native.cpp).

The native library accelerates the CPU-side fusion loops and provides the
bin-mat/PLY codecs in C; every entry point has a pure-Python fallback so the
framework runs without the compiled artifact.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_SEARCHED = False


def _candidates():
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return [
        os.environ.get("APDE_NATIVE_LIB", ""),
        os.path.join(root, "native", "libapde_native.so"),
        os.path.join(os.path.dirname(__file__), "libapde_native.so"),
    ]


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    for path in _candidates():
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            _configure(lib)
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return load_native() is not None


_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _configure(lib: ctypes.CDLL) -> None:
    lib.fusion_neighbor_geometry.argtypes = (
        [ctypes.c_int] * 4 + [_f32p] * 8
        + [_f32p, _f32p, _f32p, _f32p, _u8p]
        + [_u8p, _f32p, _f32p, _f32p, _i32p])
    lib.fusion_neighbor_geometry.restype = None
    lib.weak_vis_accumulate.argtypes = (
        [ctypes.c_int] * 4 + [_f32p] * 8
        + [_f32p, _u8p, _u8p, _f32p, _u8p, _u8p]
        + [ctypes.c_float, ctypes.c_float, _i32p, _i32p])
    lib.weak_vis_accumulate.restype = None
    lib.write_ply.argtypes = [ctypes.c_char_p, ctypes.c_int64, _f32p,
                              ctypes.c_void_p]
    lib.write_ply.restype = ctypes.c_int


def _cam_arrays(cam):
    K = np.ascontiguousarray(cam.K, np.float32)
    R = np.ascontiguousarray(cam.R, np.float32)
    t = np.ascontiguousarray(cam.t, np.float32)
    c = np.ascontiguousarray(cam.c, np.float32)
    return K, R, t, c


def fusion_neighbor_geometry(ref_view, src_view):
    """Native equivalent of pipeline.fusion._neighbor_geometry; returns
    (usable, reproj, rel_depth, angle, src_r, src_c) or None if the library
    is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    h, w = ref_view.depth.shape
    sh, sw = src_view.depth.shape
    usable = np.zeros((h, w), np.uint8)
    reproj = np.zeros((h, w), np.float32)
    rel_depth = np.zeros((h, w), np.float32)
    angle = np.zeros((h, w), np.float32)
    src_rc = np.zeros((h, w, 2), np.int32)
    rK, rR, rt, rc = _cam_arrays(ref_view.camera)
    sK, sR, st, sc = _cam_arrays(src_view.camera)
    lib.fusion_neighbor_geometry(
        h, w, sh, sw, rK, rR, rt, rc, sK, sR, st, sc,
        np.ascontiguousarray(ref_view.depth, np.float32),
        np.ascontiguousarray(ref_view.normal, np.float32),
        np.ascontiguousarray(src_view.depth, np.float32),
        np.ascontiguousarray(src_view.normal, np.float32),
        np.ascontiguousarray(src_view.mask.astype(np.uint8)),
        usable, reproj, rel_depth, angle, src_rc.reshape(-1, 2))
    return (usable.astype(bool), reproj, rel_depth, angle,
            src_rc[..., 0].astype(np.int64), src_rc[..., 1].astype(np.int64))


def weak_vis_accumulate(ref_view, src_view, max_baseline_deg, depth_margin,
                        strong_occ, weak_occ) -> bool:
    lib = load_native()
    if lib is None:
        return False
    h, w = ref_view.depth.shape
    sh, sw = src_view.depth.shape
    rK, rR, rt, rc = _cam_arrays(ref_view.camera)
    sK, sR, st, sc = _cam_arrays(src_view.camera)
    lib.weak_vis_accumulate(
        h, w, sh, sw, rK, rR, rt, rc, sK, sR, st, sc,
        np.ascontiguousarray(ref_view.depth, np.float32),
        np.ascontiguousarray(ref_view.weak, np.uint8),
        np.ascontiguousarray(ref_view.confidence, np.uint8),
        np.ascontiguousarray(src_view.depth, np.float32),
        np.ascontiguousarray(src_view.weak, np.uint8),
        np.ascontiguousarray(src_view.confidence, np.uint8),
        float(max_baseline_deg), float(depth_margin), strong_occ, weak_occ)
    return True
