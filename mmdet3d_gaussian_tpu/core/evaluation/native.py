"""ctypes loader for the native eval kernels (csrc/eval_ops.cpp).

Builds lazily with ``make -C csrc`` on first use if the shared object is
missing; falls back to the NumPy implementations when no toolchain is
available (callers catch ImportError/OSError).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_PKG = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_CSRC = os.path.join(os.path.dirname(_PKG), 'csrc')
_SO = os.path.join(_CSRC, 'libeval_ops.so')
_lib = None


def _find_so():
    """Search order: env override -> repo csrc build -> the extension
    setup.py installs inside the package (``_libeval_ops*.so``)."""
    env = os.environ.get('MMDET3D_TPU_EVAL_LIB')
    if env:
        return env
    if os.path.exists(_SO):
        return _SO
    import glob
    hits = glob.glob(os.path.join(_PKG, '_libeval_ops*.so'))
    if hits:
        return hits[0]
    if os.path.isdir(_CSRC):   # source checkout: build on first use
        subprocess.run(['make', '-C', _CSRC], check=True,
                       capture_output=True)
        return _SO
    raise OSError('no native eval library found (set MMDET3D_TPU_EVAL_LIB '
                  'or build csrc/)')


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_find_so())
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
    lib.iou_bev.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
    lib.iou_3d.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                           ctypes.c_float, f32p]
    lib.match_coco.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, f32p,
                               ctypes.c_int64, u8p, u8p, i32p]
    i8p = np.ctypeslib.ndpointer(np.int8, flags='C_CONTIGUOUS')
    lib.riou5.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                          ctypes.c_int32, f32p]
    lib.kitti_tp_scores.restype = ctypes.c_int64
    lib.kitti_tp_scores.argtypes = [f32p, f32p, i8p, ctypes.c_int64, i8p,
                                    ctypes.c_int64, ctypes.c_float, f32p]
    lib.kitti_stats.argtypes = [f32p, f32p, i8p, ctypes.c_int64, i8p,
                                ctypes.c_int64, f32p, ctypes.c_int64,
                                ctypes.c_float, f32p, ctypes.c_int64, i32p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def iou_bev(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    lib = _load()
    det = np.ascontiguousarray(det, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    out = np.empty((len(det), len(gt)), np.float32)
    lib.iou_bev(det, len(det), gt, len(gt), out)
    return out


def iou_3d(det: np.ndarray, gt: np.ndarray,
           z_offset: float = 0.5) -> np.ndarray:
    lib = _load()
    det = np.ascontiguousarray(det, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    out = np.empty((len(det), len(gt)), np.float32)
    lib.iou_3d(det, len(det), gt, len(gt), z_offset, out)
    return out


def match_coco_native(cost: np.ndarray, thrs: np.ndarray,
                      is_ignore: np.ndarray,
                      is_crowd: np.ndarray) -> np.ndarray:
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float32)
    thrs = np.ascontiguousarray(thrs, np.float32)
    ig = np.ascontiguousarray(is_ignore, np.uint8)
    cr = np.ascontiguousarray(is_crowd, np.uint8)
    out = np.empty((len(thrs), cost.shape[0]), np.int32)
    lib.match_coco(cost, cost.shape[0], cost.shape[1], thrs, len(thrs),
                   ig, cr, out)
    return out
