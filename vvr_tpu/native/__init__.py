"""Native (C++) runtime components, loaded via ctypes.

Build with `make -C vvr_tpu/native` (done automatically on first use if a
compiler is available). Every entry point has a NumPy fallback so the
framework works without the native library; `available()` reports which
path is active.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess

import numpy as np

log = logging.getLogger(__name__)
_DIR = pathlib.Path(__file__).resolve().parent
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libvvr_native.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # pragma: no cover
            log.info("native build unavailable (%s); using NumPy fallbacks", e)
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:  # pragma: no cover
        log.info("could not load %s (%s)", so, e)
        return None

    lib.trace_dense.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.pack_bricks.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
    lib.mesh_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.mesh_chunk.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _pack_xmajor(occ: np.ndarray) -> np.ndarray:
    """bool [z,y,x] -> bit-packed bytes in x-major linear order."""
    return np.packbits(np.asarray(occ, bool).ravel(), bitorder="little")


def trace_dense_native(occ: np.ndarray, ray_o: np.ndarray, ray_d: np.ndarray,
                       max_steps: int | None = None):
    """C++ dense-DDA oracle; same contract as render/oracle.trace_dense.
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    occ = np.asarray(occ, bool)
    size = occ.shape[0]
    if max_steps is None:
        max_steps = 4 * size
    bits = _pack_xmajor(occ)
    o = np.ascontiguousarray(ray_o, np.float32)
    d = np.ascontiguousarray(ray_d, np.float32)
    n = len(o)
    hit = np.zeros(n, np.uint8)
    face = np.zeros(n, np.int32)
    coord = np.zeros(n, np.int32)
    t = np.zeros(n, np.float32)
    lib.trace_dense(bits.ctypes.data, size, o.ctypes.data, d.ctypes.data,
                    n, max_steps, hit.ctypes.data, face.ctypes.data,
                    coord.ctypes.data, t.ctypes.data)
    return dict(hit=hit.astype(bool), face=face, axis_coord=coord, t=t)


def pack_bricks_native(bits_grid: np.ndarray) -> np.ndarray | None:
    """C++ brick-mask packing; bits_grid bool (n,n,n) [z,y,x] -> (m^3,) u64."""
    lib = _load()
    if lib is None:
        return None
    n = bits_grid.shape[0]
    bits = _pack_xmajor(bits_grid)
    out = np.zeros((n // 4) ** 3, np.uint64)
    lib.pack_bricks(bits.ctypes.data, n, out.ctypes.data)
    return out


def mesh_chunk_native(voxels: np.ndarray):
    """C++ chunk mesher: bool (n,n,n) [z,y,x] -> (verts (V,3) f32,
    indices (I,) u32) or None if unavailable / capacity exceeded."""
    lib = _load()
    if lib is None:
        return None
    n = voxels.shape[0]
    bits = _pack_xmajor(voxels)
    vcap = int(voxels.sum()) * 24 + 64
    icap = vcap * 2
    verts = np.zeros((vcap, 3), np.float32)
    idx = np.zeros(icap, np.uint32)
    n_idx = np.zeros(1, np.int64)
    nv = lib.mesh_chunk(bits.ctypes.data, n, verts.ctypes.data, vcap,
                        idx.ctypes.data, icap, n_idx.ctypes.data)
    if nv < 0:
        return None
    return verts[:nv], idx[:int(n_idx[0])]
