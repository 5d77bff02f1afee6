"""ctypes bridge to the native C++ export runtime (native/mc.cpp).

The reference builds its export path as a static C++ library (mc_lib —
cpp/CMakeLists.txt:48-53); here the equivalent is a small shared library
compiled on first use with g++ -O3 and loaded via ctypes.  The triangle
LUT is shipped from Python (ops/mc_tables.py) so the native and numpy
marching-cubes paths produce identical topology.

Set PSGSDF_NO_NATIVE=1 to force the pure-numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_IO_LIB: Optional[ctypes.CDLL] = None
_IO_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "mc.cpp")
_IO_SRC = os.path.join(_NATIVE_DIR, "loader.cpp")


def _build_and_load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    build_dir = os.path.join(os.path.dirname(_SRC), "build")
    so_path = os.path.join(build_dir, "libpsgsdf_native.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            os.makedirs(build_dir, exist_ok=True)
            # build to a temp name then rename (atomic for parallel pytest);
            # unlink the temp on compile failure so failed builds don't
            # accumulate zero/partial .so files in native/build
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=build_dir)
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-o", tmp, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, so_path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.SubprocessError):
        return None

    lib.mc_extract.restype = ctypes.c_int
    lib.mc_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # phi
        ctypes.POINTER(ctypes.c_float),   # weight (nullable)
        ctypes.POINTER(ctypes.c_float),   # color (nullable)
        ctypes.POINTER(ctypes.c_float),   # grad (nullable; Gradient-MC)
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int8),    # tri_table
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mc_free.restype = None
    lib.mc_free.argtypes = [ctypes.c_void_p]
    lib.ply_write_mesh.restype = ctypes.c_int
    lib.ply_write_mesh.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.ply_write_pointcloud.restype = ctypes.c_int
    lib.ply_write_pointcloud.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, built lazily; None if unavailable/disabled."""
    global _LIB, _TRIED
    if os.environ.get("PSGSDF_NO_NATIVE"):
        return None
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            _LIB = _build_and_load()
    return _LIB


def _build_and_load_io() -> Optional[ctypes.CDLL]:
    """Native PNG decoder (native/loader.cpp — the reference's C++ image
    loading layer, ImageLoader.h:130-188). Needs libpng at build time."""
    if not os.path.exists(_IO_SRC):
        return None
    build_dir = os.path.join(_NATIVE_DIR, "build")
    so_path = os.path.join(build_dir, "libpsgsdf_io.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_IO_SRC)):
            os.makedirs(build_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=build_dir)
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-o", tmp, _IO_SRC, "-lpng", "-lz"],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, so_path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.SubprocessError):
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.psg_png_probe.restype = ctypes.c_int
    lib.psg_png_probe.argtypes = [ctypes.c_char_p, i32p, i32p, i32p, i32p]
    lib.psg_png_read_u16.restype = ctypes.c_int
    lib.psg_png_read_u16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64]
    lib.psg_png_read_rgb8.restype = ctypes.c_int
    lib.psg_png_read_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    return lib


def get_io_lib() -> Optional[ctypes.CDLL]:
    """The native decode library; None if unavailable/disabled."""
    global _IO_LIB, _IO_TRIED
    if os.environ.get("PSGSDF_NO_NATIVE"):
        return None
    with _LOCK:
        if not _IO_TRIED:
            _IO_TRIED = True
            _IO_LIB = _build_and_load_io()
    return _IO_LIB


def png_probe(path: str):
    """(width, height, bit_depth, channels) of a PNG, or None."""
    lib = get_io_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    d = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.psg_png_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(d), ctypes.byref(c))
    if rc != 0:
        return None
    return w.value, h.value, d.value, c.value


def png_read_depth_u16(path: str) -> Optional[np.ndarray]:
    """Grayscale PNG -> uint16 [H,W] (8-bit widened value-preserving);
    None if the library is unavailable or the file isn't plain grayscale."""
    lib = get_io_lib()
    if lib is None:
        return None
    meta = png_probe(path)
    if meta is None or meta[3] != 1:
        return None
    w, h = meta[0], meta[1]
    out = np.empty((h, w), dtype=np.uint16)
    rc = lib.psg_png_read_u16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.size)
    return out if rc == 0 else None


def png_read_rgb8(path: str) -> Optional[np.ndarray]:
    """Any PNG -> uint8 RGB [H,W,3] (palette/gray expanded, 16-bit
    narrowed, alpha stripped); None if unavailable or decode fails."""
    lib = get_io_lib()
    if lib is None:
        return None
    meta = png_probe(path)
    if meta is None:
        return None
    w, h = meta[0], meta[1]
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.psg_png_read_rgb8(path.encode(), _u8ptr(out), out.size)
    return out if rc == 0 else None


def marching_cubes_native(
    phi: np.ndarray,
    voxel_size: float,
    origin: Tuple[float, float, float],
    level: float,
    tri_table: np.ndarray,                 # [256,16] int8/int32
    weight: Optional[np.ndarray] = None,
    color: Optional[np.ndarray] = None,
    grad: Optional[np.ndarray] = None,     # [Z,Y,X,3] Gradient-MC placement
):
    """Run the native MC core. Returns (verts, faces, colors|None) or None
    if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    phi = np.ascontiguousarray(phi, dtype=np.float32)
    Z, Y, X = phi.shape
    table = np.ascontiguousarray(tri_table, dtype=np.int8).reshape(-1)

    def fptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    w_arr = (np.ascontiguousarray(weight, dtype=np.float32)
             if weight is not None else None)
    c_arr = (np.ascontiguousarray(color, dtype=np.float32)
             if color is not None else None)
    g_arr = (np.ascontiguousarray(grad, dtype=np.float32)
             if grad is not None else None)

    out_v = ctypes.POINTER(ctypes.c_float)()
    out_f = ctypes.POINTER(ctypes.c_int32)()
    out_c = ctypes.POINTER(ctypes.c_float)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.mc_extract(
        fptr(phi),
        fptr(w_arr) if w_arr is not None else None,
        fptr(c_arr) if c_arr is not None else None,
        fptr(g_arr) if g_arr is not None else None,
        Z, Y, X, ctypes.c_float(level),
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_float(voxel_size),
        ctypes.c_float(origin[0]), ctypes.c_float(origin[1]),
        ctypes.c_float(origin[2]),
        ctypes.byref(out_v), ctypes.byref(out_f), ctypes.byref(out_c),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    try:
        verts = (np.ctypeslib.as_array(out_v, shape=(nv.value, 3)).copy()
                 if nv.value else np.zeros((0, 3), np.float32))
        faces = (np.ctypeslib.as_array(out_f, shape=(nf.value, 3)).copy()
                 if nf.value else np.zeros((0, 3), np.int32))
        colors = None
        if c_arr is not None and nv.value and out_c:
            colors = np.ctypeslib.as_array(out_c, shape=(nv.value, 3)).copy()
    finally:
        for p in (out_v, out_f, out_c):
            if p:
                lib.mc_free(ctypes.cast(p, ctypes.c_void_p))
    return verts, faces, colors


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ply_write_mesh_native(path: str, vertices: np.ndarray, faces: np.ndarray,
                          colors_u8: Optional[np.ndarray]) -> Optional[bool]:
    """Native ASCII mesh-PLY writer; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    c = (np.ascontiguousarray(colors_u8, dtype=np.uint8)
         if colors_u8 is not None else None)
    rc = lib.ply_write_mesh(
        path.encode(), _f32ptr(v), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        _u8ptr(c) if c is not None else None,
    )
    return rc == 0


def ply_write_pointcloud_native(path: str, points: np.ndarray,
                                normals: np.ndarray,
                                colors_u8: np.ndarray) -> Optional[bool]:
    """Native ASCII point-cloud-PLY writer; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(points, dtype=np.float32)
    n = np.ascontiguousarray(normals, dtype=np.float32)
    c = np.ascontiguousarray(colors_u8, dtype=np.uint8)
    rc = lib.ply_write_pointcloud(path.encode(), _f32ptr(p), _f32ptr(n),
                                  _u8ptr(c), len(p))
    return rc == 0
