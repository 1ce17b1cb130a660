"""Native (C++) components: on-demand compiled via the system toolchain, loaded
through ctypes. These replace the reference's native dependencies (SURVEY.md §2.9):
pyrender/EGL rasterization -> rasterizer.cpp; ffmpeg/audioread MP3 decode -> mp3.cpp.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.environ.get(
    "PANTOMATRIX_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "pantomatrix_tpu", "native"),
)


def _build(src_name: str) -> str:
    """Compile <src_name> to a cached shared object keyed by source hash."""
    src = os.path.join(_SRC_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    base = os.path.splitext(src_name)[0]
    out = os.path.join(_CACHE_DIR, f"{base}-{digest}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = out + ".tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", src, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


_rasterizer_lib: Optional[ctypes.CDLL] = None


def rasterizer() -> ctypes.CDLL:
    """Load (building if needed) the mesh rasterizer."""
    global _rasterizer_lib
    if _rasterizer_lib is None:
        lib = ctypes.CDLL(_build("rasterizer.cpp"))
        lib.render_mesh_frames.restype = None
        lib.render_mesh_frames.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_float,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        _rasterizer_lib = lib
    return _rasterizer_lib


def render_mesh_frames(vertices, faces, width: int, height: int, *,
                       xmag: float = 1.0, ymag: float = 1.0,
                       light_dir=(0.0, 0.5, 0.866), light_intensity: float = 4.0,
                       color=(220, 220, 220), ambient: float = 0.25,
                       n_threads: Optional[int] = None):
    """vertices (n, V, 3) float32 camera-space -> (n, h, w, 3) uint8 frames."""
    import numpy as np

    lib = rasterizer()
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    n, V, _ = vertices.shape
    F = faces.shape[0]
    out = np.empty((n, height, width, 3), np.uint8)
    ld = np.ascontiguousarray(light_dir, np.float32)
    col = np.ascontiguousarray(color, np.uint8)
    if n_threads is None:
        n_threads = max(1, (os.cpu_count() or 2) - 1)
    lib.render_mesh_frames(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, V,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), F, width, height,
        ctypes.c_float(xmag), ctypes.c_float(ymag),
        ld.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(light_intensity),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), ctypes.c_float(ambient),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads,
    )
    return out


__all__ = ["render_mesh_frames", "rasterizer"]
