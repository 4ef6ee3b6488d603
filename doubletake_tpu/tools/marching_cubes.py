"""Host-side isosurface extraction + PLY export (ctypes over native/).

Replaces the reference's mesh-extraction stack (CUDA marching cubes +
skimage single-mesh fork, tools/tsdf.py:182-255) with the C++ marching-
tetrahedra extractor in native/marching.cpp, compiled on first use. A pure
numpy fallback keeps the path alive where a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "marching.cpp"))
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmarching.so"))

_lib = None


def _build_library():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.marching_tetrahedra.restype = ctypes.c_int
    lib.marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def extract_mesh(
    values: np.ndarray,
    weights: Optional[np.ndarray] = None,
    isolevel: float = 0.0,
    weight_threshold: float = 0.0,
    origin: Optional[np.ndarray] = None,
    voxel_size: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (verts, faces) from a dense volume.

    verts are in world coordinates when origin/voxel_size given, else in
    voxel index coordinates. Cells with any unobserved corner
    (weight <= threshold) are skipped when weights is provided.
    """
    vol = np.ascontiguousarray(np.clip(values, -1.0, 1.0), np.float32)
    nx, ny, nz = vol.shape
    lib = _get_lib()

    wptr = None
    if weights is not None:
        wts = np.ascontiguousarray(weights, np.float32)
        wptr = wts.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.marching_tetrahedra(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wptr, ctypes.c_float(weight_threshold),
        nx, ny, nz, ctypes.c_float(isolevel),
        ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(faces_p), ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError("marching_tetrahedra failed")
    try:
        verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(faces_p, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mt_free(verts_p)
        lib.mt_free(faces_p)

    if origin is not None:
        verts = np.asarray(origin, np.float32)[None] + verts * voxel_size
    return verts, faces


def tsdf_to_mesh(tsdf, observed_only: bool = True):
    """Extract the mesh of a doubletake_tpu TSDF volume (world coords)."""
    weights = np.asarray(tsdf.weights) if observed_only else None
    return extract_mesh(
        np.asarray(tsdf.values, np.float32),
        weights=weights,
        isolevel=0.0,
        weight_threshold=0.0,
        origin=np.asarray(tsdf.origin, np.float32),
        voxel_size=tsdf.voxel_size,
    )


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray,
             colors: Optional[np.ndarray] = None):
    """Write a binary little-endian PLY."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n, m = len(verts), len(faces)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [f"element face {m}",
                   "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec["xyz"] = verts.astype(np.float32)
            rec["rgb"] = colors.astype(np.uint8)
            f.write(rec.tobytes())
        else:
            f.write(verts.astype(np.float32).tobytes())
        rec = np.zeros(m, dtype=[("cnt", np.uint8), ("idx", np.int32, 3)])
        rec["cnt"] = 3
        rec["idx"] = faces.astype(np.int32)
        f.write(rec.tobytes())


def load_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal PLY reader (binary LE / ascii, xyz + faces)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n_verts = n_faces = 0
        vert_props = []
        binary = any("binary_little_endian" in h for h in header)
        section = None
        for h in header:
            if h.startswith("element vertex"):
                n_verts = int(h.split()[-1])
                section = "vertex"
            elif h.startswith("element face"):
                n_faces = int(h.split()[-1])
                section = "face"
            elif h.startswith("property") and section == "vertex":
                parts = h.split()
                vert_props.append((parts[-1], parts[1]))

        type_map = {"float": np.float32, "float32": np.float32,
                    "double": np.float64, "uchar": np.uint8,
                    "uint8": np.uint8, "int": np.int32, "uint": np.uint32,
                    "short": np.int16, "ushort": np.uint16}
        if binary:
            dt = np.dtype([(name, type_map[t]) for name, t in vert_props])
            vdata = np.frombuffer(f.read(dt.itemsize * n_verts), dtype=dt)
            verts = np.stack([vdata["x"], vdata["y"], vdata["z"]], -1).astype(np.float32)
            faces = np.zeros((n_faces, 3), np.int32)
            raw = f.read()
            off = 0
            for i in range(n_faces):
                cnt = raw[off]
                off += 1
                idx = np.frombuffer(raw[off: off + 4 * cnt], np.int32)
                faces[i] = idx[:3]
                off += 4 * cnt
        else:
            verts = np.zeros((n_verts, 3), np.float32)
            names = [p[0] for p in vert_props]
            for i in range(n_verts):
                vals = f.readline().split()
                verts[i] = [float(vals[names.index(a)]) for a in ("x", "y", "z")]
            faces = np.zeros((n_faces, 3), np.int32)
            for i in range(n_faces):
                vals = f.readline().split()
                faces[i] = [int(v) for v in vals[1:4]]
    return verts, faces


def export_mesh(tsdf, path: str):
    """TSDF -> single-walled PLY mesh on disk.

    When the volume carries fused colors (fuse_color), vertices get
    trilinearly sampled RGB — the reference's colored-mesh export
    (fusers_helper.py:195-211)."""
    verts, faces = tsdf_to_mesh(tsdf)
    colors = None
    if getattr(tsdf, "colors", None) is not None:
        vox = (verts - np.asarray(tsdf.origin)[None]) / tsdf.voxel_size
        vol = np.asarray(tsdf.colors, np.float32)
        dims = np.asarray(vol.shape[:3])
        vox = np.clip(vox, 0.0, dims[None] - 1.0 - 1e-4)
        v0 = np.floor(vox).astype(np.int64)
        f = vox - v0
        rgb = np.zeros((len(verts), 3), np.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[:, 0] if dx else 1 - f[:, 0])
                        * (f[:, 1] if dy else 1 - f[:, 1])
                        * (f[:, 2] if dz else 1 - f[:, 2])
                    )
                    idx = np.minimum(v0 + [dx, dy, dz], dims - 1)
                    rgb += w[:, None] * vol[idx[:, 0], idx[:, 1], idx[:, 2]]
        colors = np.clip(rgb * 255.0, 0, 255)
    save_ply(path, verts, faces, colors=colors)
    return verts, faces
