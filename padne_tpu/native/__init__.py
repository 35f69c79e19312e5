"""ctypes loader for the native geometry/meshing core.

The shared library is built on demand from the C++ sources in ``src/``
(g++ only; no external dependencies).  A content hash of the sources is
embedded in the library filename so stale builds are detected and rebuilt
automatically.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess
import sys

_SRC_DIR = pathlib.Path(__file__).parent / "src"
_BUILD_DIR = pathlib.Path(__file__).parent / "build"

_SOURCES = ["pg_core.h", "pg_cdt.h", "pg_overlay.h", "pg_refine.h", "pg_api.cpp"]


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        h.update((_SRC_DIR / name).read_bytes())
    return h.hexdigest()[:16]


def _build(lib_path: pathlib.Path) -> None:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++",
        "-std=c++20",
        "-O2",
        "-fPIC",
        "-shared",
        "-o",
        str(lib_path),
        str(_SRC_DIR / "pg_api.cpp"),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"Failed to build native geometry library:\n{proc.stderr}"
        )


def _load() -> ctypes.CDLL:
    suffix = "dylib" if sys.platform == "darwin" else "so"
    lib_path = _BUILD_DIR / f"libpadne_geom_{_source_hash()}.{suffix}"
    if not lib_path.exists():
        # Clean out stale builds.
        if _BUILD_DIR.exists():
            for old in _BUILD_DIR.glob(f"libpadne_geom_*.{suffix}"):
                try:
                    old.unlink()
                except OSError:
                    pass
        _build(lib_path)
    return ctypes.CDLL(str(lib_path))


_lib = _load()

# --- signatures -----------------------------------------------------------
_c_double_p = ctypes.POINTER(ctypes.c_double)
_c_int32_p = ctypes.POINTER(ctypes.c_int32)
_c_int8_p = ctypes.POINTER(ctypes.c_int8)

_lib.pg_boolean.restype = ctypes.c_int
_lib.pg_boolean.argtypes = [
    ctypes.c_int,
    _c_double_p, _c_int32_p, ctypes.c_int32,
    _c_double_p, _c_int32_p, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p, ctypes.c_int,
]
_lib.pg_polyset_npolys.restype = ctypes.c_int32
_lib.pg_polyset_npolys.argtypes = [ctypes.c_void_p]
_lib.pg_polyset_nrings.restype = ctypes.c_int32
_lib.pg_polyset_nrings.argtypes = [ctypes.c_void_p, ctypes.c_int32]
_lib.pg_polyset_ring_size.restype = ctypes.c_int32
_lib.pg_polyset_ring_size.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
_lib.pg_polyset_ring_coords.restype = None
_lib.pg_polyset_ring_coords.argtypes = [
    ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, _c_double_p]
_lib.pg_polyset_free.restype = None
_lib.pg_polyset_free.argtypes = [ctypes.c_void_p]

_lib.pg_classify_points.restype = ctypes.c_int
_lib.pg_classify_points.argtypes = [
    _c_double_p, _c_int32_p, ctypes.c_int32,
    _c_double_p, ctypes.c_int32, _c_int8_p, ctypes.c_char_p, ctypes.c_int,
]
_lib.pg_distance_to_boundary.restype = ctypes.c_int
_lib.pg_distance_to_boundary.argtypes = [
    _c_double_p, _c_int32_p, ctypes.c_int32,
    _c_double_p, ctypes.c_int32, _c_double_p, ctypes.c_char_p, ctypes.c_int,
]

_lib.pg_distmap_build.restype = ctypes.c_int
_lib.pg_distmap_build.argtypes = [
    _c_double_p, _c_int32_p, ctypes.c_int32, ctypes.c_double,
    ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p, ctypes.c_int,
]
_lib.pg_distmap_query.restype = None
_lib.pg_distmap_query.argtypes = [
    ctypes.c_void_p, _c_double_p, ctypes.c_int32, _c_double_p]
_lib.pg_distmap_info.restype = None
_lib.pg_distmap_info.argtypes = [ctypes.c_void_p, _c_double_p]
_lib.pg_distmap_free.restype = None
_lib.pg_distmap_free.argtypes = [ctypes.c_void_p]

_lib.pg_triangulate.restype = ctypes.c_int
_lib.pg_triangulate.argtypes = [
    _c_double_p, _c_int32_p, ctypes.c_int32,
    _c_double_p, ctypes.c_int32,
    ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p, ctypes.c_int,
]
_lib.pg_mesh_nverts.restype = ctypes.c_int32
_lib.pg_mesh_nverts.argtypes = [ctypes.c_void_p]
_lib.pg_mesh_ntris.restype = ctypes.c_int32
_lib.pg_mesh_ntris.argtypes = [ctypes.c_void_p]
_lib.pg_mesh_coords.restype = None
_lib.pg_mesh_coords.argtypes = [ctypes.c_void_p, _c_double_p]
_lib.pg_mesh_tris.restype = None
_lib.pg_mesh_tris.argtypes = [ctypes.c_void_p, _c_int32_p]
_lib.pg_mesh_free.restype = None
_lib.pg_mesh_free.argtypes = [ctypes.c_void_p]

_lib.pg_greedy_aggregate.restype = ctypes.c_int32
_lib.pg_greedy_aggregate.argtypes = [_c_int32_p, _c_int32_p, ctypes.c_int32, _c_int32_p]

_lib.pg_greedy_aggregate_capped.restype = ctypes.c_int32
_lib.pg_greedy_aggregate_capped.argtypes = [
    _c_int32_p, _c_int32_p, ctypes.c_int32, ctypes.c_int32, _c_int32_p]

lib = _lib
