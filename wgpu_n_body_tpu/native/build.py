"""ctypes loader for the C++ octree builder (native/octree.cpp).

Compiles on first use with g++ -O3 -fopenmp into a per-version cache dir
and loads via ctypes (no pybind11 in this environment). If no compiler is
available the native path reports unavailable and callers fall back to the
pure-device implementation.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import NamedTuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "octree.cpp")
_LIB = None
_LIB_ERR: str | None = None

# Octant struct: [cog3 f32, mass f32, bodies u32, children8 u32] = 13 words
OCTANT_WORDS = 13


def _compile_and_load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(
            os.path.expanduser("~/.cache/wgpu_n_body_tpu"), "native"
        )
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"octree_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".build{os.getpid()}"
            subprocess.run(
                [
                    "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                    "-fopenmp", _SRC, "-o", tmp,
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.nbody_build_tree.restype = ctypes.c_int64
        lib.nbody_build_tree.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.nbody_dfs_order.restype = ctypes.c_int64
        lib.nbody_dfs_order.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.nbody_to_dfs_arena.restype = ctypes.c_int64
        lib.nbody_to_dfs_arena.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception as ex:  # missing compiler, sandbox, ...
        _LIB_ERR = f"{type(ex).__name__}: {ex}"


def native_available() -> bool:
    _compile_and_load()
    return _LIB is not None


class HostOctree(NamedTuple):
    """Host-built octree in both layouts.

    octants:    (m, 13) u32/f32 words — the reference Octant layout
                (cog f32x3, mass f32, bodies u32, children u32x8)
    order:      (n,) int64 — DFS particle permutation (sorted <- original)
    root_width: float
    nodes_f32:  (m+1, 8) f32 DFS arena (ops/tree_build.py layout)
    skip:       (m+1,) int32
    first:      (m+1,) int32 — SORTED index of each node's first particle
    count:      (m+1,) int32 — particles per subtree
    """

    octants: np.ndarray
    order: np.ndarray
    root_width: float
    nodes_f32: np.ndarray
    skip: np.ndarray
    first: np.ndarray
    count: np.ndarray

    @property
    def num_nodes(self) -> int:
        return self.octants.shape[0]

    def cog(self):
        return np.ascontiguousarray(self.octants[:, 0:3]).view(np.float32)

    def mass(self):
        return np.ascontiguousarray(self.octants[:, 3]).view(np.float32)

    def bodies(self):
        return self.octants[:, 4]

    def children(self):
        return self.octants[:, 5:13]


def build_host_tree(
    pos: np.ndarray, mass: np.ndarray, cap_factor: float = 4.0
) -> HostOctree:
    """Build the octree on the host CPU (reference tree.rs semantics)."""
    _compile_and_load()
    if _LIB is None:
        raise RuntimeError(f"native octree unavailable: {_LIB_ERR}")
    pos = np.ascontiguousarray(pos, np.float32)
    mass = np.ascontiguousarray(mass, np.float32)
    n = pos.shape[0]
    cap = int(cap_factor * max(n, 2)) + 1
    octants = np.zeros((cap, OCTANT_WORDS), np.uint32)
    root_width = np.zeros((1,), np.float32)
    m = _LIB.nbody_build_tree(
        pos.ctypes.data, mass.ctypes.data, n,
        octants.ctypes.data, cap, root_width.ctypes.data,
    )
    if m == -1:
        raise RuntimeError(f"octree arena overflow (cap {cap})")
    if m == -2:
        raise RuntimeError(
            "exactly-coincident particle cluster beyond depth 64 "
            "(the reference implementation would not terminate here)"
        )
    octants = octants[:m]
    order = np.zeros((n,), np.int64)
    cnt = _LIB.nbody_dfs_order(octants.ctypes.data, m, n, order.ctypes.data)
    if cnt != n:
        raise RuntimeError(f"DFS order emitted {cnt} of {n} particles")
    nodes_f32 = np.zeros((m + 1, 8), np.float32)
    skip = np.zeros((m + 1,), np.int32)
    first = np.zeros((m + 1,), np.int32)
    count = np.zeros((m + 1,), np.int32)
    dfs_n = _LIB.nbody_to_dfs_arena(
        octants.ctypes.data, m, n, order.ctypes.data,
        ctypes.c_float(float(root_width[0])),
        nodes_f32.ctypes.data, skip.ctypes.data, first.ctypes.data,
        count.ctypes.data,
    )
    if dfs_n < 0:
        raise RuntimeError("DFS arena overflow")
    return HostOctree(
        octants=octants,
        order=order,
        root_width=float(root_width[0]),
        nodes_f32=nodes_f32,
        skip=skip,
        first=first,
        count=count,
    )
