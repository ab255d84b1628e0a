"""ctypes bindings for the native C++ runtime (native/vln_native.cc).

Provides the C++ sides of the envx layer: the all-pairs world compiler, the
MatterSim-surface graph simulator (parity oracle for the compiled array
environment), and the mmap'd feature bank for production feature IO.

The shared library is built on demand with the system g++ (pybind11 is not
available in this image; the C ABI + ctypes needs no extra deps).
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvln_native.so")
_lib: Optional[C.CDLL] = None


def ensure_built() -> str:
    src = os.path.join(_NATIVE_DIR, "vln_native.cc")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libvln_native.so"],
                       check=True, capture_output=True)
    return _LIB_PATH


def load() -> C.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = C.CDLL(ensure_built())
    lib.vln_world_create.restype = C.c_void_p
    lib.vln_world_create.argtypes = [C.c_int, C.POINTER(C.c_double), C.c_int,
                                     C.POINTER(C.c_int)]
    lib.vln_world_destroy.argtypes = [C.c_void_p]
    lib.vln_world_allpairs.argtypes = [C.c_void_p, C.POINTER(C.c_double),
                                       C.POINTER(C.c_int), C.POINTER(C.c_int)]
    lib.vln_world_degree.restype = C.c_int
    lib.vln_world_degree.argtypes = [C.c_void_p, C.c_int]
    lib.vln_sim_create.restype = C.c_void_p
    lib.vln_sim_create.argtypes = [C.c_void_p, C.c_int]
    lib.vln_sim_destroy.argtypes = [C.c_void_p]
    lib.vln_sim_new_episode.argtypes = [C.c_void_p, C.c_int, C.c_double,
                                        C.c_double]
    lib.vln_sim_make_action.argtypes = [C.c_void_p, C.c_int, C.c_double,
                                        C.c_double]
    lib.vln_sim_get_state.argtypes = [C.c_void_p, C.POINTER(C.c_int),
                                      C.POINTER(C.c_double),
                                      C.POINTER(C.c_double),
                                      C.POINTER(C.c_int)]
    lib.vln_sim_navigable.restype = C.c_int
    lib.vln_sim_navigable.argtypes = [C.c_void_p, C.c_int,
                                      C.POINTER(C.c_int),
                                      C.POINTER(C.c_double),
                                      C.POINTER(C.c_double)]
    lib.vln_sim_candidates.restype = C.c_int
    lib.vln_sim_candidates.argtypes = [C.c_void_p, C.c_int,
                                       C.POINTER(C.c_int),
                                       C.POINTER(C.c_int),
                                       C.POINTER(C.c_double),
                                       C.POINTER(C.c_double)]
    lib.vln_bank_open.restype = C.c_void_p
    lib.vln_bank_open.argtypes = [C.c_char_p, C.c_int64, C.c_int]
    lib.vln_bank_close.argtypes = [C.c_void_p]
    lib.vln_bank_gather.argtypes = [C.c_void_p, C.POINTER(C.c_int64), C.c_int,
                                    C.POINTER(C.c_float)]
    lib.vln_prefetch_create.restype = C.c_void_p
    lib.vln_prefetch_create.argtypes = [C.c_void_p, C.c_int]
    lib.vln_prefetch_submit.argtypes = [C.c_void_p, C.POINTER(C.c_int64),
                                        C.c_int]
    lib.vln_prefetch_wait.restype = C.c_int
    lib.vln_prefetch_wait.argtypes = [C.c_void_p, C.POINTER(C.c_float)]
    lib.vln_prefetch_destroy.argtypes = [C.c_void_p]
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(C.POINTER(ctype))


class NativeWorld:
    """C++ world: adjacency + all-pairs shortest paths."""

    def __init__(self, xyz: np.ndarray, edges: list[tuple[int, int]]):
        self._lib = load()
        self.n = len(xyz)
        xyz = np.ascontiguousarray(xyz, np.float64)
        earr = np.ascontiguousarray(
            np.asarray(edges, np.int32).reshape(-1, 2))
        self._h = self._lib.vln_world_create(
            self.n, _ptr(xyz, C.c_double), len(edges), _ptr(earr, C.c_int))

    def all_pairs(self):
        n = self.n
        dist = np.zeros((n, n), np.float64)
        nxt = np.zeros((n, n), np.int32)
        hops = np.zeros((n, n), np.int32)
        self._lib.vln_world_allpairs(self._h, _ptr(dist, C.c_double),
                                     _ptr(nxt, C.c_int), _ptr(hops, C.c_int))
        return dist, nxt, hops

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vln_world_destroy(self._h)
            self._h = None


class NativeSim:
    """MatterSim-surface graph simulator over a NativeWorld."""

    def __init__(self, world: NativeWorld, views: int = 36):
        self._lib = load()
        self.world = world
        self._h = self._lib.vln_sim_create(world._h, views)

    def new_episode(self, node: int, heading: float, elevation: float = 0.0):
        self._lib.vln_sim_new_episode(self._h, node, heading, elevation)

    def make_action(self, index: int, heading_delta: float,
                    elevation_delta: float):
        self._lib.vln_sim_make_action(self._h, index, heading_delta,
                                      elevation_delta)

    def get_state(self):
        node = C.c_int()
        heading = C.c_double()
        elevation = C.c_double()
        view = C.c_int()
        self._lib.vln_sim_get_state(self._h, C.byref(node), C.byref(heading),
                                    C.byref(elevation), C.byref(view))
        return dict(node=node.value, heading=heading.value,
                    elevation=elevation.value, view_index=view.value)

    def navigable(self, max_out: int = 32):
        nodes = np.zeros(max_out, np.int32)
        rh = np.zeros(max_out, np.float64)
        re = np.zeros(max_out, np.float64)
        n = self._lib.vln_sim_navigable(self._h, max_out,
                                        _ptr(nodes, C.c_int),
                                        _ptr(rh, C.c_double),
                                        _ptr(re, C.c_double))
        return nodes[:n], rh[:n], re[:n]

    def candidates(self, max_out: int = 32):
        nodes = np.zeros(max_out, np.int32)
        pids = np.zeros(max_out, np.int32)
        hs = np.zeros(max_out, np.float64)
        es = np.zeros(max_out, np.float64)
        n = self._lib.vln_sim_candidates(self._h, max_out,
                                         _ptr(nodes, C.c_int),
                                         _ptr(pids, C.c_int),
                                         _ptr(hs, C.c_double),
                                         _ptr(es, C.c_double))
        return nodes[:n], pids[:n], hs[:n], es[:n]

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vln_sim_destroy(self._h)
            self._h = None


class FeatureBank:
    """mmap'd float32 feature store with batched row gather."""

    def __init__(self, path: str, rows: int, row_floats: int):
        self._lib = load()
        self.rows = rows
        self.row_floats = row_floats
        self._h = self._lib.vln_bank_open(path.encode(), rows, row_floats)
        if not self._h:
            raise OSError(f"cannot open feature bank {path}")

    @staticmethod
    def write(path: str, array: np.ndarray) -> "FeatureBank":
        flat = np.ascontiguousarray(array, np.float32).reshape(
            array.shape[0], -1)
        flat.tofile(path)
        return FeatureBank(path, flat.shape[0], flat.shape[1])

    def gather(self, row_ids: np.ndarray) -> np.ndarray:
        row_ids = np.ascontiguousarray(row_ids, np.int64)
        out = np.zeros((len(row_ids), self.row_floats), np.float32)
        self._lib.vln_bank_gather(self._h, _ptr(row_ids, C.c_int64),
                                  len(row_ids), _ptr(out, C.c_float))
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vln_bank_close(self._h)
            self._h = None


class BankPrefetcher:
    """Async double-buffered batch gather over a FeatureBank: a C++ worker
    thread fills the next batch while the caller consumes the current one
    (host half of the reference's PrefetchLoader overlap,
    pretrain_src/data/loader.py:90-124).

        pf.submit(rows0)
        while ...:
            batch = pf.wait()        # rows gathered in the background
            pf.submit(next_rows)     # overlaps with consuming `batch`
            consume(batch)
    """

    def __init__(self, bank: FeatureBank, capacity: int):
        self._lib = load()
        self._bank = bank  # keep alive
        self.capacity = capacity
        self.row_floats = bank.row_floats
        self._h = self._lib.vln_prefetch_create(bank._h, capacity)

    def submit(self, row_ids: np.ndarray):
        row_ids = np.ascontiguousarray(row_ids, np.int64)
        assert len(row_ids) <= self.capacity
        self._lib.vln_prefetch_submit(self._h, _ptr(row_ids, C.c_int64),
                                      len(row_ids))

    def wait(self) -> np.ndarray:
        out = np.zeros((self.capacity, self.row_floats), np.float32)
        n = self._lib.vln_prefetch_wait(self._h, _ptr(out, C.c_float))
        if n < 0:
            raise RuntimeError("wait() without a submitted batch")
        return out[:n]

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vln_prefetch_destroy(self._h)
            self._h = None
