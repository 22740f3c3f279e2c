"""ctypes bindings for the native host graph engine (csrc/gs_native.cpp).

Zero-copy: numpy arrays pass straight through as int32/float32/uint8
pointers.  Every entry point degrades gracefully — callers check
``available()`` or use the high-level wrappers in sampler/ which fall back
to the numpy implementations when the shared object is missing.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    from graphsage_tpu.native.build import ensure_built
    path = ensure_built(quiet=True)
    if path is None or not os.path.exists(path):
        _LIB = False
        return _LIB
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return _LIB

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.gs_build_compact_batch.restype = ctypes.c_int
    lib.gs_build_compact_batch.argtypes = [
        i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, i32p,
        i32p, i32p, i32p, f32p, i32p,
    ]
    lib.gs_bfs_closure.restype = ctypes.c_int
    lib.gs_bfs_closure.argtypes = [
        i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u8p, i32p,
    ]
    lib.gs_sample_fanout.restype = ctypes.c_int
    lib.gs_sample_fanout.argtypes = [
        i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64, i32p, i32p,
    ]
    try:
        lib.gs_far_lists.restype = ctypes.c_int
        lib.gs_far_lists.argtypes = [
            i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int32,
            ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p,
        ]
        lib.gs_uniform_negatives.restype = ctypes.c_int
        lib.gs_uniform_negatives.argtypes = [
            i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int32, i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, i32p, u8p,
        ]
    except AttributeError:  # stale .so predating the batched samplers
        pass
    _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_compact_batch_native(indptr: np.ndarray, indices: np.ndarray,
                               num_nodes: int, batch: np.ndarray,
                               num_layers: int, fanout: int, gcn: bool,
                               seed: int, u_caps: np.ndarray):
    """Returns (union_sizes, x0_ids [cap_L], list of (idx, mask, self_idx)
    bottom-up at cap sizes) or None when the native lib is unavailable.
    Raises RuntimeError on cap overflow."""
    lib = _load()
    if not lib:
        return None
    slots = fanout + 1
    batch = np.ascontiguousarray(batch, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    u_caps = np.ascontiguousarray(u_caps, dtype=np.int32)

    union_sizes = np.zeros(num_layers + 1, dtype=np.int32)
    x0_ids = np.zeros(int(u_caps[num_layers]), dtype=np.int32)
    # bottom-up layer j has rows u_caps[num_layers-1-j]
    row_caps = [int(u_caps[num_layers - 1 - j]) for j in range(num_layers)]
    total_rows = sum(row_caps)
    idx_buf = np.zeros(total_rows * slots, dtype=np.int32)
    mask_buf = np.zeros(total_rows * slots, dtype=np.float32)
    self_buf = np.zeros(total_rows, dtype=np.int32)

    rc = lib.gs_build_compact_batch(
        _p(indptr, ctypes.c_int32), _p(indices, ctypes.c_int32),
        np.int32(num_nodes), _p(batch, ctypes.c_int32),
        np.int32(len(batch)), np.int32(num_layers), np.int32(fanout),
        np.int32(1 if gcn else 0), ctypes.c_uint64(seed & (2**64 - 1)),
        _p(u_caps, ctypes.c_int32), _p(union_sizes, ctypes.c_int32),
        _p(x0_ids, ctypes.c_int32), _p(idx_buf, ctypes.c_int32),
        _p(mask_buf, ctypes.c_float), _p(self_buf, ctypes.c_int32))
    if rc != 0:
        raise RuntimeError(f"gs_build_compact_batch cap overflow level "
                           f"{-rc - 1}: sizes={union_sizes} caps={u_caps}")

    layers = []
    io = so = 0
    for j in range(num_layers):
        rc_rows = row_caps[j]
        idx = idx_buf[io:io + rc_rows * slots].reshape(rc_rows, slots)
        mask = mask_buf[io:io + rc_rows * slots].reshape(rc_rows, slots)
        self_idx = self_buf[so:so + rc_rows]
        layers.append((idx, mask, self_idx))
        io += rc_rows * slots
        so += rc_rows
    return union_sizes, x0_ids, layers


def bfs_closure_native(indptr: np.ndarray, indices: np.ndarray,
                       num_nodes: int, root: int, max_hops: int):
    """Bit-packed ≤max_hops closure (packbits-compatible) or None."""
    lib = _load()
    if not lib:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    bits = np.zeros((num_nodes + 7) // 8, dtype=np.uint8)
    work = np.zeros(num_nodes, dtype=np.int32)
    lib.gs_bfs_closure(_p(indptr, ctypes.c_int32),
                       _p(indices, ctypes.c_int32), np.int32(num_nodes),
                       np.int32(root), np.int32(max_hops),
                       _p(bits, ctypes.c_uint8), _p(work, ctypes.c_int32))
    return bits


def far_lists_native(indptr: np.ndarray, indices: np.ndarray,
                     num_nodes: int, roots: np.ndarray, max_hops: int,
                     train: np.ndarray, n_threads: int | None = None,
                     chunk_bytes: int = 64 << 20):
    """Batched exact-negative far lists: for each root, the train nodes
    outside its ≤max_hops BFS closure (reference src/models.py:153-167
    semantics), computed on a C++ thread pool.  Returns a list of int32
    arrays (one per root, each a fresh copy safe to cache) or None when
    the native lib is unavailable.  Roots are chunked so the [chunk,
    n_train] scratch stays under ``chunk_bytes``."""
    lib = _load()
    if not lib or not hasattr(lib, "gs_far_lists"):
        return None
    if n_threads is None:
        n_threads = max(1, os.cpu_count() or 1)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    roots = np.ascontiguousarray(roots, dtype=np.int32)
    train = np.ascontiguousarray(train, dtype=np.int32)
    n_train = len(train)
    chunk = max(1, int(chunk_bytes // max(1, n_train * 4)))
    out: list[np.ndarray] = []
    for lo in range(0, len(roots), chunk):
        part = roots[lo:lo + chunk]
        far_buf = np.empty((len(part), n_train), dtype=np.int32)
        counts = np.zeros(len(part), dtype=np.int32)
        lib.gs_far_lists(
            _p(indptr, ctypes.c_int32), _p(indices, ctypes.c_int32),
            np.int32(num_nodes), _p(part, ctypes.c_int32),
            np.int32(len(part)), np.int32(max_hops),
            _p(train, ctypes.c_int32), np.int32(n_train),
            np.int32(n_threads), _p(far_buf, ctypes.c_int32),
            _p(counts, ctypes.c_int32))
        out.extend(far_buf[i, :counts[i]].copy()
                   for i in range(len(part)))
    return out


def uniform_negatives_native(indptr: np.ndarray, indices: np.ndarray,
                             num_nodes: int, train: np.ndarray,
                             nodes: np.ndarray, num_neg: int, seed: int):
    """Batched uniform negatives (train∖{node, 1-hop}, w/o replacement):
    (neg [n, num_neg] int32, valid [n, num_neg] bool) or None."""
    lib = _load()
    if not lib or not hasattr(lib, "gs_uniform_negatives"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    train = np.ascontiguousarray(train, dtype=np.int32)
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    out = np.zeros((len(nodes), num_neg), dtype=np.int32)
    valid = np.zeros((len(nodes), num_neg), dtype=np.uint8)
    lib.gs_uniform_negatives(
        _p(indptr, ctypes.c_int32), _p(indices, ctypes.c_int32),
        np.int32(num_nodes), _p(train, ctypes.c_int32),
        np.int32(len(train)), _p(nodes, ctypes.c_int32),
        np.int32(len(nodes)), np.int32(num_neg),
        ctypes.c_uint64(seed & (2**64 - 1)), _p(out, ctypes.c_int32),
        _p(valid, ctypes.c_uint8))
    return out, valid.astype(bool)


def sample_fanout_native(indptr: np.ndarray, indices: np.ndarray,
                         num_nodes: int, nodes: np.ndarray, fanout: int,
                         seed: int):
    """(samples [n, fanout], counts [n]) or None."""
    lib = _load()
    if not lib:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    out = np.zeros((len(nodes), fanout), dtype=np.int32)
    counts = np.zeros(len(nodes), dtype=np.int32)
    lib.gs_sample_fanout(_p(indptr, ctypes.c_int32),
                         _p(indices, ctypes.c_int32), np.int32(num_nodes),
                         _p(nodes, ctypes.c_int32), np.int32(len(nodes)),
                         np.int32(fanout),
                         ctypes.c_uint64(seed & (2**64 - 1)),
                         _p(out, ctypes.c_int32),
                         _p(counts, ctypes.c_int32))
    return out, counts
