"""ctypes bindings for the C++ native library (csrc/mtp_native.cpp).

Builds on first use with `make -C csrc`; every entry point has a NumPy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmtp_native.so")
_lib = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _CSRC, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mtp_cell_list.restype = ctypes.c_int
        lib.mtp_cell_list.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mtp_format_cfg_atoms.restype = ctypes.c_int64
        lib.mtp_format_cfg_atoms.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def cell_list_host(positions, cell, cutoff, max_neighbors):
    """Host-side padded neighbor list. Native if available, NumPy otherwise.

    Returns (idx (n, max_neighbors) int32 self-padded, counts (n,), overflow).
    """
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    n = len(positions)
    lib = load()
    if lib is not None:
        idx = np.empty((n, max_neighbors), dtype=np.int32)
        counts = np.empty(n, dtype=np.int32)
        rc = lib.mtp_cell_list(
            _dptr(positions),
            n,
            _dptr(cell),
            float(cutoff),
            int(max_neighbors),
            _iptr(idx),
            _iptr(counts),
        )
        if rc < 0:
            raise ValueError("invalid cell matrix")
        return idx, counts, bool(rc)

    # NumPy fallback: O(N^2) minimum image
    inv = np.linalg.inv(cell)
    f = positions @ inv
    df = f[None, :, :] - f[:, None, :]
    df -= np.round(df)
    disp = df @ cell
    d2 = np.einsum("ija,ija->ij", disp, disp)
    np.fill_diagonal(d2, np.inf)
    keep = d2 <= cutoff * cutoff
    counts = keep.sum(axis=1).astype(np.int32)
    overflow = bool((counts > max_neighbors).any())
    idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, max_neighbors))
    for i in range(n):
        js = np.nonzero(keep[i])[0][:max_neighbors]
        idx[i, : len(js)] = js
    return idx, counts, overflow


def format_cfg_atoms(positions, types, grades=None, id_offset=0) -> str:
    """AtomData rows for a .cfg block (native fast path for large systems)."""
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    types = np.ascontiguousarray(types, dtype=np.int32)
    n = len(positions)
    lib = load()
    if lib is not None:
        g = (
            np.ascontiguousarray(grades, dtype=np.float64)
            if grades is not None
            else None
        )
        cap = 96 * n + 1024
        buf = ctypes.create_string_buffer(cap)
        w = lib.mtp_format_cfg_atoms(
            _dptr(positions),
            _iptr(types),
            _dptr(g) if g is not None else None,
            n,
            int(id_offset),
            buf,
            cap,
        )
        if w < 0:
            cap = -w + 1024
            buf = ctypes.create_string_buffer(cap)
            w = lib.mtp_format_cfg_atoms(
                _dptr(positions),
                _iptr(types),
                _dptr(g) if g is not None else None,
                n,
                int(id_offset),
                buf,
                cap,
            )
        return buf.raw[:w].decode()

    rows = []
    for i in range(n):
        row = f"{i + 1 + id_offset}\t{int(types[i])}\t{positions[i, 0]:.6f}\t{positions[i, 1]:.6f}\t{positions[i, 2]:.6f}"
        if grades is not None:
            row += f"\t{float(grades[i]):.5f}"
        rows.append(row)
    return "\n".join(rows) + ("\n" if rows else "")
