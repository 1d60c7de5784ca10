"""ctypes binding to the native sparse LDL' backend (native/sparse_ldl.cpp)
— the framework's LADEL equivalence class (reference:
src/solver_interface.c:319-405).

`SparseLDL` analyzes a (scipy CSC, upper-triangular) pattern once, then
supports repeated numeric refactorizations with new values and a diagonal
shift — exactly the access pattern of the P-ALM Newton loop where the
pattern (all-constraints-active superset) is fixed but values change with
the active set / penalties / gamma.  Fill-reducing ordering: reverse
Cuthill-McKee (scipy) applied symmetrically before analysis.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
import scipy.sparse as sp

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqpalm_ldl.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False

_IP = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_DP = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ldl_symbolic.restype = ctypes.c_void_p
    lib.ldl_symbolic.argtypes = [ctypes.c_int, _IP, _IP]
    lib.ldl_numeric.restype = ctypes.c_int
    lib.ldl_numeric.argtypes = [ctypes.c_void_p, _IP, _IP, _DP,
                                ctypes.c_double]
    lib.ldl_solve.restype = None
    lib.ldl_solve.argtypes = [ctypes.c_void_p, _DP]
    lib.ldl_lnz.restype = ctypes.c_long
    lib.ldl_lnz.argtypes = [ctypes.c_void_p]
    lib.ldl_free.restype = None
    lib.ldl_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class SparseLDL:
    """Factorization handle over a fixed upper-triangular CSC pattern.

    Parameters
    ----------
    pattern : scipy.sparse matrix (square, symmetric); only the structure
        matters here.  `ordering='rcm'` permutes symmetrically with reverse
        Cuthill-McKee to bound fill on banded problems.
    """

    def __init__(self, pattern, ordering: str = "rcm"):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native LDL library unavailable")
        self._lib = lib
        M = sp.csc_matrix(pattern)
        n = M.shape[0]
        if ordering == "rcm":
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            perm = np.asarray(reverse_cuthill_mckee(M, symmetric_mode=True))
        else:
            perm = np.arange(n)
        self.perm = perm
        self.iperm = np.argsort(perm)
        Mp = M[perm][:, perm]
        U = sp.triu(Mp, format="csc")
        U.sort_indices()
        self._Up = np.ascontiguousarray(U.indptr, np.int32)
        self._Ui = np.ascontiguousarray(U.indices, np.int32)
        # column-major (col, row) keys of the analyzed pattern, globally
        # sorted — lets `factor` scatter a sub-pattern's values with one
        # searchsorted (scipy's sparse addition silently drops zero-valued
        # entries, so a zero-pattern union cannot be used for alignment)
        cols = np.repeat(np.arange(n, dtype=np.int64),
                         np.diff(self._Up))
        self._keys = cols * np.int64(n) + self._Ui.astype(np.int64)
        self.n = n
        self._h = lib.ldl_symbolic(n, self._Up, self._Ui)
        if not self._h:
            raise RuntimeError("LDL symbolic analysis failed")

    @property
    def lnz(self) -> int:
        return int(self._lib.ldl_lnz(self._h))

    def factor(self, M, shift: float = 0.0) -> None:
        """Numeric (re)factorization of M (+ shift*I).  M must have a
        sparsity pattern contained in the analyzed one."""
        Mp = sp.csc_matrix(M)[self.perm][:, self.perm]
        U = sp.triu(Mp, format="csc")
        U.sort_indices()
        if (U.indptr.shape == self._Up.shape
                and np.array_equal(U.indptr, self._Up)
                and np.array_equal(U.indices, self._Ui)):
            vals = np.ascontiguousarray(U.data, np.float64)
        else:
            # value scatter into the superset pattern via sorted keys
            cols = np.repeat(np.arange(self.n, dtype=np.int64),
                             np.diff(U.indptr))
            sub_keys = cols * np.int64(self.n) + U.indices.astype(np.int64)
            pos = np.searchsorted(self._keys, sub_keys)
            if (pos >= len(self._keys)).any() or not np.array_equal(
                    self._keys[np.minimum(pos, len(self._keys) - 1)],
                    sub_keys):
                raise ValueError("pattern not contained in analyzed pattern")
            vals = np.zeros(len(self._keys), np.float64)
            vals[pos] = U.data
        status = self._lib.ldl_numeric(
            self._h, self._Up, self._Ui, vals, float(shift)
        )
        if status != 0:
            raise np.linalg.LinAlgError(
                f"LDL numeric breakdown at column {status - 1}"
            )

    def solve(self, b) -> np.ndarray:
        x = np.ascontiguousarray(np.asarray(b, np.float64)[self.perm])
        self._lib.ldl_solve(self._h, x)
        return x[self.iperm]

    def __del__(self):
        if getattr(self, "_h", None) and getattr(self, "_lib", None):
            self._lib.ldl_free(self._h)
            self._h = None
