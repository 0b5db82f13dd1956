"""ctypes bridge to the native (C++/GMP) proving-key parser.

Parses the reference's decimal pk text (85-253 MB; ~minutes in pure Python,
seconds natively) straight into the limb tensors DevicePK wants. Falls back
silently when the shared library hasn't been built — callers check
`available()`.

Build: blockmaze_tpu/native/build.sh (links the system libgmp.so.10 via the
shim header; no -dev packages needed).
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "native", "libbmtpu_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = C.CDLL(_LIB_PATH)
    lib.bmtpu_parse_pk.restype = C.c_void_p
    lib.bmtpu_parse_pk.argtypes = [C.c_char_p, C.POINTER(C.c_long)]
    lib.bmtpu_fill_pk.restype = None
    lib.bmtpu_free_pk.restype = None
    lib.bmtpu_free_pk.argtypes = [C.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u32p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint32))


def _i32p(a):
    return a.ctypes.data_as(C.POINTER(C.c_int32))


def _u8p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint8))


def parse_pk_native(path: str):
    """Returns the same structure keys.build_device_pk produces, or None if
    the native library is unavailable or parsing fails."""
    lib = _load()
    if lib is None:
        return None
    meta = (C.c_long * 12)()
    handle = lib.bmtpu_parse_pk(path.encode(), meta)
    if not handle or meta[0] != 1:
        return None
    try:
        (_, primary, aux, ncons, nA, nB, nH, nL,
         nnzA, nnzB, nnzC, b_domain) = list(meta)

        def g1_arrs(n):
            return (np.empty((n, 16), np.uint32), np.empty((n, 16), np.uint32),
                    np.empty(n, np.uint8))

        A = g1_arrs(nA)
        B1 = g1_arrs(nB)
        H = g1_arrs(nH)
        L = g1_arrs(nL)
        B2 = (np.empty((nB, 2, 16), np.uint32),
              np.empty((nB, 2, 16), np.uint32), np.empty(nB, np.uint8))
        B_idx = np.empty(nB, np.int32)

        def coo_arrs(n):
            return (np.empty(n, np.int32), np.empty(n, np.int32),
                    np.empty((n, 16), np.uint32))

        a_coo, b_coo, c_coo = coo_arrs(nnzA), coo_arrs(nnzB), coo_arrs(nnzC)
        consts = np.empty(32 * 14, np.uint8)
        const_inf = np.empty(5, np.uint8)

        lib.bmtpu_fill_pk(
            C.c_void_p(handle),
            _u32p(A[0]), _u32p(A[1]), _u8p(A[2]),
            _i32p(B_idx),
            _u32p(B2[0]), _u32p(B2[1]), _u8p(B2[2]),
            _u32p(B1[0]), _u32p(B1[1]), _u8p(B1[2]),
            _u32p(H[0]), _u32p(H[1]), _u8p(H[2]),
            _u32p(L[0]), _u32p(L[1]), _u8p(L[2]),
            _i32p(a_coo[0]), _i32p(a_coo[1]), _u32p(a_coo[2]),
            _i32p(b_coo[0]), _i32p(b_coo[1]), _u32p(b_coo[2]),
            _i32p(c_coo[0]), _i32p(c_coo[1]), _u32p(c_coo[2]),
            _u8p(consts), _u8p(const_inf))
    finally:
        lib.bmtpu_free_pk(C.c_void_p(handle))

    def const_g1(off, inf):
        b = consts[off:off + 64].tobytes()
        return (int.from_bytes(b[:32], "little"),
                int.from_bytes(b[32:], "little"), int(inf))

    def const_g2(off, inf):
        b = consts[off:off + 128].tobytes()
        return ((int.from_bytes(b[:32], "little"),
                 int.from_bytes(b[32:64], "little")),
                (int.from_bytes(b[64:96], "little"),
                 int.from_bytes(b[96:], "little")), int(inf))

    return {
        "primary_input_size": primary,
        "aux_input_size": aux,
        "num_constraints": ncons,
        "alpha_g1": const_g1(0, const_inf[0]),
        "beta_g1": const_g1(64, const_inf[1]),
        "beta_g2": const_g2(128, const_inf[2]),
        "delta_g1": const_g1(256, const_inf[3]),
        "delta_g2": const_g2(320, const_inf[4]),
        "A": (A[0], A[1], A[2].astype(bool)),
        "B_idx": B_idx,
        "B2": (B2[0], B2[1], B2[2].astype(bool)),
        "B1": (B1[0], B1[1], B1[2].astype(bool)),
        "H": (H[0], H[1], H[2].astype(bool)),
        "L": (L[0], L[1], L[2].astype(bool)),
        "a_coo": a_coo, "b_coo": b_coo, "c_coo": c_coo,
    }
