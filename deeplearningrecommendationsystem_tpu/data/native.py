"""ctypes binding for the native ml-100k parser (native/ml100k_parser.cc).

Auto-builds ``native/libml100k.so`` with make on first use if a toolchain is
available; every entry point degrades gracefully to the NumPy/pure-Python
parser in data/movielens.py when the library can't be built or loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libml100k.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I32 = ctypes.POINTER(ctypes.c_int32)
_F32 = ctypes.POINTER(ctypes.c_float)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_u_data.restype = ctypes.c_int32
        lib.parse_u_data.argtypes = [ctypes.c_char_p, _I32, _I32, _F32, ctypes.c_int32]
        lib.parse_u_user.restype = ctypes.c_int32
        lib.parse_u_user.argtypes = [
            ctypes.c_char_p, _I32, _F32, _I32, ctypes.c_char_p, ctypes.c_int32,
            _I32, ctypes.c_int32,
        ]
        lib.parse_u_item.restype = ctypes.c_int32
        lib.parse_u_item.argtypes = [ctypes.c_char_p, _I32, _F32, ctypes.c_int32]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def parse_u_data(path: str, cap: int = 120_000):
    """-> (users, items, ratings) 0-based, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    users = np.empty(cap, dtype=np.int32)
    items = np.empty(cap, dtype=np.int32)
    ratings = np.empty(cap, dtype=np.float32)
    n = lib.parse_u_data(
        path.encode(), _ptr(users, _I32), _ptr(items, _I32), _ptr(ratings, _F32), cap
    )
    if n < 0:
        return None
    return users[:n].copy(), items[:n].copy(), ratings[:n].copy()


def parse_u_user(
    path: str, cap: int = 2048
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[str]]]:
    """-> (ids, ages, gender_idx, occupation_idx, occupation_categories)."""
    lib = _load()
    if lib is None:
        return None
    ids = np.empty(cap, dtype=np.int32)
    ages = np.empty(cap, dtype=np.float32)
    gidx = np.empty(cap, dtype=np.int32)
    oidx = np.empty(cap, dtype=np.int32)
    blob = ctypes.create_string_buffer(4096)
    n = lib.parse_u_user(
        path.encode(), _ptr(ids, _I32), _ptr(ages, _F32), _ptr(gidx, _I32),
        blob, len(blob), _ptr(oidx, _I32), cap,
    )
    if n < 0:
        return None
    cats = blob.value.decode().split("\n")
    return ids[:n].copy(), ages[:n].copy(), gidx[:n].copy(), oidx[:n].copy(), cats


def parse_u_item(path: str, cap: int = 4096):
    """-> (ids, genres [n, 19]) or None."""
    lib = _load()
    if lib is None:
        return None
    ids = np.empty(cap, dtype=np.int32)
    genres = np.empty(cap * 19, dtype=np.float32)
    n = lib.parse_u_item(path.encode(), _ptr(ids, _I32), _ptr(genres, _F32), cap)
    if n < 0:
        return None
    return ids[:n].copy(), genres[: n * 19].reshape(n, 19).copy()
