"""ctypes binding for the native batch gather (native/owl_loader.cpp).

Builds the shared library on demand with g++ (cached in native/); falls
back to a pure-numpy implementation when no toolchain is available, so
all call sites can use ``gather_windows`` unconditionally.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libowl_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "owl_loader.cpp")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH) or (
                    os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC_PATH, "-o", _SO_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.owl_gather_windows.restype = ctypes.c_int
            lib.owl_gather_windows.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.c_int, ctypes.c_longlong,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.owl_drop_fd_cache.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def npy_data_offset(path: str):
    """(data_byte_offset, dtype, shape) of an .npy file without reading
    the payload."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        return f.tell(), dtype, shape


def gather_windows(paths: List[str], row_starts: List[int],
                   window: int, row_bytes: int, header_offsets: List[int],
                   dtype, trailing_shape, n_threads: int = 4) -> np.ndarray:
    """Assemble a batch of [window, *trailing_shape] row-slices, one per
    item, reading window*row_bytes from each file at its computed offset.
    """
    n = len(paths)
    bytes_per_item = window * row_bytes
    out = np.empty(n * bytes_per_item, dtype=np.uint8)

    lib = _load_library()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        offs = (ctypes.c_longlong * n)(
            *[header_offsets[i] + row_starts[i] * row_bytes
              for i in range(n)])
        rc = lib.owl_gather_windows(
            c_paths, offs, n, bytes_per_item,
            out.ctypes.data_as(ctypes.c_char_p), n_threads)
        if rc != 0:
            raise IOError(f"native gather failed on item {-rc - 1}: "
                          f"{paths[-rc - 1]}")
    else:
        for i, p in enumerate(paths):
            with open(p, "rb") as f:
                f.seek(header_offsets[i] + row_starts[i] * row_bytes)
                buf = f.read(bytes_per_item)
            out[i * bytes_per_item:(i + 1) * bytes_per_item] = \
                np.frombuffer(buf, dtype=np.uint8)

    batch = out.view(dtype).reshape((n, window) + tuple(trailing_shape))
    return batch
