"""ctypes bindings for the native JPEG batch loader (native/jpeg_loader.cpp).

The shared library is compiled on first use (g++ -O3, links libjpeg) and
cached next to the source. All consumers must handle unavailability (no
compiler / no libjpeg) by falling back to cv2 — see BEVPairDataset.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "jpeg_loader.cpp"
_LIB = _REPO_ROOT / "native" / "libjpeg_loader.so"

_lib_handle: Optional[ctypes.CDLL] = None
_build_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", str(_SRC),
        "-ljpeg", "-lpthread", "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        logger.warning("native loader build failed: %s", e)
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    if _lib_handle is not None:
        return _lib_handle
    if _build_failed:
        return None
    with _build_lock:
        if _lib_handle is not None:
            return _lib_handle
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            logger.warning("native loader load failed: %s", e)
            _build_failed = True
            return None
        lib.decode_resize_batch.restype = ctypes.c_int
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        _lib_handle = lib
        return lib


def native_loader_available() -> bool:
    return _get_lib() is not None


def decode_resize_batch(
    paths: List[str], out_h: int, out_w: int, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + resize a batch of JPEGs with the native thread pool.

    Returns (imgs (N, out_h, out_w, 3) float32 in [0,255], ok (N,) bool).
    Raises RuntimeError if the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native jpeg loader unavailable")

    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), dtype=np.float32)
    ok = np.zeros(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.decode_resize_batch(
        c_paths,
        n,
        out_h,
        out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads,
    )
    return out, ok.astype(bool)
