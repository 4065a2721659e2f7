"""ctypes binding for the native PNG decode engine (native/png_loader.cpp).

The startup decode pass (data/loader.build_cached_dataset) is the only
host-side pixel work in the framework; this binding accelerates it with the
C++ decoder, run concurrently from a thread pool — the C calls don't hold
the GIL, so decode parallelism is real.  Everything degrades gracefully:

  * library missing        -> lazily `make -C native` once (g++ + zlib);
  * build impossible       -> PIL fallback;
  * unsupported PNG flavor -> per-file PIL fallback (decoder returns an
                              error code; 16-bit / interlaced etc.).

Outputs are bit-identical to PIL's convert("RGB") / convert("L")
(tests/test_native_loader.py proves it), so cache numerics are unchanged.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpngloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

# Error codes mirrored from png_loader.cpp.
ERR_UNSUPPORTED = -4


def _try_build() -> bool:
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the native library; None when
    unavailable — callers then use PIL."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _try_build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.png_probe.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.png_probe.restype = ctypes.c_int
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.png_decode_rgb8.argtypes = [
                ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int
            ]
            lib.png_decode_rgb8.restype = ctypes.c_int
            lib.png_decode_gray8.argtypes = [
                ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int
            ]
            lib.png_decode_gray8.restype = ctypes.c_int
            lib.png_loader_abi_version.restype = ctypes.c_int
            if lib.png_loader_abi_version() != 1:
                raise OSError("ABI mismatch")
            _lib = lib
        except OSError:
            _lib_failed = True
        return _lib


def available() -> bool:
    return get_lib() is not None


def _pil_rgb(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _pil_gray(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def decode_rgb(path: str) -> np.ndarray:
    """Decode a PNG to an (H, W, 3) uint8 array, PIL-identical output.
    Falls back to PIL for non-PNG files or unsupported PNG flavors."""
    lib = get_lib()
    if lib is None:
        return _pil_rgb(path)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bpath = path.encode()
    if lib.png_probe(bpath, ctypes.byref(w), ctypes.byref(h),
                     ctypes.byref(c)) != 0:
        return _pil_rgb(path)
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.png_decode_rgb8(bpath, out, h.value, w.value) != 0:
        return _pil_rgb(path)
    return out


def decode_gray(path: str) -> np.ndarray:
    """Decode a PNG to an (H, W) uint8 array, PIL convert("L")-identical."""
    lib = get_lib()
    if lib is None:
        return _pil_gray(path)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bpath = path.encode()
    if lib.png_probe(bpath, ctypes.byref(w), ctypes.byref(h),
                     ctypes.byref(c)) != 0:
        return _pil_gray(path)
    out = np.empty((h.value, w.value), np.uint8)
    if lib.png_decode_gray8(bpath, out, h.value, w.value) != 0:
        return _pil_gray(path)
    return out


def decode_rgb_batch(paths: List[str], workers: int = 8
                     ) -> List[np.ndarray]:
    """Concurrent decode — the C calls release the GIL, so threads scale."""
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(decode_rgb, paths))


def probe(path: str) -> Optional[Tuple[int, int, int]]:
    """(h, w, channels) via the native header parse, None if unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.png_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                     ctypes.byref(c)) != 0:
        return None
    return h.value, w.value, c.value
