"""Native (C++) host-pipeline kernels with lazy build + ctypes binding.

The TPU compute path is JAX/Pallas; the host runtime around it gets native
help where Python would starve the chip. Built on first use with the system
C++ compiler into a content-addressed cache; everything degrades to the
numpy implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "chammi_preproc.cc")
_CACHE_DIR = os.environ.get(
    "DCVIT_NATIVE_CACHE", os.path.expanduser("~/.cache/dcvit_native")
)
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"chammi_preproc_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["c++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


def get_lib():
    """The loaded library, or None when building is impossible."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            lib = ctypes.CDLL(_build())
            fn = lib.fold_crop_resize_normalize
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_float,
            ]
            fn.restype = None
            _lib = lib
        except Exception as e:  # no toolchain / sandbox: numpy fallback
            print(f"[native] chammi_preproc unavailable ({type(e).__name__}); using numpy", file=sys.stderr)
            _lib = None
    return _lib


def fold_crop_resize_normalize(
    tape: np.ndarray,
    channel_width: int,
    crop: tuple,  # (y, x, h, w) in unfolded image coords
    out_hw: int,
    mean,
    std,
) -> "np.ndarray | None":
    """Fused unfold+crop+resize+normalize; None if the native lib is absent.

    tape: (h, w*c) uint8/uint16. Returns float32 (c, out_hw, out_hw).
    """
    lib = get_lib()
    if lib is None:
        return None
    if tape.dtype == np.uint8:
        elem, scale = 1, 255.0
    elif tape.dtype == np.uint16:
        elem, scale = 2, 65535.0
    else:
        return None
    tape = np.ascontiguousarray(tape)
    h = tape.shape[0]
    w = int(channel_width)
    c = tape.shape[1] // w
    cy, cx, ch_, cw = (int(v) for v in crop)
    out = np.empty((c, out_hw, out_hw), np.float32)
    mean = np.ascontiguousarray(np.asarray(mean, np.float32))
    std = np.ascontiguousarray(np.asarray(std, np.float32))
    lib.fold_crop_resize_normalize(
        tape.ctypes.data_as(ctypes.c_void_p), elem, h, w, c,
        cy, cx, ch_, cw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_hw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale),
    )
    return out
