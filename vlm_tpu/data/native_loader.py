"""ctypes bindings for the native image loader + PIL fallback.

``load_batch(paths, recipe)`` returns a uint8 [N, S, S, 3] batch, decoded and
recipe-resized by the C++ thread pool (`vlm_tpu/native/imgloader.cpp`,
JPEG via libjpeg-turbo + PNG via libpng) when available, else by PIL
(`vlm_tpu.ops.preprocess.host_resize` — the bit-exact HF-parity path).
Other formats always take the PIL path.
"""

from __future__ import annotations

import ctypes
from typing import TYPE_CHECKING, Optional, Sequence

import numpy as np

if TYPE_CHECKING:  # jax-importing module; keep data-layer imports light
    from ..ops.preprocess import PreprocessRecipe

_lib = None
_lib_checked = False


def _load_lib():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    from ..native.build import build_imgloader
    so = build_imgloader()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.vlm_load_batch.restype = ctypes.c_int
        lib.vlm_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception as e:
        print(f"[native] imgloader load failed: {e}")
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_batch(paths: Sequence, recipe: "PreprocessRecipe", *,
               threads: int = 4,
               use_native: Optional[bool] = None) -> np.ndarray:
    """Decode + recipe-resize ``paths`` → uint8 [N, S, S, 3]."""
    from ..ops.preprocess import host_resize

    paths = [str(p) for p in paths]
    n = len(paths)
    s = recipe.image_size
    lib = _load_lib() if (use_native is None or use_native) else None
    # Unsupported formats in the batch are fine: the C++ side flags them
    # as failures per file and the PIL retry below handles them, keeping
    # native-speed decode for the supported majority of the batch.
    if lib is not None and n > 0:
        out = np.zeros((n, s, s, 3), dtype=np.uint8)
        ok = np.zeros((n,), dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        mode = 1 if recipe.mode == "shortest_edge_crop" else 0
        lib.vlm_load_batch(
            arr, n, s, mode, threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ok.all():
            return out
        # Retry failures through PIL (corrupt-but-PIL-readable files).
        from PIL import Image
        for i in np.nonzero(~ok.astype(bool))[0]:
            out[i] = host_resize(Image.open(paths[i]), recipe)
        return out
    from PIL import Image
    return np.stack(
        [host_resize(Image.open(p).convert("RGB"), recipe) for p in paths],
        axis=0)
