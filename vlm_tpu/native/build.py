"""Build the native image loader (`imgloader.cpp`) with g++ + libjpeg.

The shared object is cached next to the source as ``libimgloader.so`` and
rebuilt when the source is newer. Build failures degrade gracefully: callers
(`vlm_tpu.data.native_loader`) fall back to the PIL path.
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
SRC = _DIR / "imgloader.cpp"
LIB = _DIR / "libimgloader.so"


def build_imgloader(force: bool = False) -> Optional[Path]:
    """Compile (if needed) and return the .so path, or None on failure."""
    if LIB.exists() and not force and \
            LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", str(SRC), "-o", str(LIB), "-ljpeg", "-lpng",
           "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=120)
    except Exception as e:
        print(f"[native] build failed to launch: {e}")
        return None
    if res.returncode != 0:
        print(f"[native] imgloader build failed:\n{res.stderr[:2000]}")
        return None
    return LIB


def imgloader_available() -> bool:
    return build_imgloader() is not None
