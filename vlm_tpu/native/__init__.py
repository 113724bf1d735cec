"""Native (C++) runtime components: threaded image decode/preprocess.

Built on demand with g++ (no pip deps); Python falls back to PIL when the
toolchain or libjpeg is unavailable.
"""

from .build import build_imgloader, imgloader_available

__all__ = ["build_imgloader", "imgloader_available"]
