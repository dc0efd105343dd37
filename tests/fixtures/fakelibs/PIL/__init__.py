"""Fixture double for Pillow: `from PIL import Image`, Image.open(fp)
→ .convert("RGB") → np.asarray-able object (a distinctive 2×2×3 ramp)."""

import numpy as _np

FAKE_PIXELS = _np.arange(12, dtype=_np.uint8).reshape(2, 2, 3)


class _Img:
    def convert(self, mode):
        assert mode == "RGB"
        return self

    def __array__(self, dtype=None, copy=None):
        a = FAKE_PIXELS
        return a.astype(dtype) if dtype is not None else a.copy()


class UnidentifiedImageError(OSError):
    """Mirrors PIL.UnidentifiedImageError (raised on corrupt input)."""


class Image:
    @staticmethod
    def open(fp):
        if fp.read(7) == b"corrupt":
            raise UnidentifiedImageError("cannot identify image file")
        fp.seek(0)
        return _Img()
