"""Format-sniffing image decode seam.

The reference loads pages through Leptonica's ``pixRead``, which
dispatches on the container's magic bytes and reports its linked codecs
(``ImageLoaderStrategies.cpp:12-18``, ``capabilities.py:7-19``; its
test corpus is TIFF, ``tests/CMakeLists.txt:3-7``). This module is that
dispatch: built-in dependency-free PNG and TIFF gray8 codecs, with
Pillow (import-gated, absent in this sandbox) as the fallback for
anything they don't cover. Every operator that touches pixel bytes
decodes through :func:`decode_image` / :func:`image_dims_any`, so a
new container is one dispatch entry, not N call-site edits.
"""

from __future__ import annotations

import numpy as np

from tesseract_glue_spark.errors import ImageDecodeError
from tesseract_glue_spark.imaging.jp2 import decode_jp2, is_jp2, jp2_dims
from tesseract_glue_spark.imaging.png import _PNG_SIG, decode_png, image_dims
from tesseract_glue_spark.imaging.tiff import (
    TIFF_SIG_BE,
    TIFF_SIG_LE,
    decode_tiff,
    tiff_dims,
)

try:  # optional: widens format coverage when installed (not in sandbox)
    import PIL  # noqa: F401
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _pil_decode(data: bytes) -> np.ndarray:
    import io

    try:
        with _PILImage.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    except Exception as exc:
        raise ImageDecodeError(f"Pillow failed to decode: {exc}") from exc


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG or TIFF page bytes to a 2-D uint8 grayscale array,
    dispatching on magic bytes; unknown containers go to Pillow when
    installed, else raise :class:`ImageDecodeError` (degrade-don't-die:
    callers map this to an error-status row)."""
    if not isinstance(data, (bytes, bytearray, memoryview)) or len(data) < 4:
        raise ImageDecodeError("not an image buffer")
    head = bytes(data[:8])
    if head == _PNG_SIG:
        return decode_png(bytes(data))
    if head[:4] in (TIFF_SIG_LE, TIFF_SIG_BE):
        return decode_tiff(bytes(data))
    if is_jp2(bytes(data[:12])):
        # header parse is built-in; the entropy decode inside needs a
        # JPEG-2000-capable Pillow and degrades to the typed error
        return decode_jp2(bytes(data))
    if _HAVE_PIL:
        return _pil_decode(bytes(data))
    raise ImageDecodeError(f"unrecognized image container (magic {head[:4]!r})")


def image_dims_any(data: bytes) -> tuple[int, int]:
    """(width, height) without full decode; (0, 0) if unreadable —
    the reference's null-image convention (``Image.cpp:15-27``)."""
    try:
        head = bytes(data[:8])
    except Exception:
        return (0, 0)
    if head == _PNG_SIG:
        return image_dims(bytes(data))
    if head[:4] in (TIFF_SIG_LE, TIFF_SIG_BE):
        return tiff_dims(bytes(data))
    if is_jp2(bytes(data[:12])):
        return jp2_dims(bytes(data))
    if _HAVE_PIL:
        try:
            import io

            with _PILImage.open(io.BytesIO(bytes(data))) as im:
                return (int(im.width), int(im.height))
        except Exception:
            return (0, 0)
    return (0, 0)


def sniff_mime(data: bytes) -> str:
    """Container mime from magic bytes (pixRead-style dispatch)."""
    head = bytes(data[:8])
    if head == _PNG_SIG:
        return "image/png"
    if head[:4] in (TIFF_SIG_LE, TIFF_SIG_BE):
        return "image/tiff"
    if is_jp2(bytes(data[:12])):
        return "image/jp2"
    return "application/octet-stream"


def codec_versions() -> dict[str, str]:
    """Linked-codec report, the shape of the reference's
    ``image_lib_versions`` (``capabilities.py:7-19``)."""
    import zlib

    out = {
        "zlib": zlib.ZLIB_VERSION,
        "numpy": np.__version__,
        "png-gray8": "builtin",
        "tiff-gray8": "builtin",
        # header/dims parsing is built-in; pixel decode needs openjpeg
        "jp2-header": "builtin",
    }
    if _HAVE_PIL:
        out["pillow"] = PIL.__version__
        try:
            from PIL import features as _feat

            out["jp2-decode"] = "pillow" if _feat.check("jpg_2000") else "unavailable"
        except Exception:
            out["jp2-decode"] = "unavailable"
    else:
        out["jp2-decode"] = "unavailable"
    return out
