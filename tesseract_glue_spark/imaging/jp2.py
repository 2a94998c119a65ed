"""JPEG-2000 container/codestream header parsing (dependency-free).

The reference's capability test requires BOTH libtiff AND libopenjp2
linked into Leptonica (``tests/test_capabilties.py:11-13``); its loader
dispatches on magic bytes (``ImageLoaderStrategies.cpp:12-18``). TIFF
gray8 got a full built-in codec last round; JPEG-2000's entropy stage
(EBCOT + MQ-coder + wavelet reconstruction) is a codec-library-sized
project with no stdlib shortcut, so this module implements the honest
maximum without libopenjp2:

* magic sniffing for both shapes — the ``jP `` signature-box container
  (.jp2) and the raw SOC/SIZ codestream (.j2k);
* width/height/components WITHOUT pixel decode, from the ``ihdr`` box
  (container) or the SIZ marker segment (codestream) — this feeds the
  ``Image.w/.h`` metadata parity path (reference ``Image.cpp:15-27``)
  and the pages-metadata queries;
* pixel decode via Pillow WHEN built with JPEG-2000 support (absent in
  this sandbox), else a typed :class:`ImageDecodeError` so extraction
  degrades to an error-status row (degrade-don't-die), never a task
  death;
* a header-only skeleton writer so tests can pin the sniff/dims/degrade
  path on synthetic fixtures (clearly marked: its ``jp2c`` box carries
  a codestream HEADER only — no entropy-coded payload — decodable by
  nothing, by design).
"""

from __future__ import annotations

import struct

from tesseract_glue_spark.errors import ImageDecodeError

# 12-byte JP2 signature box: length 12, type 'jP  ', payload 0D0A870A
JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
# raw codestream: SOC marker immediately followed by SIZ
J2K_SOC = b"\xff\x4f\xff\x51"


def is_jp2(data: bytes) -> bool:
    head = bytes(data[:12])
    return head == JP2_SIG or head[:4] == J2K_SOC


def _iter_boxes(data: bytes, start: int, end: int):
    """(type, payload_start, box_end) over a JP2 box sequence."""
    pos = start
    while pos + 8 <= end:
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = bytes(data[pos + 4 : pos + 8])
        if ln == 1:  # XLBox: 64-bit extended length
            if pos + 16 > end:
                raise ImageDecodeError("jp2: truncated extended-length box")
            ln = int.from_bytes(data[pos + 8 : pos + 16], "big")
            payload = pos + 16
        elif ln == 0:  # box runs to end of file
            ln = end - pos
            payload = pos + 8
        else:
            payload = pos + 8
        if ln < 8 or pos + ln > end:
            raise ImageDecodeError("jp2: bad box length")
        yield typ, payload, pos + ln
        pos += ln


def _siz_dims(cs: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from a codestream's SIZ marker
    segment (ISO 15444-1 A.5.1): grid minus image offset."""
    if cs[:4] != J2K_SOC or len(cs) < 42:
        raise ImageDecodeError("jp2: codestream missing SOC/SIZ markers")
    # after SOC (2) + SIZ marker (2): Lsiz u16, Rsiz u16, then 8 u32s
    (xsiz, ysiz, xosiz, yosiz) = struct.unpack_from(">IIII", cs, 8)
    (csiz,) = struct.unpack_from(">H", cs, 40)
    w, h = xsiz - xosiz, ysiz - yosiz
    if w <= 0 or h <= 0:
        raise ImageDecodeError("jp2: SIZ declares empty image grid")
    return w, h, csiz


def jp2_header(data: bytes) -> dict:
    """Parsed header: {width, height, n_components, container} without
    touching the entropy-coded payload. ``container`` is 'jp2' or
    'j2k'. Raises :class:`ImageDecodeError` on structural damage."""
    data = bytes(data)
    if data[:4] == J2K_SOC:
        w, h, nc = _siz_dims(data)
        return {"width": w, "height": h, "n_components": nc, "container": "j2k"}
    if data[:12] != JP2_SIG:
        raise ImageDecodeError("jp2: missing signature box / SOC marker")
    jp2c: tuple[int, int] | None = None
    for typ, payload, box_end in _iter_boxes(data, 0, len(data)):
        if typ == b"jp2h":
            for ityp, ipay, iend in _iter_boxes(data, payload, box_end):
                if ityp == b"ihdr":
                    if iend - ipay < 10:
                        raise ImageDecodeError("jp2: short ihdr box")
                    h, w = struct.unpack_from(">II", data, ipay)
                    (nc,) = struct.unpack_from(">H", data, ipay + 8)
                    if w <= 0 or h <= 0:
                        raise ImageDecodeError("jp2: ihdr declares empty image")
                    return {
                        "width": w,
                        "height": h,
                        "n_components": nc,
                        "container": "jp2",
                    }
        elif typ == b"jp2c" and jp2c is None:
            jp2c = (payload, box_end)
    if jp2c is not None:  # header box missing: fall back to the SIZ
        w, h, nc = _siz_dims(data[jp2c[0] : jp2c[1]])
        return {"width": w, "height": h, "n_components": nc, "container": "jp2"}
    raise ImageDecodeError("jp2: no ihdr box and no codestream")


def jp2_dims(data: bytes) -> tuple[int, int]:
    """(width, height); (0, 0) if unreadable — the reference's
    null-image convention."""
    try:
        hd = jp2_header(data)
        return (hd["width"], hd["height"])
    except ImageDecodeError:
        return (0, 0)


def decode_jp2(data: bytes):
    """Pixels as a 2-D uint8 grayscale array. The entropy decode needs
    libopenjp2 (via a Pillow built with JPEG-2000); without it this
    validates the header then raises the TYPED decode error, so the
    extraction pipeline records an error-status row instead of dying —
    the same degrade contract as a corrupt PNG/TIFF."""
    jp2_header(bytes(data))  # structural validation first: typed errors
    try:
        from PIL import Image as _PILImage
        from PIL import features as _pil_features

        if not _pil_features.check("jpg_2000"):
            raise ImportError("Pillow built without openjpeg")
    except ImportError as exc:
        raise ImageDecodeError(
            "JPEG-2000 entropy decode requires libopenjp2 (Pillow jpg_2000 "
            "feature); not available — header parsed, pixels undecodable"
        ) from exc
    import io

    import numpy as np

    try:
        with _PILImage.open(io.BytesIO(bytes(data))) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    except Exception as exc:
        raise ImageDecodeError(f"jp2: Pillow failed to decode: {exc}") from exc


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def encode_jp2_skeleton(width: int, height: int, n_components: int = 1) -> bytes:
    """Header-only synthetic .jp2 (FIXTURE WRITER — the ``jp2c`` box
    holds just SOC+SIZ+EOC, no entropy-coded tiles, so no decoder can
    produce pixels from it). Exists to pin the sniff → dims → typed
    degrade path in tests without vendoring a binary fixture."""
    ihdr = struct.pack(">IIHBBBB", height, width, n_components, 7, 7, 0, 0)
    jp2h = _box(b"jp2h", _box(b"ihdr", ihdr))
    ftyp = _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    siz_body = struct.pack(
        ">HIIIIIIIIH",
        0,  # Rsiz
        width, height, 0, 0,  # image grid
        width, height, 0, 0,  # one tile = whole image
        n_components,
    ) + b"\x07\x01\x01" * n_components  # Ssiz/XRsiz/YRsiz per component
    siz = b"\xff\x51" + struct.pack(">H", 2 + len(siz_body)) + siz_body
    codestream = b"\xff\x4f" + siz + b"\xff\xd9"  # SOC + SIZ + EOC
    return JP2_SIG + ftyp + jp2h + _box(b"jp2c", codestream)
