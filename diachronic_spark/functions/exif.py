"""EXIF metadata extraction from JPEG APP1 segments.

EXIF is literally a TIFF IFD tree embedded in a JPEG APP1 marker
(``Exif\\0\\0`` + a full II*/MM* TIFF header), so this module is a
COMPOSITION: the JPEG marker walk finds the segment, and
``functions/tiff.py``'s IFD reader — already adjudicated by q164 —
parses it. Camera metadata is the provenance layer of every real
image corpus (orientation decides whether decoded pixels need a
rotate; timestamps/models drive dedup and filtering), which makes
this the image family's analog of the WARC record headers.

Policy: metadata is OPTIONAL in the wild — a JPEG without APP1/EXIF
yields a row of NULLs, never an error (the one family module whose
absence-of-data is not a malformation). A PRESENT-but-corrupt EXIF
block raises ``TiffError``/``ExifError`` loudly like everything
else. Multi-value rationals keep exact (numerator, denominator)
integers — no float conversion hazard.

Tags per the public EXIF 2.3 / TIFF 6.0 specifications.
"""

from __future__ import annotations

import struct

from .tiff import TiffError, _read_ifd


class ExifError(ValueError):
    """Loud rejection for a present-but-malformed EXIF block."""


# IFD0 tags
_MAKE, _MODEL, _ORIENTATION, _DATETIME = 271, 272, 274, 306
_EXIF_IFD_PTR = 34665
# Exif-IFD tags
_EXPOSURE, _FNUMBER, _ISO = 33434, 33437, 34855
_PIX_X, _PIX_Y = 40962, 40963

FIELDS = (
    "make", "model", "orientation", "datetime", "exif_w", "exif_h",
    "iso", "exposure_num", "exposure_den", "fnumber_num",
    "fnumber_den",
)


def _find_app1(blob: bytes) -> bytes | None:
    """Walk JPEG markers for the Exif APP1 segment (None if absent)."""
    if blob[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ExifError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker byte — skip the run, then read the marker.
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        pos += 2
        # Standalone markers (no length field): RST0-7, SOI, EOI, TEM.
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no EXIF past it
            return None
        (seg_len,) = struct.unpack(">H", blob[pos : pos + 2])
        if marker == 0xE1 and blob[pos + 2 : pos + 8] == b"Exif\x00\x00":
            return blob[pos + 8 : pos + seg_len]
        pos += seg_len
    return None


def _ascii(tags: dict, tag: int) -> str | None:
    if tag not in tags:
        return None
    raw = tags[tag][0]
    if not isinstance(raw, (bytes, bytearray)):
        raise ExifError(f"tag {tag} is not ASCII-typed")
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def _rational(tags: dict, tag: int, endian: str) -> tuple:
    if tag not in tags:
        return None, None
    raw = tags[tag][0]
    if not isinstance(raw, (bytes, bytearray)) or len(raw) < 8:
        raise ExifError(f"tag {tag} is not RATIONAL-typed")
    num, den = struct.unpack(endian + "II", raw[:8])
    return num, den


def _short(tags: dict, tag: int):
    if tag not in tags:
        return None
    return int(tags[tag][0])


def parse_exif(blob: bytes) -> dict:
    """Extract the declared field set from a JPEG's EXIF block.

    Returns a dict over :data:`FIELDS`; every value is None when the
    file carries no EXIF. Raises on a present-but-malformed block.
    """
    out = {k: None for k in FIELDS}
    app1 = _find_app1(bytes(blob))
    if app1 is None:
        return out
    if app1[:4] == b"II*\x00":
        endian = "<"
    elif app1[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ExifError("EXIF block lacks a TIFF header")
    (ifd0_off,) = struct.unpack_from(endian + "I", app1, 4)
    try:
        ifd0, _ = _read_ifd(app1, endian, ifd0_off)
    except TiffError as e:
        raise ExifError(f"bad IFD0: {e}") from None
    out["make"] = _ascii(ifd0, _MAKE)
    out["model"] = _ascii(ifd0, _MODEL)
    out["orientation"] = _short(ifd0, _ORIENTATION)
    out["datetime"] = _ascii(ifd0, _DATETIME)
    if _EXIF_IFD_PTR in ifd0:
        try:
            exif_ifd, _ = _read_ifd(
                app1, endian, int(ifd0[_EXIF_IFD_PTR][0])
            )
        except TiffError as e:
            raise ExifError(f"bad Exif IFD: {e}") from None
        out["exif_w"] = _short(exif_ifd, _PIX_X)
        out["exif_h"] = _short(exif_ifd, _PIX_Y)
        out["iso"] = _short(exif_ifd, _ISO)
        out["exposure_num"], out["exposure_den"] = _rational(
            exif_ifd, _EXPOSURE, endian
        )
        out["fnumber_num"], out["fnumber_den"] = _rational(
            exif_ifd, _FNUMBER, endian
        )
    return out
