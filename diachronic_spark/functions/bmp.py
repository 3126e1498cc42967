"""Pure-stdlib BMP decoder — the third image container, proving the
``multimodal.decode`` dispatch is real multi-format routing.

BMP (Windows device-independent bitmap — public format, documented
since Windows 3.0) is the simplest real container: a 14-byte file
header, a BITMAPINFOHEADER, an optional BGRA palette, then raw pixel
rows padded to 4-byte boundaries, stored bottom-up unless the height
is negative (top-down). No compression stage at all for the BI_RGB
subset — parsing needs only ``struct``.

Supported: 24-bit BGR and 8-bit paletted BI_RGB, bottom-up and
top-down, any row-padding alignment, palettes shorter than 256 via
``biClrUsed``. Rejected loudly (``BmpError``): other bit depths
(1/4/16/32), RLE/bitfield compression, V4/V5 headers with color
management (only the header SIZE gates — larger headers whose extra
fields are zero pass, matching how most writers emit them), palette
indexes outside the table, truncated pixel data.

Decode output is interleaved RGB, row-major TOP-DOWN — the same
orientation PNG/GIF decode to, so downstream feature math is
container-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP payload to ``(width, height, 3, rgb_pixels)``."""
    blob = bytes(blob)
    if len(blob) < 54 or blob[:2] != b"BM":
        raise BmpError("bad BMP signature/header")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height, planes, bpp, comp, _size_img, _x, _y, clr_used, _imp = (
        struct.unpack("<iiHHIIiiII", blob[18:54])
    )
    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if comp != 0:
        raise BmpError(f"only BI_RGB supported, got compression {comp}")
    if bpp not in (8, 24):
        raise BmpError(f"only 8/24-bit supported, got {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpError(f"bad dimensions {width}x{height}")
    pal = None
    if bpp == 8:
        n = clr_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n > len(blob):
            raise BmpError("truncated palette")
        # BGRA quads -> RGB
        quads = np.frombuffer(
            blob[pal_off : pal_off + 4 * n], dtype=np.uint8
        ).reshape(-1, 4)
        pal = quads[:, 2::-1].copy()  # B,G,R,_ -> R,G,B
    row_bytes = width * (bpp // 8)
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    need = stride * height
    # lower bound too: a data_off pointing back into the headers or
    # palette would silently decode those bytes as pixels (ADVICE r7)
    min_off = 14 + hdr_size + 4 * (clr_used or (256 if bpp == 8 else 0))
    if data_off < min_off:
        raise BmpError(
            f"pixel offset {data_off} inside header/palette "
            f"(first valid byte {min_off})"
        )
    if data_off + need > len(blob):
        raise BmpError(
            f"truncated pixel data: need {need} at {data_off}, "
            f"have {len(blob)}"
        )
    raw = np.frombuffer(
        blob[data_off : data_off + need], dtype=np.uint8
    ).reshape(height, stride)[:, :row_bytes]
    if not top_down:
        raw = raw[::-1]  # bottom-up storage -> top-down output
    if bpp == 24:
        rgb = raw.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
        return width, height, 3, np.ascontiguousarray(rgb).tobytes()
    idx = raw.reshape(height, width)
    if int(idx.max(initial=0)) >= len(pal):
        raise BmpError("palette index outside table")
    return width, height, 3, pal[idx].tobytes()


def encode_bmp(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Encode interleaved top-down RGB as a canonical 24-bit
    bottom-up BI_RGB BMP — byte-deterministic, no gap between palette
    and pixel data. (Fixture/round-trip support; 3-channel only.)"""
    if channels != 3:
        raise BmpError("encoder writes 24-bit BMPs: channels must be 3")
    if len(pixels) != width * height * 3:
        raise BmpError(
            f"pixel buffer {len(pixels)} != {width * height * 3}"
        )
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    data = rows.tobytes()
    data_off = 14 + 40
    file_hdr = b"BM" + struct.pack(
        "<IHHI", data_off + len(data), 0, 0, data_off
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return file_hdr + dib + data
