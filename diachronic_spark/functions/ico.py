"""Pure-stdlib+numpy ICO (Windows icon / favicon) decoder — the sixth
image container, and the first whose payloads are themselves OTHER
containers: an ICO is a directory of entries, each either a PNG
stream or a headerless DIB (the BMP pixel format with a doubled
height carrying a 1-bit AND transparency mask). Favicons are a real
web-corpus mass (every crawl frontier collects them), and decoding
one exercises container COMPOSITION: signature-sniff per entry,
reuse of the PNG decoder, and the DIB/mask rules below.

Scope (public file-format documentation): type-1 (.ico) directories;
entries as PNG (any layout functions/png.py decodes) or BI_RGB DIB at
8/24/32 bpp with the AND mask. Rejected loudly (``IcoError``): cursor
files (type 2), compressed DIBs, other bit depths, truncated or
overlapping/out-of-bounds entry data, dimension mismatches between
the directory and the payload.

Determinism contract (what the oracle hashes): output is ALWAYS
4-channel RGBA, top-down. The decoded entry is the LARGEST by pixel
area (directory width/height bytes, 0 meaning 256), ties broken by
lowest entry index. Alpha policy — the documented Windows rules:

- PNG entries: the PNG's own channels, normalized to RGBA (gray →
  replicated luma + opaque; missing alpha → 255);
- 32 bpp DIBs: the embedded alpha bytes, UNLESS every alpha byte is
  zero (legacy pre-XP icons wrote zeros), in which case the AND mask
  decides (mask bit 1 → transparent);
- 8/24 bpp DIBs: alpha from the AND mask (bit 1 → alpha 0, else 255).
"""

from __future__ import annotations

import struct

import numpy as np

from . import png as PNG

__all__ = ["IcoError", "decode_ico", "ICO_SIGNATURE"]

ICO_SIGNATURE = b"\x00\x00\x01\x00"


class IcoError(ValueError):
    """Malformed or unsupported ICO payload."""


def _to_rgba(w: int, h: int, c: int, pix: bytes) -> np.ndarray:
    a = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = a[:, :, 0]
        out[:, :, 3] = 255
    elif c == 2:  # gray + alpha
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = a[:, :, 0]
        out[:, :, 3] = a[:, :, 1]
    elif c == 3:
        out[:, :, :3] = a
        out[:, :, 3] = 255
    else:
        out[:] = a
    return out


def _decode_dib(data: bytes, w: int, h: int) -> np.ndarray:
    if len(data) < 40:
        raise IcoError("truncated DIB header")
    (
        hdr_size, bw, bh, planes, bpp, comp, _sz, _x, _y, clr_used, _imp
    ) = struct.unpack("<IiiHHIIiiII", data[:40])
    if hdr_size != 40:
        raise IcoError(f"unsupported DIB header size {hdr_size}")
    if comp != 0:
        raise IcoError(f"only BI_RGB DIB entries, got compression {comp}")
    if planes != 1:
        raise IcoError(f"bad plane count {planes}")
    if bw != w or bh != 2 * h:
        raise IcoError(
            f"DIB dims {bw}x{bh} != directory {w}x{2 * h} "
            "(height must be doubled: XOR + AND mask)"
        )
    if bpp not in (8, 24, 32):
        raise IcoError(f"only 8/24/32-bit DIB entries, got {bpp}")
    pos = 40
    pal = None
    if bpp == 8:
        n = clr_used or 256
        if pos + 4 * n > len(data):
            raise IcoError("truncated palette")
        quads = np.frombuffer(
            data[pos : pos + 4 * n], dtype=np.uint8
        ).reshape(-1, 4)
        pal = quads[:, 2::-1].copy()  # BGRx -> RGB
        pos += 4 * n
    xor_stride = (w * bpp // 8 + 3) & ~3
    and_stride = ((w + 31) // 32) * 4
    need = xor_stride * h + and_stride * h
    if pos + need > len(data):
        raise IcoError(
            f"truncated pixel data: need {need} at {pos}, "
            f"have {len(data)}"
        )
    xor = np.frombuffer(
        data[pos : pos + xor_stride * h], dtype=np.uint8
    ).reshape(h, xor_stride)[::-1]  # bottom-up -> top-down
    pos += xor_stride * h
    msk = np.frombuffer(
        data[pos : pos + and_stride * h], dtype=np.uint8
    ).reshape(h, and_stride)[::-1]
    # AND mask: 1 bit per pixel, MSB-first; bit 1 -> transparent
    bits = np.unpackbits(msk, axis=1)[:, :w]
    mask_alpha = np.where(bits == 1, 0, 255).astype(np.uint8)
    out = np.empty((h, w, 4), dtype=np.uint8)
    if bpp == 32:
        px = xor[:, : w * 4].reshape(h, w, 4)
        out[:, :, 0] = px[:, :, 2]  # BGRA -> RGBA
        out[:, :, 1] = px[:, :, 1]
        out[:, :, 2] = px[:, :, 0]
        if int(px[:, :, 3].max(initial=0)) == 0:
            out[:, :, 3] = mask_alpha  # legacy all-zero alpha plane
        else:
            out[:, :, 3] = px[:, :, 3]
    elif bpp == 24:
        px = xor[:, : w * 3].reshape(h, w, 3)
        out[:, :, :3] = px[:, :, ::-1]
        out[:, :, 3] = mask_alpha
    else:
        idx = xor[:, :w]
        if int(idx.max(initial=0)) >= len(pal):
            raise IcoError("palette index outside table")
        out[:, :, :3] = pal[idx]
        out[:, :, 3] = mask_alpha
    return out


def decode_ico(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode an ICO to ``(width, height, 4, rgba_pixels)`` — the
    largest entry per the pinned policy above."""
    blob = bytes(blob)
    if len(blob) < 6 or blob[:4] != ICO_SIGNATURE:
        raise IcoError("bad ICONDIR signature (type-1 .ico only)")
    (count,) = struct.unpack("<H", blob[4:6])
    if count == 0:
        raise IcoError("empty icon directory")
    if 6 + 16 * count > len(blob):
        raise IcoError("truncated icon directory")
    entries = []
    for i in range(count):
        w8, h8, _nc, _res, _pl, _bpp, size, off = struct.unpack(
            "<BBBBHHII", blob[6 + 16 * i : 22 + 16 * i]
        )
        entries.append((w8 or 256, h8 or 256, size, off, i))
    w, h, size, off, i = max(entries, key=lambda e: (e[0] * e[1], -e[4]))
    if off < 6 + 16 * count:
        raise IcoError(
            f"entry {i} data offset {off} inside the directory"
        )
    if off + size > len(blob):
        raise IcoError(f"entry {i} data out of bounds")
    data = blob[off : off + size]
    if data[: len(PNG.SIGNATURE)] == PNG.SIGNATURE:
        pw, ph, pc, pix = PNG.decode_png(data)
        if (pw, ph) != (w, h):
            raise IcoError(
                f"PNG entry {pw}x{ph} != directory {w}x{h}"
            )
        rgba = _to_rgba(pw, ph, pc, pix)
    else:
        rgba = _decode_dib(data, w, h)
    return w, h, 4, rgba.tobytes()
