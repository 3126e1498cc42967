"""Pure-stdlib GIF (87a/89a) decoder — the multi-frame image sibling
of ``png.py``, and the container that makes frame-sampling over an
animation column REAL instead of a byte-window stub.

GIF is a length-prefixed block container around LZW-compressed color
indexes (CompuServe GIF89a spec, 1990 — public): header + logical
screen descriptor (+ optional global color table), then a sequence of
extension blocks (skipped by their sub-block structure) and image
descriptors (+ optional local color table) each followed by one LZW
stream, terminated by 0x3B. Parsing needs only ``struct``; LZW is
~60 lines of bit-twiddling.

Supported: both versions; global and local color tables; multiple
frames; interlaced frames (the 4-pass row shuffle); the full LZW
coder including CLEAR/EOI codes, width growth with the standard
"early change" convention, the 12-bit ceiling with deferred clears,
and the KwKwK self-reference case. Rejected loudly (``GifError``):
truncated blocks, a frame without a color table, codes outside the
dictionary, streams that over/under-run the declared frame size.

Frames decode INDEPENDENTLY to full RGB (their own dimensions, their
own active color table). Canvas compositing — disposal methods,
transparency overlay onto previous frames (Graphic Control
Extensions are skipped with all other extensions) — is presentation
logic, not pixel decoding, and is out of scope for feature
extraction; per-frame offsets are surfaced so a caller could
composite.

Scale shape: like PNG/WAV, decode is per-payload imperative work
inside Arrow ``mapInPandas`` batches; one GIF fans out to many frame
rows (the one-to-many UDTF shape of real video/animation pipelines).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

SIGNATURES = (b"GIF87a", b"GIF89a")

# interlaced GIFs store rows in 4 passes: every 8th from 0, every 8th
# from 4, every 4th from 2, every 2nd from 1 (spec appendix E)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_SIZE = 12


class GifError(ValueError):
    """Malformed or unsupported GIF payload."""


class GifFrame(NamedTuple):
    left: int
    top: int
    width: int
    height: int
    interlaced: bool
    pixels: bytes  # RGB interleaved, row-major, de-interlaced


def lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """Decode a GIF LZW stream to exactly ``expected`` index bytes.

    Codes are packed LSB-first; width starts at min_code_size+1 and
    grows by the early-change rule (widen when the NEXT free slot
    reaches the current width's capacity), capping at 12 bits until a
    CLEAR resets the dictionary. Raises ``GifError`` on codes outside
    the dictionary, on streams that overrun ``expected``, or on
    streams that end (EOI or bytes exhausted) short of it.
    """
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]

    out = bytearray()
    table: list[bytes] = []
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = pos = 0
    ended = False
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise GifError("LZW stream exhausted before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = []
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            ended = True
            break
        if prev is None:
            if code >= clear:
                raise GifError(f"first code {code} after clear not a literal")
            entry = base[code]
        elif code < clear:
            entry = base[code]
        elif eoi < code < eoi + 1 + len(table):
            entry = table[code - eoi - 1]
        elif code == eoi + 1 + len(table):
            entry = prev + prev[:1]  # KwKwK: code defined by this step
        else:
            raise GifError(f"LZW code {code} outside dictionary")
        out += entry
        if len(out) > expected:
            raise GifError(
                f"LZW output overruns frame: {len(out)} > {expected}"
            )
        if prev is not None and eoi + 1 + len(table) < (1 << _MAX_CODE_SIZE):
            table.append(prev + entry[:1])
            # early change: widen when the next free slot fills the
            # current width (but never past 12 bits)
            if (
                eoi + 1 + len(table) == (1 << code_size)
                and code_size < _MAX_CODE_SIZE
            ):
                code_size += 1
        prev = entry
        if len(out) == expected:
            # spec: an EOI (possibly after padding bits) should follow;
            # tolerate its absence but never read past the frame
            return bytes(out)
    if ended and len(out) < expected:
        raise GifError(
            f"LZW stream ended at {len(out)} of {expected} pixels"
        )
    return bytes(out)


def _sub_blocks(blob: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``off``; return
    (data, offset past the 0 terminator)."""
    parts = []
    while True:
        if off >= len(blob):
            raise GifError("truncated sub-block chain")
        n = blob[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        if off + n > len(blob):
            raise GifError("truncated sub-block")
        parts.append(blob[off : off + n])
        off += n


def _deinterlace(idx: bytes, width: int, height: int) -> bytes:
    rows = [idx[y * width : (y + 1) * width] for y in range(height)]
    out: list[bytes | None] = [None] * height
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = rows[src]
            src += 1
    return b"".join(out)  # type: ignore[arg-type]


def decode_gif(blob: bytes) -> tuple[int, int, list[GifFrame]]:
    """Decode every frame: ``(screen_w, screen_h, frames)``.

    Each frame's ``pixels`` is its own RGB buffer (palette applied,
    interlace undone) at the frame's dimensions.
    """
    blob = bytes(blob)
    if len(blob) < 13 or blob[:6] not in SIGNATURES:
        raise GifError("bad GIF signature")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if off + 3 * n > len(blob):
            raise GifError("truncated global color table")
        gct = blob[off : off + 3 * n]
        off += 3 * n
    frames: list[GifFrame] = []
    while True:
        if off >= len(blob):
            raise GifError("missing trailer")
        b = blob[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + sub-block chain
            if off >= len(blob):
                raise GifError("truncated extension")
            off += 1
            _, off = _sub_blocks(blob, off)
            continue
        if b != 0x2C:
            raise GifError(f"unknown block introducer 0x{b:02x}")
        if off + 9 > len(blob):
            raise GifError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", blob[off : off + 9]
        )
        off += 9
        if w == 0 or h == 0:
            raise GifError(f"bad frame dimensions {w}x{h}")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if off + 3 * n > len(blob):
                raise GifError("truncated local color table")
            ct = blob[off : off + 3 * n]
            off += 3 * n
        if ct is None:
            raise GifError("frame has neither local nor global color table")
        if off >= len(blob):
            raise GifError("missing LZW min code size")
        min_code = blob[off]
        off += 1
        data, off = _sub_blocks(blob, off)
        idx = lzw_decode(min_code, data, w * h)
        interlaced = bool(ipacked & 0x40)
        if interlaced:
            idx = _deinterlace(idx, w, h)
        pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
        arr = np.frombuffer(idx, dtype=np.uint8)
        if int(arr.max(initial=0)) >= len(pal):
            raise GifError("color index outside color table")
        pix = pal[arr].tobytes()
        frames.append(GifFrame(left, top, w, h, interlaced, pix))
    if not frames:
        raise GifError("GIF contains no image blocks")
    return sw, sh, frames
