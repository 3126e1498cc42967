"""Pure-stdlib baseline TIFF decoder.

The scanned-document / scientific-imagery container (multi-page
scans, OCR pipelines, satellite tiles ship as TIFF), rounding out
the image family's eighth container. Scope is baseline TIFF 6.0,
8-bit samples: both byte orders (II/MM), strip-based layout
(RowsPerStrip < height exercised), Compression 1 (none), 32773
(PackBits) and 5 (TIFF-LZW — MSB-first bit packing with the EARLY
code-width change, one code before the table fills, the documented
difference from GIF's LSB-first LZW in ``functions/gif.py``),
horizontal-differencing Predictor 2, and PhotometricInterpretation
0 (WhiteIsZero, inverted gray), 1 (gray), 2 (RGB, incl. a 4th
unassociated-alpha extra sample) and 3 (palette via the 16-bit
ColorMap, high byte taken).

Returns the family's standard (width, height, channels, pixels)
tuple so ``multimodal.decode`` routes it like every other
container. Unsupported shapes fail LOUDLY with ``TiffError`` —
tiled layout, planar configuration 2, bit depths other than 8
(except 1-bit bilevel rejection by depth check), JPEG-in-TIFF,
multi-page files keep only the FIRST IFD by declared policy (the
page count is reported so callers can detect truncation).

Format per the public TIFF 6.0 specification (Adobe, 1992) and the
LZW early-change erratum documented in libtiff.
"""

from __future__ import annotations

import struct

class TiffError(ValueError):
    """Loud rejection for malformed or unsupported TIFF input."""


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd(blob: bytes, endian: str, off: int) -> tuple[dict, int]:
    if off + 2 > len(blob):
        raise TiffError(f"IFD offset {off} overruns the payload")
    (n,) = struct.unpack_from(endian + "H", blob, off)
    entries: dict = {}
    pos = off + 2
    if pos + 12 * n + 4 > len(blob):
        raise TiffError(f"IFD at {off} truncated ({n} entries declared)")
    for _ in range(n):
        tag, typ, cnt = struct.unpack_from(endian + "HHI", blob, pos)
        if typ in _TYPE_SIZES:
            size = _TYPE_SIZES[typ] * cnt
            if size <= 4:
                raw = blob[pos + 8 : pos + 8 + size]
            else:
                (voff,) = struct.unpack_from(endian + "I", blob, pos + 8)
                if voff + size > len(blob):
                    raise TiffError(
                        f"tag {tag} value at {voff} overruns the payload"
                    )
                raw = blob[voff : voff + size]
            if typ == 3:
                vals = list(
                    struct.unpack(endian + "H" * cnt, raw)
                )
            elif typ == 4:
                vals = list(struct.unpack(endian + "I" * cnt, raw))
            elif typ == 1:
                vals = list(raw)
            else:
                vals = [raw]  # ASCII/RATIONAL kept raw; unused here
            entries[tag] = vals
        pos += 12
    (nxt,) = struct.unpack_from(endian + "I", blob, pos)
    return entries, nxt


def _unpackbits(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        b = data[i]
        i += 1
        if b < 128:          # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:        # repeat next byte 257-b times
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 = no-op
    if len(out) < expect:
        raise TiffError(
            f"PackBits strip ends early ({len(out)}/{expect} bytes)"
        )
    return bytes(out[:expect])


def _lzw_decode(data: bytes, expect: int | None) -> bytes:
    """TIFF-variant LZW: MSB-first bit order, 256=Clear, 257=EOI,
    and the EARLY code-width change (width bumps when the next code
    WOULD reach 2^w - 1, one code before GIF's rule).

    ``expect`` is the exact output size for TIFF strips; ``None``
    decodes until EOI (the PDF LZWDecode case — same convention,
    PDF adopted it from TIFF, length unknown up front)."""
    out = bytearray()
    table: list = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos, n = 0, len(data)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while expect is None or len(out) < expect:
        while nbits < width:
            if pos >= n:
                if expect is None:
                    raise TiffError("LZW stream ends without EOI")
                raise TiffError(
                    f"LZW strip ends early ({len(out)}/{expect} bytes)"
                )
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            if code > 255:
                raise TiffError(f"LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        # EARLY change (the libtiff pair): the decoder widens when the
        # next free code reaches 2^w - 2 — one code before a
        # GIF-style decoder would, because the encoder (which runs one
        # table entry AHEAD of the decoder) switches at 2^w - 1
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    if expect is None:
        return bytes(out)
    if len(out) < expect:
        raise TiffError(
            f"LZW strip ends early ({len(out)}/{expect} bytes)"
        )
    return bytes(out[:expect])


def decode_tiff(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST IFD of a baseline TIFF to
    (width, height, channels, pixels)."""
    blob = bytes(blob)
    if blob[:4] == b"II*\x00":
        endian = "<"
    elif blob[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise TiffError("not a TIFF (II*/MM* signature missing)")
    (ifd_off,) = struct.unpack_from(endian + "I", blob, 4)
    tags, _next = _read_ifd(blob, endian, ifd_off)

    def one(tag: int, default=None):
        if tag not in tags:
            if default is None:
                raise TiffError(f"mandatory tag {tag} missing")
            return default
        return tags[tag][0]

    width, height = one(256), one(257)
    if width <= 0 or height <= 0:
        raise TiffError(f"bad geometry {width}x{height}")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits) or len(bits) not in (1, spp):
        raise TiffError(
            f"unsupported bit depth {bits} (8-bit samples only)"
        )
    if one(284, 1) != 1:
        raise TiffError("planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise TiffError("tiled layout unsupported (strips only)")
    comp = one(259, 1)
    if comp not in (1, 5, 32773):
        raise TiffError(
            f"unsupported compression {comp} (none/LZW/PackBits only)"
        )
    photo = one(262)
    if photo not in (0, 1, 2, 3):
        raise TiffError(f"unsupported photometric {photo}")
    if photo == 2 and spp not in (3, 4):
        raise TiffError(f"RGB photometric with {spp} samples")
    if photo in (0, 1, 3) and spp != 1:
        raise TiffError(f"photometric {photo} with {spp} samples")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise TiffError(f"unsupported predictor {predictor}")
    if predictor == 2 and comp == 1:
        raise TiffError("predictor 2 with no compression is malformed")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("strip offsets/byte-counts missing or unequal")
    rows_per_strip = one(278, height)
    row_bytes = width * spp
    raw = bytearray()
    remaining = height
    for i, (soff, scnt) in enumerate(zip(offsets, counts)):
        if soff + scnt > len(blob):
            raise TiffError(f"strip {i} overruns the payload")
        strip_rows = min(rows_per_strip, remaining)
        expect = strip_rows * row_bytes
        data = blob[soff : soff + scnt]
        if comp == 1:
            if len(data) < expect:
                raise TiffError(
                    f"strip {i} short ({len(data)}/{expect} bytes)"
                )
            strip = data[:expect]
        elif comp == 32773:
            strip = _unpackbits(data, expect)
        else:
            strip = _lzw_decode(data, expect)
        if predictor == 2:
            buf = bytearray(strip)
            for r in range(strip_rows):
                base = r * row_bytes
                for x in range(spp, row_bytes):
                    buf[base + x] = (buf[base + x] + buf[base + x - spp]) & 0xFF
            strip = bytes(buf)
        raw += strip
        remaining -= strip_rows
    if remaining != 0:
        raise TiffError(f"strips cover {height - remaining}/{height} rows")

    if photo == 0:
        return width, height, 1, bytes(255 - b for b in raw)
    if photo == 1:
        return width, height, 1, bytes(raw)
    if photo == 2:
        return width, height, spp, bytes(raw)
    cmap = tags.get(320)
    if not cmap or len(cmap) <= 1:
        raise TiffError("palette photometric without a usable ColorMap")
    third = len(cmap) // 3
    if 3 * third != len(cmap):
        raise TiffError("ColorMap length not divisible by 3")
    out = bytearray()
    for idx in raw:
        if idx >= third:
            raise TiffError(f"palette index {idx} outside ColorMap")
        out += bytes(
            (
                cmap[idx] >> 8,
                cmap[third + idx] >> 8,
                cmap[2 * third + idx] >> 8,
            )
        )
    return width, height, 3, bytes(out)


def page_count(blob: bytes) -> int:
    """Number of IFDs (pages) — reported so multi-page callers can
    detect that ``decode_tiff`` keeps only the first by policy."""
    blob = bytes(blob)
    if blob[:4] == b"II*\x00":
        endian = "<"
    elif blob[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise TiffError("not a TIFF (II*/MM* signature missing)")
    if len(blob) < 8:
        raise TiffError("truncated TIFF header")
    (off,) = struct.unpack_from(endian + "I", blob, 4)
    n = 0
    seen = set()
    while off:
        if off in seen:
            raise TiffError("IFD chain loops")
        seen.add(off)
        _, off = _read_ifd(blob, endian, off)
        n += 1
    return n
