"""Pure-stdlib PNG codec (struct + zlib) — the real image decode the
multimodal operators run inside their Arrow ``mapInPandas`` batches.

The container ships no image libraries (no PIL/ffmpeg), but PNG's
critical path is just DEFLATE plus five per-scanline byte filters, both
fully specified (RFC 2083 / the W3C PNG spec) and implementable from
the stdlib alone — the same judgment call as ``sources/sevenzip.py``'s
pure-stdlib 7z reader. Supported: bit depth 8, color types 0
(grayscale), 2 (RGB), 3 (palette, expanded to RGB on decode), 4
(gray+alpha), 6 (RGBA), non-interlaced, multi-IDAT streams, chunk CRC
verification. Rejected loudly (``PngError``): other bit depths, Adam7
interlacing, tRNS transparency on palette images, unknown critical
chunks, CRC mismatches, wrong pixel-buffer sizes.

Scale shape: decoding is inherently per-image imperative work — it
belongs inside an Arrow-batched ``mapInPandas`` (one Python call per
batch, images decoded with bounded numpy temporaries), never in a
row-at-a-time UDF. The filters' horizontal dependency (Sub/Paeth need
the reconstructed left neighbor) makes full vectorization impossible,
but filter 0 (None) and 2 (Up) — the common rows — are whole-row numpy
ops; only Sub/Average/Paeth rows fall back to the sequential loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel as STORED in the file
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunks(blob: bytes):
    if blob[:8] != SIGNATURE:
        raise PngError("bad PNG signature")
    off, n = 8, len(blob)
    while off + 8 <= n:
        (length,) = struct.unpack(">I", blob[off : off + 4])
        ctype = blob[off + 4 : off + 8]
        data = blob[off + 8 : off + 8 + length]
        if len(data) != length or off + 12 + length > n:
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", blob[off + 8 + length : off + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        off += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND chunk")


def chunk(ctype: bytes, data: bytes) -> bytes:
    """Frame one PNG chunk: length + type + data + CRC32(type+data).
    Shared by the encoder and the fixture tool (the codec TESTS keep
    their own copy on purpose — independent spec-level construction)."""
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse the per-scanline filters into reconstructed sample bytes.

    ``raw`` is the decompressed datastream: height rows of
    (1 filter byte + stride sample bytes).
    """
    if len(raw) != height * (1 + stride):
        raise PngError(
            f"decompressed size {len(raw)} != expected "
            f"{height * (1 + stride)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (1 + stride)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up — vectorizable: no horizontal dependency
            row += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential
            r = row.tolist()
            pv = prev.tolist()
            for x in range(stride):
                left = r[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    r[x] = (r[x] + left) & 0xFF
                elif ftype == 3:
                    r[x] = (r[x] + ((left + pv[x]) >> 1)) & 0xFF
                else:
                    ul = pv[x - bpp] if x >= bpp else 0
                    r[x] = (r[x] + _paeth(left, pv[x], ul)) & 0xFF
            row = np.array(r, dtype=np.uint8)
        else:
            raise PngError(f"unknown filter type {ftype} on row {y}")
        out[y] = row
        prev = row
    return out.tobytes()


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG payload to ``(width, height, channels, pixels)``.

    ``pixels`` is the interleaved 8-bit sample buffer, row-major;
    palette images come back expanded to 3-channel RGB (so
    ``channels`` is the DECODED sample count, not the stored one).
    """
    blob = bytes(blob)
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        elif ctype == b"tRNS":
            raise PngError("tRNS transparency is not supported")
        elif not (ctype[0] & 0x20):  # uppercase first letter = critical
            raise PngError(f"unknown critical chunk {ctype!r}")
        # ancillary chunks (tEXt, gAMA, ...) are skipped
    if ihdr is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise PngError(f"bad dimensions {width}x{height}")
    if depth != 8:
        raise PngError(f"only bit depth 8 supported, got {depth}")
    if ctype_ not in _SAMPLES:
        raise PngError(f"unsupported color type {ctype_}")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlacing is not supported")
    samples = _SAMPLES[ctype_]
    # Bound the inflate by the size IHDR implies: a hostile payload can
    # declare a tiny image but carry a multi-GB DEFLATE stream, and an
    # unbounded zlib.decompress would materialize all of it before
    # _unfilter's size check ever runs. decode() is the general media
    # path for untrusted web-corpus bytes, so cap at the exact expected
    # size and reject any stream that holds more.
    expected = height * (1 + width * samples)
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected)
    if dec.unconsumed_tail or dec.decompress(b"", 1):
        raise PngError("IDAT inflates past the size IHDR declares")
    pix = _unfilter(raw, height, width * samples, samples)
    if ctype_ == 3:
        if plte is None or len(plte) % 3:
            raise PngError("palette image without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = np.frombuffer(pix, dtype=np.uint8)
        if idx.max(initial=0) >= len(pal):
            raise PngError("palette index out of range")
        return width, height, 3, pal[idx].tobytes()
    return width, height, samples, pix


# encode-side color type per channel count (palette is decode-only)
_CTYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_strategy: str = "cycle",
) -> bytes:
    """Encode an interleaved 8-bit sample buffer as a PNG.

    ``filter_strategy``: "none" writes filter 0 rows; "cycle" rotates
    through all five filter types by row index (deterministic, and it
    keeps every decoder filter path exercised by round-trip fixtures).
    Output is byte-deterministic: fixed zlib level, no ancillary
    chunks.
    """
    if channels not in _CTYPE_FOR_CHANNELS:
        raise PngError(f"cannot encode {channels}-channel pixels")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError(
            f"pixel buffer {len(pixels)} != {stride * height} "
            f"({width}x{height}x{channels})"
        )
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    bpp = channels
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = arr[y]
        f = 0 if filter_strategy == "none" else y % 5
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            left = np.concatenate(
                [np.zeros(bpp, dtype=np.uint8), row[:-bpp]]
            ) if stride > bpp else np.zeros(stride, dtype=np.uint8)
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            left = np.concatenate(
                [np.zeros(bpp, dtype=np.uint8), row[:-bpp]]
            ) if stride > bpp else np.zeros(stride, dtype=np.uint8)
            filt = row - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
            ).astype(np.uint8)
        else:  # Paeth — sequential predictor, but filtering is not:
            # the predictor reads RECONSTRUCTED (original) neighbors,
            # all known at encode time, so it vectorizes per-row
            r = row.tolist()
            pv = prev.tolist()
            filt = np.array(
                [
                    (
                        r[x]
                        - _paeth(
                            r[x - bpp] if x >= bpp else 0,
                            pv[x],
                            pv[x - bpp] if x >= bpp else 0,
                        )
                    )
                    & 0xFF
                    for x in range(stride)
                ],
                dtype=np.uint8,
            )
        lines.append(f)
        lines.extend(filt.tobytes())
        prev = row
    comp = zlib.compress(bytes(lines), 9)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _CTYPE_FOR_CHANNELS[channels],
        0, 0, 0,
    )
    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes,
    new_width: int, new_height: int,
) -> bytes:
    """Nearest-neighbor resample: output pixel (i, j) reads source
    pixel (floor(i*h/new_h), floor(j*w/new_w)) — the standard
    index-mapping form, exactly reproducible by any engine doing the
    same integer floor math (what makes the resized fixtures
    oracle-checkable by hash)."""
    src = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return src[ys][:, xs].tobytes()
