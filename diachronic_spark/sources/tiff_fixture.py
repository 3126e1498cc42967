"""Deterministic baseline-TIFF fixture.

Seven files covering the container's axes: both byte orders (II and
MM), gray / inverted gray (WhiteIsZero) / RGB / RGBA-extra-sample /
palette photometrics, Compression none / PackBits / TIFF-LZW (with
and without horizontal-differencing Predictor 2), multi-strip
layout (RowsPerStrip < height), odd dims, a 16-bit ColorMap whose
LOW bytes are deliberate junk (pinning the high-byte rule), and a
multi-page file whose second IFD must be ignored by the declared
first-page policy.

Independence structure: the TRUTH rows are computed from the raw
display-pixel formulas with plain loop math BEFORE any container
assembly; the assembler below builds IFDs, strips, PackBits runs
and the MSB-first early-change LZW stream byte-by-byte, sharing no
code with functions/tiff.py.
"""

from __future__ import annotations

import hashlib
import os
import struct

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
TIFFS_DIR = os.path.join(_HERE, "fixtures", "tiff")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "tiff_truth.parquet")


def _px(img_id: int, x: int, y: int, k: int) -> int:
    return (img_id * 37 + y * 19 + x * 11 + k * 71 + 23) % 256


def _pal_idx(img_id: int, x: int, y: int, n: int) -> int:
    return (img_id + x * 5 + y * 3) % n


# (w, h, photo, spp, comp, predictor, endian, rows_per_strip, extra)
# photo: 0 WhiteIsZero, 1 gray, 2 RGB, 3 palette; comp: 1/5/32773
_CONFIGS = [
    {"w": 16, "h": 16, "photo": 1, "spp": 1, "comp": 1, "pred": 1,
     "endian": "<", "rps": 16},
    {"w": 13, "h": 7, "photo": 0, "spp": 1, "comp": 32773, "pred": 1,
     "endian": ">", "rps": 7},
    {"w": 12, "h": 10, "photo": 2, "spp": 3, "comp": 1, "pred": 1,
     "endian": "<", "rps": 4},                      # 3 strips
    {"w": 17, "h": 9, "photo": 2, "spp": 3, "comp": 5, "pred": 2,
     "endian": "<", "rps": 9},
    {"w": 8, "h": 8, "photo": 3, "spp": 1, "comp": 32773, "pred": 1,
     "endian": ">", "rps": 8, "pal_n": 6},
    {"w": 10, "h": 6, "photo": 2, "spp": 4, "comp": 5, "pred": 1,
     "endian": ">", "rps": 3},                      # RGBA, 2 strips
    {"w": 6, "h": 4, "photo": 1, "spp": 1, "comp": 1, "pred": 1,
     "endian": "<", "rps": 4, "pages": 2},
]


def _display_pixels(img_id: int, cfg: dict) -> bytes:
    """The decoded (display) pixel buffer — the pre-assembly truth."""
    w, h, spp = cfg["w"], cfg["h"], cfg["spp"]
    out = bytearray()
    if cfg["photo"] == 3:
        n = cfg["pal_n"]
        pal = [
            tuple(_px(img_id, i, 0, k) for k in range(3))
            for i in range(n)
        ]
        for y in range(h):
            for x in range(w):
                out += bytes(pal[_pal_idx(img_id, x, y, n)])
    else:
        for y in range(h):
            for x in range(w):
                for k in range(spp):
                    out += bytes((_px(img_id, x, y, k),))
    return bytes(out)


def _stored_samples(img_id: int, cfg: dict) -> bytes:
    """The sample values the container stores (pre-photometric)."""
    w, h, spp = cfg["w"], cfg["h"], cfg["spp"]
    out = bytearray()
    for y in range(h):
        for x in range(w):
            if cfg["photo"] == 3:
                out += bytes((_pal_idx(img_id, x, y, cfg["pal_n"]),))
            elif cfg["photo"] == 0:
                out += bytes((255 - _px(img_id, x, y, 0),))
            else:
                for k in range(spp):
                    out += bytes((_px(img_id, x, y, k),))
    return bytes(out)


def _packbits(data: bytes) -> bytes:
    """Independent PackBits encoder: greedy 3+ repeat runs."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes((257 - run, data[i]))
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes((i - lit_start - 1,)) + data[lit_start:i]
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int):
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(self.buf)


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW encoder: MSB-first, Clear=256, EOI=257,
    EARLY code-width change (width bumps when the next code to be
    assigned reaches 2^w - 1)."""
    bw = _BitWriter()
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    bw.put(256, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        bw.put(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4093:
            bw.put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        bw.put(table[w], width)
    bw.put(257, width)
    return bw.done()


def _predict2(data: bytes, w: int, spp: int, h: int) -> bytes:
    out = bytearray(data)
    row_bytes = w * spp
    for r in range(h):
        base = r * row_bytes
        for x in range(row_bytes - 1, spp - 1, -1):
            out[base + x] = (out[base + x] - out[base + x - spp]) & 0xFF
    return bytes(out)


def _entry(e: str, tag: int, typ: int, vals: list, heap, heap_base):
    sizes = {3: 2, 4: 4}
    size = sizes[typ] * len(vals)
    fmt = {3: "H", 4: "I"}[typ]
    raw = struct.pack(e + fmt * len(vals), *vals)
    if size <= 4:
        return (
            struct.pack(e + "HHI", tag, typ, len(vals))
            + raw.ljust(4, b"\x00")
        )
    off = heap_base + len(heap)
    heap += raw
    return struct.pack(e + "HHII", tag, typ, len(vals), off)


def build_tiff(img_id: int, cfg: dict) -> bytes:
    """Byte-level assembly, independent of the decoder."""
    e = cfg["endian"]
    w, h, spp = cfg["w"], cfg["h"], cfg["spp"]
    stored = _stored_samples(img_id, cfg)
    row_bytes = w * spp
    rps = cfg["rps"]
    strips = []
    for top in range(0, h, rps):
        rows = min(rps, h - top)
        raw = stored[top * row_bytes : (top + rows) * row_bytes]
        if cfg["pred"] == 2:
            raw = _predict2(raw, w, spp, rows)
        if cfg["comp"] == 1:
            strips.append(raw)
        elif cfg["comp"] == 32773:
            strips.append(_packbits(raw))
        else:
            strips.append(_lzw_encode(raw))

    pages = cfg.get("pages", 1)
    # layout: header | strip data (page 1) | IFD1 | heap1 | [IFD2 heap2]
    strip_off = 8
    offsets, counts = [], []
    pos = strip_off
    for s in strips:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)
    ifd1_off = pos
    header = struct.pack(
        e + "2sHI", b"II" if e == "<" else b"MM", 42, ifd1_off
    )

    def build_ifd(ifd_off: int, next_off: int) -> bytes:
        fields = [
            (256, 3, [w]), (257, 3, [h]),
            (258, 3, [8] * spp),
            (259, 3, [cfg["comp"]]),
            (262, 3, [cfg["photo"]]),
            (273, 4, offsets),
            (277, 3, [spp]),
            (278, 3, [rps]),
            (279, 4, counts),
            (284, 3, [1]),
        ]
        if cfg["pred"] == 2:
            fields.append((317, 3, [2]))
        if cfg["photo"] == 3:
            n = cfg["pal_n"]
            cmap = []
            for k in range(3):
                for i in range(n):
                    # high byte = the truth channel; low byte = junk
                    cmap.append(
                        (_px(img_id, i, 0, k) << 8)
                        | ((img_id + i * 13 + k) % 256)
                    )
            fields.append((320, 3, cmap))
        if spp == 4:
            fields.append((338, 3, [2]))  # unassociated alpha
        fields.sort()
        n_e = len(fields)
        heap_base = ifd_off + 2 + 12 * n_e + 4
        heap = bytearray()
        body = struct.pack(e + "H", n_e)
        for tag, typ, vals in fields:
            body += _entry(e, tag, typ, vals, heap, heap_base)
        body += struct.pack(e + "I", next_off)
        return body + bytes(heap)

    if pages == 1:
        ifd1 = build_ifd(ifd1_off, 0)
        return header + b"".join(strips) + ifd1
    # multi-page: page 2 is a tiny uncompressed gray IFD reusing the
    # same strip data slice (content irrelevant — must be IGNORED)
    ifd1 = build_ifd(ifd1_off, 0)  # sized probe to find ifd2 offset
    ifd2_off = ifd1_off + len(ifd1)
    ifd1 = build_ifd(ifd1_off, ifd2_off)
    assert len(ifd1) == ifd2_off - ifd1_off
    n2 = 8
    ifd2 = struct.pack(e + "H", n2)
    for tag, typ, vals in sorted(
        [
            (256, 3, [2]), (257, 3, [2]), (258, 3, [8]),
            (259, 3, [1]), (262, 3, [1]), (273, 4, [strip_off]),
            (278, 3, [2]), (279, 4, [4]),
        ]
    ):
        ifd2 += _entry(e, tag, typ, vals, bytearray(), 0)
    ifd2 += struct.pack(e + "I", 0)
    return header + b"".join(strips) + ifd1 + ifd2


def generate_tiffs() -> list:
    out = []
    for img_id, cfg in enumerate(_CONFIGS):
        out.append(
            {
                "img_id": img_id,
                "cfg": cfg,
                "blob": build_tiff(img_id, cfg),
            }
        )
    return out


def truth_row(t: dict) -> dict:
    """Adjudicated features from the pre-assembly display pixels —
    plain loops, no codec."""
    img_id, cfg = t["img_id"], t["cfg"]
    pix = _display_pixels(img_id, cfg)
    ch = {0: 1, 1: 1, 2: cfg["spp"], 3: 3}[cfg["photo"]]
    sums = [0, 0, 0, 0]
    for i in range(0, len(pix), ch):
        for k in range(ch):
            sums[k] += pix[i + k]
    return {
        "img_id": img_id,
        "width": cfg["w"],
        "height": cfg["h"],
        "channels": ch,
        "n_pages": cfg.get("pages", 1),
        "pix_sha": hashlib.sha256(pix).hexdigest(),
        "sum_c0": sums[0],
        "sum_c1": sums[1] if ch >= 3 else None,
        "sum_c2": sums[2] if ch >= 3 else None,
        "sum_c3": sums[3] if ch == 4 else None,
    }
