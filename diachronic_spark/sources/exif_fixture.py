"""Deterministic EXIF-in-JPEG fixture.

Six JPEGs (real decodable streams from the committed JPEG fixture
machinery) whose APP1 metadata covers the extraction axes: both
byte orders, the full tag set (Make/Model/Orientation/DateTime +
Exif-IFD dims/ISO/exposure/f-number rationals), partial tag sets,
NO metadata at all (the NULL-row policy), and a non-Exif APP1 (XMP)
preceding the Exif one (segment routing by signature, not by marker
alone).

Independence structure: metadata is DEFINED as dicts first; truth
rows come straight from the dicts. The APP1/TIFF-IFD bytes are
assembled HERE with an independent two-IFD packer (own struct
layout, out-of-line heap handling) — sharing nothing with
functions/tiff.py's reader or functions/exif.py's walk. Injecting
the segment must not perturb pixels: decode_jpeg(with_exif) ==
decode_jpeg(plain) is test-pinned.
"""

from __future__ import annotations

import os
import struct

from .jpeg_fixture import build_img

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
EXIF_DIR = os.path.join(_HERE, "fixtures", "exif")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "exif_truth.parquet")

_METAS = [
    {  # full set, little-endian
        "endian": "<", "make": "Acme", "model": "SnapCam 9",
        "orientation": 6, "datetime": "2024:05:01 10:20:30",
        "exif_w": 640, "exif_h": 480, "iso": 200,
        "exposure": (1, 250), "fnumber": (28, 10),
    },
    {  # big-endian, IFD0 only
        "endian": ">", "make": "Widget Werke GmbH",
        "model": "Blitz", "orientation": 1,
        "datetime": "2023:12:24 18:00:00",
    },
    None,  # no APP1 at all → NULL row
    {  # Exif IFD only (no make/model/orientation)
        "endian": "<", "exif_w": 32, "exif_h": 16, "iso": 1600,
        "exposure": (1, 30), "fnumber": (56, 10),
    },
    {  # XMP APP1 precedes the Exif APP1
        "endian": "<", "make": "Tri-Corder", "model": "Mk II",
        "orientation": 8, "xmp_first": True,
        "exif_w": 100, "exif_h": 100, "iso": 64,
        "exposure": (1, 1000), "fnumber": (40, 10),
    },
    {  # big-endian full set
        "endian": ">", "make": "Nordlicht", "model": "Aurora",
        "orientation": 3, "datetime": "2025:01:31 23:59:59",
        "exif_w": 4032, "exif_h": 3024, "iso": 100,
        "exposure": (1, 60), "fnumber": (18, 10),
    },
]


def _entries_ifd0(m: dict) -> list:
    e = []
    if "make" in m:
        e.append((271, 2, m["make"].encode() + b"\x00"))
    if "model" in m:
        e.append((272, 2, m["model"].encode() + b"\x00"))
    if "orientation" in m:
        e.append((274, 3, m["orientation"]))
    if "datetime" in m:
        e.append((306, 2, m["datetime"].encode() + b"\x00"))
    return e


def _entries_exif(m: dict) -> list:
    e = []
    if "exposure" in m:
        e.append((33434, 5, m["exposure"]))
    if "fnumber" in m:
        e.append((33437, 5, m["fnumber"]))
    if "iso" in m:
        e.append((34855, 3, m["iso"]))
    if "exif_w" in m:
        e.append((40962, 3, m["exif_w"]))
    if "exif_h" in m:
        e.append((40963, 3, m["exif_h"]))
    return e


def _pack_ifd(endian: str, entries: list, ifd_off: int, next_ifd: int):
    """Independent IFD packer: 12-byte entries sorted by tag, 4-byte
    next pointer, out-of-line heap for ASCII > 4 and RATIONALs."""
    entries = sorted(entries)
    heap_base = ifd_off + 2 + 12 * len(entries) + 4
    heap = bytearray()
    body = struct.pack(endian + "H", len(entries))
    for tag, typ, val in entries:
        if typ == 3:
            body += struct.pack(endian + "HHI", tag, typ, 1)
            body += struct.pack(endian + "H", val) + b"\x00\x00"
        elif typ == 4:
            body += struct.pack(endian + "HHII", tag, typ, 1, val)
        elif typ == 2:
            if len(val) <= 4:
                body += struct.pack(endian + "HHI", tag, typ, len(val))
                body += val.ljust(4, b"\x00")
            else:
                body += struct.pack(
                    endian + "HHII", tag, typ, len(val),
                    heap_base + len(heap),
                )
                heap += val
        elif typ == 5:
            body += struct.pack(
                endian + "HHII", tag, typ, 1, heap_base + len(heap)
            )
            heap += struct.pack(endian + "II", *val)
    body += struct.pack(endian + "I", next_ifd)
    return bytes(body) + bytes(heap)


def _tiff_block(m: dict) -> bytes:
    endian = m["endian"]
    ifd0 = _entries_ifd0(m)
    exif = _entries_exif(m)
    if exif:
        # two-pass: size IFD0 with a placeholder pointer first
        probe = _pack_ifd(
            endian, ifd0 + [(34665, 4, 0)], 8, 0
        )
        exif_off = 8 + len(probe)
        ifd0 = ifd0 + [(34665, 4, exif_off)]
    hdr = struct.pack(
        endian + "2sHI", b"II" if endian == "<" else b"MM", 42, 8
    )
    out = hdr + _pack_ifd(endian, ifd0, 8, 0)
    if exif:
        assert len(out) == exif_off
        out += _pack_ifd(endian, exif, exif_off, 0)
    return out


def _app1(payload: bytes, sig: bytes = b"Exif\x00\x00") -> bytes:
    seg = sig + payload
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def build_jpeg(img_id: int, meta: dict | None) -> bytes:
    base = build_img(700 + img_id, 8, 8, False, (1, 1), 0, 0, False)[
        "blob"
    ]
    if meta is None:
        return base
    inject = b""
    if meta.get("xmp_first"):
        inject += _app1(
            b"<x:xmpmeta>decoy</x:xmpmeta>",
            sig=b"http://ns.adobe.com/xap/1.0/\x00",
        )
    inject += _app1(_tiff_block(meta))
    return base[:2] + inject + base[2:]


def generate_exif_jpegs() -> list:
    return [
        {
            "img_id": i,
            "meta": m,
            "blob": build_jpeg(i, m),
        }
        for i, m in enumerate(_METAS)
    ]


def truth_row(j: dict) -> dict:
    m = j["meta"] or {}
    exp = m.get("exposure", (None, None))
    fnum = m.get("fnumber", (None, None))
    return {
        "img_id": j["img_id"],
        "make": m.get("make"),
        "model": m.get("model"),
        "orientation": m.get("orientation"),
        "datetime": m.get("datetime"),
        "exif_w": m.get("exif_w"),
        "exif_h": m.get("exif_h"),
        "iso": m.get("iso"),
        "exposure_num": exp[0],
        "exposure_den": exp[1],
        "fnumber_num": fnum[0],
        "fnumber_den": fnum[1],
    }
