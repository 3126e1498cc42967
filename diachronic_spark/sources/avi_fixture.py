"""Deterministic AVI/MJPEG video fixture.

Six videos covering the container's axes: grayscale and color frames
(4:4:4 / 4:2:2 / 4:2:0, odd dims off every MCU grid), restart
intervals, '00dc' vs '00db' chunk ids, frames grouped inside LIST
'rec ' (the interleaved-capture layout), JUNK chunks at top level and
inside hdrl, an optional idx1 index, NTSC-style fractional frame
rates (30000/1001), and a second non-video (audio) stream the demux
must route around.

Independence structure (the gif/jpeg fixture pattern): frames are
built by ``jpeg_fixture.build_img`` and the per-frame TRUTH rows come
from ``jpeg_fixture.truth_row`` — a pure loop-math decode of the
quantized coefficient planes that never touches the bitstream, the
JPEG codec, or the AVI demuxer under test. The AVI container is
assembled here byte-by-byte with plain struct packing, independent
of functions/avi.py's parser, so assembly and demux cannot share a
bug.
"""

from __future__ import annotations

import os
import struct

from .jpeg_fixture import build_img, truth_row

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
AVIS_DIR = os.path.join(_HERE, "fixtures", "avi")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "avi_truth.parquet")

# q161's declared frame-sampling stride (the q151 rule: the policy is
# part of the declared query; the oracle filters the truth table by
# the same stride).
VIDEO_EVERY_N = 2

# (n_frames, w, h, color, (h1, v1), qv, rst, (rate, scale), layout)
# layout flags: rec = group frames in LIST 'rec '; db = use '00db'
# chunk ids; idx = append idx1; junk = sprinkle JUNK chunks; audio =
# add a second 'auds' stream with '01wb' chunks the demux must skip.
_CONFIGS = [
    {"n": 3, "w": 16, "h": 16, "color": False, "hv": (1, 1), "qv": 0,
     "rst": 0, "fps": (15, 1), "layout": ()},
    {"n": 4, "w": 24, "h": 16, "color": True, "hv": (2, 2), "qv": 1,
     "rst": 2, "fps": (30000, 1001), "layout": ("idx",)},
    {"n": 5, "w": 17, "h": 11, "color": True, "hv": (2, 1), "qv": 2,
     "rst": 0, "fps": (25, 1), "layout": ("rec", "junk")},
    {"n": 2, "w": 8, "h": 8, "color": True, "hv": (1, 1), "qv": 0,
     "rst": 1, "fps": (10, 1), "layout": ("db",)},
    {"n": 6, "w": 32, "h": 16, "color": False, "hv": (1, 1), "qv": 1,
     "rst": 3, "fps": (12, 1), "layout": ("idx", "junk")},
    {"n": 3, "w": 20, "h": 12, "color": True, "hv": (2, 2), "qv": 2,
     "rst": 0, "fps": (24, 1), "layout": ("audio",)},
]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _avih(cfg: dict, n_streams: int) -> bytes:
    rate, scale = cfg["fps"]
    usec = (scale * 1_000_000) // rate
    return _chunk(
        b"avih",
        struct.pack(
            "<14I", usec, 0, 0, 0x10, cfg["n"], 0, n_streams, 0,
            cfg["w"], cfg["h"], 0, 0, 0, 0,
        ),
    )


def _video_strl(cfg: dict) -> bytes:
    rate, scale = cfg["fps"]
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHH8I",
            0, 0, 0, 0, scale, rate, 0, cfg["n"], 0, 0xFFFFFFFF, 0,
        )
        + struct.pack("<4h", 0, 0, cfg["w"], cfg["h"]),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40, cfg["w"], cfg["h"], 1, 24, b"MJPG",
            cfg["w"] * cfg["h"] * 3, 0, 0, 0, 0,
        ),
    )
    body = strh + strf
    if "junk" in cfg["layout"]:
        body += _chunk(b"JUNK", b"\x00" * 11)
    return _list(b"strl", body)


def _audio_strl() -> bytes:
    """A minimal PCM 'auds' stream header — present only so the demux
    proves it routes by stream type, never decoded."""
    strh = _chunk(
        b"strh",
        b"auds" + b"\x00" * 4
        + struct.pack(
            "<IHH8I", 0, 0, 0, 0, 1, 8000, 0, 160, 0, 0, 2
        )
        + struct.pack("<4h", 0, 0, 0, 0),
    )
    strf = _chunk(
        b"strf", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    )
    return _list(b"strl", strh + strf)


def _frame_seed(video_id: int, frame_idx: int) -> int:
    return 200 + video_id * 20 + frame_idx


def build_avi(video_id: int, cfg: dict) -> dict:
    """Assemble ONE video dict for an arbitrary configuration — the
    committed fixtures use _CONFIGS; the hypothesis fuzz drives this
    directly with generated configs (same frame formulas seeded by
    video_id, same byte-level assembler)."""
    imgs = [
        build_img(
            _frame_seed(video_id, i), cfg["w"], cfg["h"],
            cfg["color"], cfg["hv"], cfg["qv"], cfg["rst"], False,
        )
        for i in range(cfg["n"])
    ]
    layout = cfg["layout"]
    vid_tag = b"00db" if "db" in layout else b"00dc"
    frame_chunks = [_chunk(vid_tag, im["blob"]) for im in imgs]
    audio = "audio" in layout
    if audio:
        # interleave a fake audio chunk after every frame
        frame_chunks = [
            fc + _chunk(b"01wb", bytes(160)) for fc in frame_chunks
        ]
    if "rec" in layout:
        movi_body = b"".join(_list(b"rec ", fc) for fc in frame_chunks)
    else:
        movi_body = b"".join(frame_chunks)
    if "junk" in layout:
        movi_body += _chunk(b"JUNK", b"\x00" * 7)

    n_streams = 2 if audio else 1
    hdrl_body = _avih(cfg, n_streams) + _video_strl(cfg)
    if audio:
        hdrl_body += _audio_strl()
    body = _list(b"hdrl", hdrl_body)
    if "junk" in layout:
        body += _chunk(b"JUNK", b"\x00" * 13)
    movi = _list(b"movi", movi_body)
    body += movi
    if "idx" in layout:
        # idx1 entries: chunk id, flags (0x10 = keyframe), offset
        # from the start of the movi list data, chunk size
        entries = b""
        off = 4
        for im in imgs:
            entries += vid_tag + struct.pack(
                "<III", 0x10, off, len(im["blob"])
            )
            off += 8 + len(im["blob"]) + (len(im["blob"]) & 1)
        body += _chunk(b"idx1", entries)
    blob = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    rate, scale = cfg["fps"]
    return {
        "video_id": video_id,
        "width": cfg["w"],
        "height": cfg["h"],
        "rate": rate,
        "scale": scale,
        "n_frames": cfg["n"],
        "blob": blob,
        "imgs": imgs,
    }


def generate_avis() -> list:
    """One dict per committed video: the assembled container ``blob``
    plus the per-frame img dicts whose quantized planes feed the
    loop-math truth."""
    return [
        build_avi(video_id, cfg) for video_id, cfg in enumerate(_CONFIGS)
    ]


def truth_rows(video: dict) -> list:
    """One adjudicated row per frame — loop-math decode of the
    quantized coefficient planes (jpeg_fixture.truth_row), no codec,
    no demuxer. The oracle filters by the declared stride."""
    rows = []
    for idx, im in enumerate(video["imgs"]):
        t = truth_row(im)
        rows.append(
            {
                "video_id": video["video_id"],
                "frame_idx": idx,
                "n_frames": video["n_frames"],
                "fps_num": video["rate"],
                "fps_den": video["scale"],
                "width": t["width"],
                "height": t["height"],
                "channels": t["channels"],
                "pix_sha": t["pix_sha"],
                "sum_r": t["sum_r"],
                "sum_g": t["sum_g"],
                "sum_b": t["sum_b"],
            }
        )
    return rows
