"""Deterministic WAV audio fixture (FIXTURES.md §6).

24 short PCM clips — {8-bit unsigned, 16-bit signed} x {mono, stereo}
x {8 kHz, 16 kHz, 44.1 kHz} x length edges (1 frame up to 997) — with
signal patterns that actually cross the midline (so zero-crossing
counts are non-trivial).

The fixture FILES are written by the stdlib ``wave`` module — an
independent RIFF implementation — while the engine decodes them with
its own parser (``functions/wav.py``), so q145 adjudicates the
decoder against a second implementation AND against the truth table
computed here from the raw sample values with plain loop math
(no codec, no numpy).
"""

from __future__ import annotations

import hashlib
import os
import struct

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CLIPS_DIR = os.path.join(_HERE, "fixtures", "wav")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "wav_truth.parquet")

RATES = (8000, 16000, 44100)
LENGTHS = (1, 2, 5, 100, 997)
EVERY_N = 4  # q146's decimation stride


def _sample(clip_id: int, i: int, c: int, width: int) -> int:
    """Deterministic midline-crossing pattern (triangle-ish)."""
    if width == 1:  # unsigned 8-bit around 128
        return (clip_id * 37 + i * 11 + c * 53) % 256
    # signed 16-bit around 0
    return ((clip_id * 7919 + i * 131 + c * 977) % 4001) - 2000


def generate_clips() -> list[dict]:
    out = []
    clip_id = 0
    combos = [
        (w, ch, r)
        for w in (1, 2)
        for ch in (1, 2)
        for r in RATES
    ]
    for j, (w, ch, r) in enumerate(combos):
        for n in (LENGTHS[j % len(LENGTHS)], LENGTHS[(j + 2) % len(LENGTHS)]):
            vals = [
                [_sample(clip_id, i, c, w) for c in range(ch)]
                for i in range(n)
            ]
            if w == 1:
                frames = bytes(v for f in vals for v in f)
            else:
                frames = b"".join(
                    struct.pack("<h", v) for f in vals for v in f
                )
            out.append(
                {
                    "clip_id": clip_id,
                    "rate": r,
                    "channels": ch,
                    "width": w,
                    "n_frames": n,
                    "values": vals,
                    "frames": frames,
                }
            )
            clip_id += 1
    return out


def truth_row(clip: dict) -> dict:
    """Ground-truth features from the raw sample VALUES with plain
    loop math — the codec never touches this path."""
    vals, w, ch = clip["values"], clip["width"], clip["channels"]
    mid = 128 if w == 1 else 0
    sumsq = [sum(f[c] * f[c] for f in vals) for c in range(ch)]
    zc = sum(
        1
        for a, b in zip(vals, vals[1:])
        if (a[0] >= mid) != (b[0] >= mid)
    )
    # independent downmix replay: floor mean across channels, every
    # EVERY_N-th frame, re-packed with the same stored convention
    mono = [sum(f) // ch for f in vals][::EVERY_N]
    if w == 1:
        dm = bytes(mono)
    else:
        dm = b"".join(struct.pack("<h", v) for v in mono)
    return {
        "clip_id": clip["clip_id"],
        "sample_rate": clip["rate"],
        "n_channels": ch,
        "sample_width": w,
        "n_frames": clip["n_frames"],
        "frames_sha": hashlib.sha256(clip["frames"]).hexdigest(),
        "sumsq_c0": sumsq[0],
        "sumsq_c1": sumsq[1] if ch >= 2 else None,
        "zero_cross": zc,
        "dm_sample_rate": clip["rate"] // EVERY_N,
        "dm_n_frames": len(mono),
        "dm_frames_sha": hashlib.sha256(dm).hexdigest(),
        "dm_sumsq": sum(v * v for v in mono),
    }


# --- G.711 companded clips (A-law / µ-law, round 8) -------------------------
# Separate fixture set (fixtures/wav_g711/, fixtures/g711_truth.parquet)
# so the committed PCM truth above stays byte-stable. The container is
# assembled HERE byte-by-byte (16-byte fmt with tag 6/7 plus a `fact`
# chunk, as real G.711 writers emit); truth expands the code bytes
# with the pure-Python ITU formulas below — independent loop math the
# numpy-table decoder must reproduce bit-for-bit (and both are pinned
# against stdlib audioop for all 256 codes in tests).

G711_DIR = os.path.join(_HERE, "fixtures", "wav_g711")
G711_TRUTH_PATH = os.path.join(_HERE, "fixtures", "g711_truth.parquet")


def _alaw_to_linear(code: int) -> int:
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _ulaw_to_linear(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _g711_code(clip_id: int, i: int, c: int) -> int:
    # sweeps all 256 codes across a clip (i*strides coprime with 256)
    return (clip_id * 41 + i * 13 + c * 97) % 256


# (tag, channels, rate, n_frames); 6 = A-law, 7 = µ-law
_G711_CONFIGS = [
    (7, 1, 8000, 300),
    (7, 2, 8000, 257),
    (6, 1, 8000, 300),
    (6, 2, 16000, 513),
    (7, 1, 16000, 1),
    (6, 1, 8000, 997),
]


def generate_g711_clips() -> list[dict]:
    out = []
    for clip_id, (tag, ch, rate, n) in enumerate(_G711_CONFIGS):
        codes = [
            [_g711_code(clip_id, i, c) for c in range(ch)]
            for i in range(n)
        ]
        data = bytes(v for f in codes for v in f)
        fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch, ch, 8)
        fact = struct.pack("<I", n)
        pad = b"\x00" if len(data) & 1 else b""
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data + pad
        )
        out.append(
            {
                "clip_id": clip_id,
                "tag": tag,
                "rate": rate,
                "channels": ch,
                "n_frames": n,
                "codes": codes,
                "blob": b"RIFF" + struct.pack("<I", len(body)) + body,
            }
        )
    return out


def g711_truth_row(clip: dict) -> dict:
    """Features of the EXPANDED 16-bit signal, from the code bytes via
    the pure-Python ITU formulas — plain loops, no numpy, no codec."""
    expand = _alaw_to_linear if clip["tag"] == 6 else _ulaw_to_linear
    vals = [[expand(v) for v in f] for f in clip["codes"]]
    ch = clip["channels"]
    buf = bytearray()
    for f in vals:
        for v in f:
            buf += struct.pack("<h", v)
    sumsq = [sum(f[c] * f[c] for f in vals) for c in range(ch)]
    zc = sum(
        1 for a, b in zip(vals, vals[1:]) if (a[0] >= 0) != (b[0] >= 0)
    )
    return {
        "clip_id": clip["clip_id"],
        "law": "alaw" if clip["tag"] == 6 else "ulaw",
        "sample_rate": clip["rate"],
        "n_channels": ch,
        "sample_width": 2,  # decode contract: expanded 16-bit PCM
        "n_frames": clip["n_frames"],
        "frames_sha": hashlib.sha256(bytes(buf)).hexdigest(),
        "sumsq_c0": sumsq[0],
        "sumsq_c1": sumsq[1] if ch >= 2 else None,
        "zero_cross": zc,
    }
