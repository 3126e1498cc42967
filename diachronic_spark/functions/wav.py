"""Pure-stdlib WAV (RIFF PCM) codec — real audio decode for the
multimodal operators, the audio sibling of ``png.py``.

PCM WAV is a length-prefixed RIFF container around raw integer
samples; parsing it needs only ``struct``. Supported: PCM
(format tag 1) at 8-bit unsigned and 16-bit signed, plus the G.711
COMPANDED telephony formats — A-law (tag 6) and µ-law (tag 7), the
standard encodings of call-center/voicemail audio in real corpora —
expanded to 16-bit signed PCM through the ITU G.711 segment tables
(pinned bit-exact against the stdlib ``audioop`` reference for all
256 codes of both laws, tests/test_wav_codec.py). Any channel
count/sample rate; arbitrary extra chunks (LIST/fact/cue) skipped by
their declared length. Rejected loudly (``WavError``): float/ADPCM/
extensible formats, other bit depths, truncated chunks, a data chunk
whose byte length doesn't divide into whole frames.

The stdlib ``wave`` module is a second, independent RIFF
implementation in this container — the unit tests decode
``wave``-written files with this parser and re-parse this encoder's
output with ``wave``, so codec bugs can't cancel out (same trick as
the PNG tests' hand-built spec files).

Scale shape: like PNG, decode is per-payload imperative work that
belongs inside Arrow ``mapInPandas`` batches; sample buffers become
numpy views (int16/uint8) for vectorized feature math and never
outlive their batch.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """(alaw, ulaw) 256-entry int16 expansion tables — the ITU G.711
    segment formulas (Sun g711.c polarity, audioop-pinned)."""
    alaw = np.empty(256, dtype=np.int16)
    ulaw = np.empty(256, dtype=np.int16)
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        alaw[code] = t if (a & 0x80) else -t
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        ulaw[code] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return alaw, ulaw


_ALAW, _ULAW = _g711_tables()


def decode_wav(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PCM WAV payload to
    ``(sample_rate, n_channels, sample_width_bytes, frames)``.

    ``frames`` is the raw interleaved sample buffer exactly as stored
    (8-bit: unsigned; 16-bit: signed little-endian) — stable bytes,
    hashable by an oracle.
    """
    blob = bytes(blob)
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("bad RIFF/WAVE header")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    if riff_size + 8 > len(blob):
        raise WavError("declared RIFF size exceeds payload")
    off, n = 12, min(len(blob), riff_size + 8)
    fmt = None
    data = None
    while off + 8 <= n:
        ctype = blob[off : off + 4]
        (clen,) = struct.unpack("<I", blob[off + 4 : off + 8])
        if off + 8 + clen > n:
            # bound bodies by the DECLARED RIFF size, not the blob —
            # a chunk spilling past it is a truncated/corrupt
            # container even when trailing bytes exist (review r6)
            raise WavError(f"truncated {ctype!r} chunk")
        body = blob[off + 8 : off + 8 + clen]
        if ctype == b"fmt ":
            if fmt is not None:
                # last-wins would silently decode the wrong stream; a
                # well-formed WAV has exactly one of each (ADVICE r6)
                raise WavError("duplicate fmt chunk")
            if clen < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            if data is not None:
                raise WavError("duplicate data chunk")
            data = body
        # all other chunks (LIST, fact, cue, ...) skip by length
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag not in (1, 6, 7):
        raise WavError(
            "only PCM (format 1) and G.711 A-law/µ-law (6/7) "
            f"supported, got format tag {tag}"
        )
    if channels < 1:
        raise WavError("zero channels")
    if tag in (6, 7):
        # G.711: 8-bit companded codes, expanded to 16-bit signed PCM
        if bits != 8:
            raise WavError(f"G.711 streams are 8-bit, got {bits}")
        if block_align != channels:
            raise WavError(
                f"block align {block_align} != channels {channels}"
            )
        if len(data) % block_align:
            raise WavError(
                f"data length {len(data)} is not whole frames of "
                f"{block_align}"
            )
        table = _ALAW if tag == 6 else _ULAW
        codes = np.frombuffer(data, dtype=np.uint8)
        return rate, channels, 2, table[codes].astype("<i2").tobytes()
    if bits not in (8, 16):
        raise WavError(f"only 8/16-bit PCM supported, got {bits}")
    width = bits // 8
    if block_align != channels * width:
        raise WavError(
            f"block align {block_align} != channels*width "
            f"{channels * width}"
        )
    if len(data) % block_align:
        raise WavError(
            f"data length {len(data)} is not whole frames of "
            f"{block_align}"
        )
    return rate, channels, width, data


def encode_wav(
    sample_rate: int, channels: int, width: int, frames: bytes
) -> bytes:
    """Encode raw interleaved PCM samples as a canonical WAV: RIFF +
    16-byte fmt + data, no ancillary chunks — byte-deterministic."""
    if width not in (1, 2):
        raise WavError(f"only widths 1/2 supported, got {width}")
    block = channels * width
    if channels < 1 or len(frames) % block:
        raise WavError("frames not whole blocks")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block, block, width * 8,
    )
    pad = b"\x00" if len(frames) & 1 else b""
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def samples_as_array(width: int, channels: int, frames: bytes) -> np.ndarray:
    """View the raw buffer as (n_frames, channels) integers —
    8-bit as unsigned (the WAV convention), 16-bit as signed LE."""
    dt = np.uint8 if width == 1 else np.dtype("<i2")
    arr = np.frombuffer(frames, dtype=dt)
    return arr.reshape(-1, channels)


def downmix_decimate(
    width: int, channels: int, frames: bytes, every_n: int
) -> bytes:
    """Mono downmix (floor mean across channels — integer math,
    engine-reproducible) then keep every ``every_n``-th frame. The
    audio analog of image resize: it SHRINKS the payload before any
    shuffle."""
    arr = samples_as_array(width, channels, frames)
    mono = (
        arr.astype(np.int64).sum(axis=1) // channels
    )[::every_n]
    dt = np.uint8 if width == 1 else np.dtype("<i2")
    return mono.astype(dt).tobytes()


def window_size(n_frames: int, n_fft_max: int = 512) -> int:
    """The declared spectral-analysis window policy (q168): largest
    power of two <= min(n_fft_max, n_frames). Lives ENGINE-side;
    the truth fixture replays it by importing from here — the
    dependency may only point fixture -> engine, never back."""
    n = min(n_fft_max, n_frames)
    p = 1
    while p * 2 <= n:
        p *= 2
    return p
