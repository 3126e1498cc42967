"""WAV codec unit tests (functions/wav.py).

The stdlib ``wave`` module is the independent reference: our parser
reads its output, it reads our encoder's output — compensating-bug
pairs can't pass. Malformed-input rejection is tested on hand-built
RIFF bytes.
"""

from __future__ import annotations

import io
import struct
import wave

import pytest

from diachronic_spark.functions.wav import (
    WavError,
    decode_wav,
    downmix_decimate,
    encode_wav,
    samples_as_array,
)


def _stdlib_wav(rate, channels, width, frames) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


@pytest.mark.parametrize("width", [1, 2])
@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("n", [1, 7, 500])
def test_decode_stdlib_written_files(width, channels, n):
    if width == 1:
        frames = bytes((i * 13 + 5) % 256 for i in range(n * channels))
    else:
        frames = b"".join(
            struct.pack("<h", ((i * 791) % 4001) - 2000)
            for i in range(n * channels)
        )
    blob = _stdlib_wav(16000, channels, width, frames)
    assert decode_wav(blob) == (16000, channels, width, frames)


def test_encoder_output_parses_with_stdlib_wave():
    frames = b"".join(struct.pack("<h", v) for v in (-3, 0, 3, 32767, -32768, 9))
    blob = encode_wav(44100, 2, 2, frames)
    with wave.open(io.BytesIO(blob)) as w:
        assert (
            w.getframerate(), w.getnchannels(), w.getsampwidth(),
        ) == (44100, 2, 2)
        assert w.readframes(w.getnframes()) == frames
    # odd-length 8-bit data: RIFF chunks are word-aligned (pad byte)
    blob8 = encode_wav(8000, 1, 1, bytes([1, 2, 3]))
    assert decode_wav(blob8) == (8000, 1, 1, bytes([1, 2, 3]))


def test_decode_skips_extra_chunks():
    """LIST/fact chunks between fmt and data must be skipped by
    declared length (hand-built RIFF)."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([10, 200, 30, 250])
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
        + b"data" + struct.pack("<I", 4) + data
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(blob) == (8000, 1, 1, data)


def test_decode_rejects_malformed():
    with pytest.raises(WavError, match="RIFF"):
        decode_wav(b"OggS\x00\x00")
    # float PCM (format 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(WavError, match="format"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # partial frame: 3 bytes of 16-bit stereo (block 4)
    ok = encode_wav(8000, 2, 2, struct.pack("<hh", 1, 2))
    fmt16 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt16
        + b"data" + struct.pack("<I", 3) + b"\x01\x02\x03"
    )
    with pytest.raises(WavError, match="whole frames"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(WavError, match="truncated|exceeds"):
        decode_wav(ok[:-3])
    with pytest.raises(WavError, match="widths 1/2"):
        encode_wav(8000, 1, 3, b"\x00\x00\x00")


def test_decode_rejects_duplicate_fmt_and_data_chunks():
    """A second fmt/data chunk must be rejected, not last-wins
    (ADVICE r6): silently decoding only the second data chunk
    diverges from the 'rejected loudly' contract."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    d1, d2 = bytes([1, 2]), bytes([9, 8])
    body2data = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 2) + d1
        + b"data" + struct.pack("<I", 2) + d2
    )
    with pytest.raises(WavError, match="duplicate data"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body2data)) + body2data)
    body2fmt = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 2) + d1
    )
    with pytest.raises(WavError, match="duplicate fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body2fmt)) + body2fmt)


def test_downmix_decimate_integer_math():
    # stereo 16-bit: floor mean, negative-aware (Python // floors)
    frames = b"".join(
        struct.pack("<hh", a, b)
        for a, b in [(-5, 2), (10, 11), (7, 7), (-1, 0), (100, -99)]
    )
    out = downmix_decimate(2, 2, frames, 2)
    vals = [v[0] for v in samples_as_array(2, 1, out)]
    assert vals == [(-5 + 2) // 2, (7 + 7) // 2, (100 - 99) // 2]
    # mono passthrough with stride 1 is identity
    mono = struct.pack("<hhh", 4, -4, 9)
    assert downmix_decimate(2, 1, mono, 1) == mono


def test_roundtrip_property_fuzz():
    """Hypothesis fuzz: our encoder vs the stdlib wave reader AND our
    reader vs the stdlib wave writer, over arbitrary PCM buffers."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        width=st.sampled_from([1, 2]),
        channels=st.integers(1, 4),
        n=st.integers(0, 200),
        rate=st.sampled_from([8000, 22050, 48000]),
        data=st.data(),
    )
    def check(width, channels, n, rate, data):
        nbytes = n * channels * width
        frames = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=nbytes, max_size=nbytes
                )
            )
        )
        ours = encode_wav(rate, channels, width, frames)
        with wave.open(io.BytesIO(ours)) as w:
            assert w.readframes(w.getnframes()) == frames
            assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
                channels, width, rate,
            )
        theirs = _stdlib_wav(rate, channels, width, frames)
        assert decode_wav(theirs) == (rate, channels, width, frames)

    check()


def test_decode_rejects_chunk_past_declared_riff_size():
    """A chunk whose body spills past the DECLARED RIFF size is a
    truncated container even when trailing bytes physically exist."""
    frames = struct.pack("<hh", 1, 2)
    ok = encode_wav(8000, 2, 2, frames)
    # shrink the declared RIFF size to cover only WAVE+fmt (36 bytes):
    # the data chunk now extends past the declared payload
    bad = ok[:4] + struct.pack("<I", 36) + ok[8:]
    with pytest.raises(WavError, match="truncated|missing"):
        decode_wav(bad)


# --- G.711 A-law / µ-law (round 8) ----------------------------------------

def test_g711_tables_match_audioop_all_codes():
    """The ITU segment-table expansion must agree with the stdlib
    audioop reference (an independent C implementation) for every
    code of both laws — the strongest available in-container pin."""
    audioop = pytest.importorskip("audioop")
    import struct as _s

    from diachronic_spark.functions.wav import _ALAW, _ULAW

    for code in range(256):
        (a_ref,) = _s.unpack("<h", audioop.alaw2lin(bytes([code]), 2))
        (u_ref,) = _s.unpack("<h", audioop.ulaw2lin(bytes([code]), 2))
        assert int(_ALAW[code]) == a_ref, f"alaw code {code}"
        assert int(_ULAW[code]) == u_ref, f"ulaw code {code}"


def test_g711_fixture_bit_exact_vs_loop_truth():
    import hashlib

    from diachronic_spark.sources.wav_fixture import (
        g711_truth_row,
        generate_g711_clips,
    )

    for clip in generate_g711_clips():
        t = g711_truth_row(clip)
        rate, ch, width, frames = decode_wav(clip["blob"])
        assert (rate, ch, width) == (
            t["sample_rate"], t["n_channels"], 2,
        )
        assert hashlib.sha256(frames).hexdigest() == t["frames_sha"], (
            f"clip {clip['clip_id']} diverged from loop truth"
        )


def test_committed_g711_fixtures_are_regenerable():
    import os

    import pyarrow.parquet as pq

    from diachronic_spark.sources.wav_fixture import (
        G711_DIR,
        G711_TRUTH_PATH,
        g711_truth_row,
        generate_g711_clips,
    )

    clips = generate_g711_clips()
    assert len(clips) == 6
    for clip in clips:
        path = os.path.join(G711_DIR, f"g711_{clip['clip_id']:03d}.wav")
        with open(path, "rb") as f:
            assert f.read() == clip["blob"], f"fixture drift: {path}"
    stored = {
        r["clip_id"]: r
        for r in pq.read_table(G711_TRUTH_PATH).to_pylist()
    }
    for clip in clips:
        assert g711_truth_row(clip) == stored[clip["clip_id"]]


def test_g711_rejects_malformed():
    import struct as _s

    from diachronic_spark.sources.wav_fixture import generate_g711_clips

    ok = generate_g711_clips()[0]["blob"]
    # G.711 with 16-bit samples is contradictory — loud
    i = ok.index(b"fmt ")
    bad = bytearray(ok)
    _s.pack_into("<H", bad, i + 8 + 14, 16)  # bits field
    with pytest.raises(WavError, match="8-bit"):
        decode_wav(bytes(bad))
    # float format still rejected
    bad = bytearray(ok)
    _s.pack_into("<H", bad, i + 8, 3)
    with pytest.raises(WavError, match="format tag"):
        decode_wav(bytes(bad))


def test_spectral_features_fft_equals_loop_dft_truth():
    """The numpy rFFT engine path reproduces the pure-Python O(N^2)
    loop-DFT truth on every committed clip (no shared spectrum
    algorithm), and the committed fixtures are regenerable."""
    import math
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from diachronic_spark.functions.wav import (
        decode_wav,
        samples_as_array,
    )
    from diachronic_spark.sources.spectral_fixture import (
        CLIPS_DIR,
        TRUTH_PATH,
        generate_clips,
        truth_row,
        window_size,
    )

    clips = generate_clips()
    stored = {
        r["clip_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()
    }
    for c in clips:
        path = os.path.join(CLIPS_DIR, f"clip_{c['clip_id']:03d}.wav")
        with open(path, "rb") as f:
            assert f.read() == c["blob"], f"fixture drift: {path}"
        t = truth_row(c)
        assert t == stored[c["clip_id"]]
        rate, ch, width, frames = decode_wav(c["blob"])
        x = samples_as_array(width, ch, frames)[:, 0].astype(np.float64)
        n_fft = window_size(len(x))
        bins = (np.abs(np.fft.rfft(x[:n_fft])) ** 2)[1:]
        dom = int(np.argmax(bins)) + 1
        centroid = float(
            (np.arange(1, len(bins) + 1) * bins).sum() / bins.sum()
        )
        assert n_fft == t["n_fft"]
        assert dom == t["dominant_bin"]
        assert int(math.floor(dom * rate / n_fft + 0.5)) == t["dominant_hz"]
        assert int(math.floor(10 * centroid + 0.5)) == t["centroid_x10"]


def test_spectral_window_policy():
    from diachronic_spark.sources.spectral_fixture import window_size

    assert window_size(600) == 512
    assert window_size(512) == 512
    assert window_size(511) == 256
    assert window_size(300) == 256
    assert window_size(16) == 16


def test_spectral_silence_yields_nulls_not_nan():
    """Declared policy: a silent (or pure-DC) analysis window has no
    spectral features — NULLs on both the truth and engine paths,
    never NaN math."""
    import numpy as np

    from diachronic_spark.functions.wav import encode_wav, window_size
    from diachronic_spark.sources.spectral_fixture import (
        spectral_features,
    )

    silent = [0] * 512
    t = spectral_features(silent, 8000)
    assert t["dominant_bin"] is None and t["centroid_x10"] is None
    # engine-side equivalent math on the same window
    bins = (np.abs(np.fft.rfft(np.zeros(window_size(512)))) ** 2)[1:]
    assert float(bins.sum()) == 0.0
    # NB the policy boundary is EXACT zero total power: a pure-DC
    # clip leaves ~1e-18-relative float residue in both spectra and
    # is therefore NOT silence — only true digital silence nulls out
    # round-trip sanity: the silent WAV still decodes
    encode_wav(8000, 1, 2, b"\x00\x00" * 512)
