"""AVI/MJPEG demuxer unit tests (functions/avi.py).

Anchors: (1) the committed fixtures demux + JPEG-decode BIT-EXACTLY
to the loop-math coefficient-replay truth (the q154 scheme — no
bitstream, no codec, no demuxer in the truth path); (2) the container
axes each have a dedicated fixture (rec-grouped frames, 00db ids,
idx1, JUNK chunks, a second audio stream the demux routes around);
(3) malformed/unsupported containers reject loudly — including
non-MJPG codecs, the untrusted-web-corpus path; (4) the stride
contract: sampling skips the entropy decode of unsampled MJPEG
frames entirely (intra-only codec — the scale contrast with GIF's
sequential LZW).
"""

from __future__ import annotations

import hashlib
import os
import struct

import pytest

from diachronic_spark.functions.avi import AviError, decode_avi
from diachronic_spark.functions.jpeg import decode_jpeg
from diachronic_spark.sources.avi_fixture import (
    AVIS_DIR,
    TRUTH_PATH,
    generate_avis,
    truth_rows,
)


def test_fixture_set_bit_exact_vs_loop_truth():
    for video in generate_avis():
        v = decode_avi(video["blob"])
        assert (v.width, v.height) == (video["width"], video["height"])
        assert (v.rate, v.scale) == (video["rate"], video["scale"])
        assert len(v.frames) == video["n_frames"]
        for frame, t in zip(v.frames, truth_rows(video)):
            w, h, c, pix = decode_jpeg(frame)
            assert (w, h, c) == (t["width"], t["height"], t["channels"])
            assert hashlib.sha256(pix).hexdigest() == t["pix_sha"], (
                f"video {video['video_id']} frame {t['frame_idx']} "
                "diverged from loop truth"
            )


def test_committed_avi_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    videos = generate_avis()
    assert len(videos) == 6
    for video in videos:
        path = os.path.join(
            AVIS_DIR, f"video_{video['video_id']:03d}.avi"
        )
        with open(path, "rb") as f:
            assert f.read() == video["blob"], f"fixture drift: {path}"
    stored = sorted(
        pq.read_table(TRUTH_PATH).to_pylist(),
        key=lambda r: (r["video_id"], r["frame_idx"]),
    )
    fresh = sorted(
        (r for v in videos for r in truth_rows(v)),
        key=lambda r: (r["video_id"], r["frame_idx"]),
    )
    assert fresh == stored


def test_layout_axes_are_load_bearing():
    """Each container axis appears in the committed set: rec-grouped
    frames, 00db ids, idx1, JUNK, and a second (audio) stream."""
    blobs = {v["video_id"]: v["blob"] for v in generate_avis()}
    assert b"rec " in blobs[2] and b"JUNK" in blobs[2]
    assert b"00db" in blobs[3] and b"00dc" not in blobs[3]
    assert b"idx1" in blobs[1] and b"idx1" in blobs[4]
    assert b"auds" in blobs[5] and b"01wb" in blobs[5]
    # NTSC fractional rate survives the round trip
    v1 = decode_avi(blobs[1])
    assert (v1.rate, v1.scale) == (30000, 1001)


def _mutate(blob: bytes, old: bytes, new: bytes) -> bytes:
    assert blob.count(old) >= 1
    return blob.replace(old, new, 1)


def test_loud_rejections():
    video = generate_avis()[0]
    blob = video["blob"]

    with pytest.raises(AviError, match="signature"):
        decode_avi(b"RIFX" + blob[4:])
    with pytest.raises(AviError, match="signature"):
        decode_avi(blob[:8] + b"WAVE" + blob[12:])
    # RIFF size overruns the payload
    with pytest.raises(AviError, match="overruns"):
        decode_avi(blob[:4] + struct.pack("<I", len(blob)) + blob[8:])
    # truncated mid-chunk
    with pytest.raises(AviError):
        decode_avi(blob[:-40])
    # a non-MJPG codec must reject loudly, not desync: flip both the
    # handler and biCompression to cvid (Cinepak)
    other = _mutate(_mutate(blob, b"MJPG", b"cvid"), b"MJPG", b"cvid")
    with pytest.raises(AviError, match="unsupported video codec"):
        decode_avi(other)
    # frame bytes that are not a JPEG bytestream
    bad = _mutate(blob, b"\xff\xd8\xff", b"\x00\x00\x00")
    with pytest.raises(AviError, match="not a JPEG"):
        decode_avi(bad)
    # frame-count contradiction (declared length raised by one)
    vid_strh = blob.index(b"vids")
    n = video["n_frames"]
    length_off = vid_strh + 8 + 24  # type+handler, then 24 bytes to dwLength
    assert struct.unpack_from("<I", blob, length_off)[0] == n
    counted = bytearray(blob)
    struct.pack_into("<I", counted, length_off, n + 1)
    with pytest.raises(AviError, match="frame count mismatch"):
        decode_avi(bytes(counted))


def test_stride_skips_decode_of_unsampled_frames(monkeypatch):
    """MJPEG frames are intra-coded: the stride path must never
    entropy-decode an unsampled frame (GIF cannot make this promise —
    LZW frames are sequential). Pinned by counting decode calls."""
    import diachronic_spark.operators.multimodal as M

    calls = []
    real = M.JPEG.decode_jpeg
    monkeypatch.setattr(
        M.JPEG, "decode_jpeg", lambda b: (calls.append(1), real(b))[1]
    )
    import pandas as pd

    video = generate_avis()[4]  # 6 frames
    # drive the mapInPandas body directly (no SparkSession needed)
    batches = iter(
        [pd.DataFrame({"video_id": [4], "avi": [video["blob"]]})]
    )
    captured = {}

    class FakeDF:
        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    M.extract_video_frame_features(FakeDF(), stride=3)
    pdf = list(captured["fn"](batches))[0]
    assert list(pdf["frame_idx"]) == [0, 3]
    assert list(pdf["n_frames"]) == [6, 6]  # total, not sampled
    assert len(calls) == 2, "unsampled frames must not be decoded"


def test_fuzz_container_roundtrip():
    """Property fuzz over GENERATED container configurations (frame
    counts, dims off every grid, sampling layouts, quant variants,
    restarts, every layout-flag subset): demux + JPEG decode must
    equal the loop-math truth bit-for-bit for every frame."""
    from hypothesis import given, settings, strategies as st

    from diachronic_spark.sources.avi_fixture import build_avi

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=10**6),
        n=st.integers(min_value=1, max_value=4),
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        color=st.booleans(),
        samp=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
        qv=st.integers(min_value=0, max_value=2),
        rst=st.sampled_from([0, 1, 3]),
        fps=st.sampled_from([(15, 1), (30000, 1001), (24, 1)]),
        layout=st.sets(
            st.sampled_from(["rec", "db", "idx", "junk", "audio"])
        ),
    )
    def check(seed, n, w, h, color, samp, qv, rst, fps, layout):
        lay = tuple(layout)
        if "idx" in lay and ("rec" in lay or "audio" in lay):
            # the fixture's idx1 offsets assume plain frame chunks
            lay = tuple(x for x in lay if x != "idx")
        cfg = {
            "n": n, "w": w, "h": h, "color": color, "hv": samp,
            "qv": qv, "rst": rst, "fps": fps, "layout": lay,
        }
        video = build_avi(seed, cfg)
        v = decode_avi(video["blob"])
        assert len(v.frames) == n
        assert (v.rate, v.scale) == fps
        for frame, t in zip(v.frames, truth_rows(video)):
            fw, fh, fc, pix = decode_jpeg(frame)
            assert (fw, fh, fc) == (
                t["width"], t["height"], t["channels"]
            )
            assert hashlib.sha256(pix).hexdigest() == t["pix_sha"]

    check()


def test_stride_validation():
    import diachronic_spark.operators.multimodal as M

    with pytest.raises(ValueError, match="stride"):
        M.extract_video_frame_features(None, stride=0)
