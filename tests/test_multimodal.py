"""Multimodal plumbing unit tests: stubbed codecs, real Spark-side
schema/batching semantics (SURVEY §2.11 L5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.operators.multimodal import (
    binarize,
    extract_features,
    resize,
    sample_frames,
)


def test_resize_bounds_payload_and_updates_meta(spark, sf_dir):
    b = binarize(load(spark, sf_dir, "documents").limit(20))
    out = resize(b, 8, 4).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.payload) <= 32
        assert (r.meta.width, r.meta.height) == (8, 4)
        assert r.meta.n_bytes == len(r.payload)


def test_resize_is_identity_below_target(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = resize(binarize(df), 100, 100).collect()[0]
    assert bytes(r.payload) == b"ab"


def test_sample_frames_fan_out_and_stride(spark):
    # 300 bytes -> 5 frames of 64 (last partial); every 2nd -> idx 0,2,4
    df = spark.createDataFrame(
        [(7, "x" * 300)], "doc_id long, text string"
    )
    rows = sorted(
        sample_frames(binarize(df), frame_bytes=64, every_n=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.n_frame_bytes) for r in rows] == [
        (0, 64), (2, 64), (4, 44)
    ]
    assert all(r.doc_id == 7 for r in rows)


def test_feature_extraction_matches_expression_side(spark, sf_dir):
    """mapInPandas features agree with pure-expression byte math."""
    b = binarize(load(spark, sf_dir, "documents").limit(50))
    feats = extract_features(b).select("doc_id", "byte_len", "sha_hex")
    expr = b.select(
        "doc_id",
        F.octet_length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha_hex"),
    )
    assert sorted(map(tuple, feats.collect())) == sorted(
        map(tuple, expr.collect())
    )


def test_decode_dispatches_png_and_rejects_unknown(spark):
    from diachronic_spark.functions.png import encode_png
    from diachronic_spark.operators.multimodal import decode

    blob = encode_png(2, 1, 3, bytes([1, 2, 3, 4, 5, 6]))
    assert decode(blob) == (2, 1, 3, bytes([1, 2, 3, 4, 5, 6]))
    import pytest as _pytest

    # a genuinely unknown container (WebM/EBML magic) — JPEG now
    # routes to the real baseline decoder instead
    with _pytest.raises(ValueError, match="unsupported media"):
        decode(b"\x1a\x45\xdf\xa3 webm-ish")
    # a JPEG signature with garbage inside fails in the JPEG parser
    # (loud), not as an unknown container
    from diachronic_spark.functions.jpeg import JpegError

    with _pytest.raises(JpegError):
        decode(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_extract_image_features_channel_slots(spark):
    """Gray sums land in sum_r, gray+alpha in (sum_r, sum_a), with the
    unused slots NULL — over a real mapInPandas round-trip."""
    from diachronic_spark.functions.png import encode_png
    from diachronic_spark.operators.multimodal import (
        extract_image_features,
    )

    imgs = spark.createDataFrame(
        [
            (1, bytearray(encode_png(2, 1, 1, bytes([10, 20])))),
            (2, bytearray(encode_png(1, 1, 2, bytes([5, 200])))),
            (3, bytearray(encode_png(1, 1, 4, bytes([1, 2, 3, 4])))),
        ],
        "img_id bigint, png binary",
    )
    got = {r.img_id: r for r in extract_image_features(imgs).collect()}
    assert (got[1].sum_r, got[1].sum_g, got[1].sum_a) == (30, None, None)
    assert (got[2].sum_r, got[2].sum_g, got[2].sum_a) == (5, None, 200)
    assert (got[3].sum_r, got[3].sum_g, got[3].sum_b, got[3].sum_a) == (
        1, 2, 3, 4,
    )


def test_committed_png_fixtures_are_regenerable(spark):
    """The committed fixture bytes and truth table must match what the
    generator produces today — catches silent drift between the codec,
    the generator, and the committed files."""
    import os

    from diachronic_spark.functions.png import encode_png
    from diachronic_spark.sources.png_fixture import (
        IMAGES_DIR,
        generate_images,
        truth_row,
    )

    imgs = generate_images()
    assert len(imgs) == 30
    n_checked = 0
    for img in imgs:
        if img["mode"] == "palette":
            continue  # hand-assembled in the tool; decode covers it
        path = os.path.join(IMAGES_DIR, f"img_{img['img_id']:03d}.png")
        with open(path, "rb") as f:
            committed = f.read()
        fresh = encode_png(
            img["width"], img["height"], img["channels"],
            img["pixels"], filter_strategy="cycle",
        )
        assert committed == fresh, f"fixture drift: {path}"
        n_checked += 1
    assert n_checked == 24
    # truth rows recompute identically (pure loop math, no codec)
    import pyarrow.parquet as pq

    from diachronic_spark.sources.png_fixture import TRUTH_PATH

    stored = {r["img_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()}
    for img in imgs:
        assert truth_row(img) == stored[img["img_id"]]


def test_extract_audio_features_and_downmix(spark):
    """Audio decode + downmix through the real mapInPandas path:
    features match hand-computed values for a signal spanning both
    widths' conventions."""
    import struct

    from diachronic_spark.functions.wav import encode_wav
    from diachronic_spark.operators.multimodal import (
        downmix_audio,
        extract_audio_features,
    )

    # stereo 16-bit: c0 = [-2, 3, -4, 5], c1 = [10, 10, 10, 10]
    frames = b"".join(
        struct.pack("<hh", a, b)
        for a, b in [(-2, 10), (3, 10), (-4, 10), (5, 10)]
    )
    clips = spark.createDataFrame(
        [(1, bytearray(encode_wav(8000, 2, 2, frames)))],
        "clip_id bigint, wav binary",
    )
    r = extract_audio_features(clips).first()
    assert (r.sample_rate, r.n_channels, r.sample_width, r.n_frames) == (
        8000, 2, 2, 4,
    )
    assert r.sumsq_c0 == 4 + 9 + 16 + 25
    assert r.sumsq_c1 == 400
    assert r.zero_cross == 3  # -2|3, 3|-4, -4|5
    # downmix every 2nd frame: floor((-2+10)/2)=4, floor((-4+10)/2)=3
    dm = downmix_audio(clips, 2)
    r2 = extract_audio_features(dm).first()
    assert (r2.sample_rate, r2.n_channels, r2.n_frames) == (4000, 1, 2)
    assert r2.sumsq_c0 == 16 + 9


def test_decode_dispatch_routes_bmp_and_gif(spark):
    """multimodal.decode is real multi-format routing: the same entry
    point decodes PNG, BMP, and GIF payloads of the same image to the
    same RGB buffer."""
    from diachronic_spark.functions.bmp import encode_bmp
    from diachronic_spark.functions.png import encode_png
    from diachronic_spark.operators.multimodal import decode
    from diachronic_spark.sources.gif_fixture import generate_gifs

    rgb = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])  # 2x2
    assert decode(encode_png(2, 2, 3, rgb)) == (2, 2, 3, rgb)
    assert decode(encode_bmp(2, 2, 3, rgb)) == (2, 2, 3, rgb)
    # GIF: first frame via the generic dispatch
    gif = generate_gifs()[1]  # single-frame 7x5
    w, h, c, pix = decode(gif["blob"])
    fr = gif["frames"][0]
    assert (w, h, c) == (fr["width"], fr["height"], 3)


def test_committed_gif_bmp_fixtures_are_regenerable(spark):
    """Committed GIF/BMP fixture bytes and truth tables must match
    what the generators produce today (the PNG drift-check's twins)."""
    import os

    import pyarrow.parquet as pq

    from diachronic_spark.sources.bmp_fixture import (
        BMPS_DIR,
        generate_bmps,
        truth_row,
    )
    from diachronic_spark.sources.bmp_fixture import (
        TRUTH_PATH as BMP_TRUTH,
    )
    from diachronic_spark.sources.gif_fixture import (
        GIFS_DIR,
        generate_gifs,
        truth_rows,
    )
    from diachronic_spark.sources.gif_fixture import (
        TRUTH_PATH as GIF_TRUTH,
    )

    gifs = generate_gifs()
    assert len(gifs) == 12
    for gif in gifs:
        path = os.path.join(GIFS_DIR, f"anim_{gif['gif_id']:03d}.gif")
        with open(path, "rb") as f:
            assert f.read() == gif["blob"], f"fixture drift: {path}"
    stored = {
        (r["gif_id"], r["frame_idx"]): r
        for r in pq.read_table(GIF_TRUTH).to_pylist()
    }
    n = 0
    for gif in gifs:
        for row in truth_rows(gif):
            assert row == stored[(row["gif_id"], row["frame_idx"])]
            n += 1
    assert n == len(stored) == 22

    bmps = generate_bmps()
    assert len(bmps) == 14
    for img in bmps:
        path = os.path.join(BMPS_DIR, f"img_{img['img_id']:03d}.bmp")
        with open(path, "rb") as f:
            assert f.read() == img["blob"], f"fixture drift: {path}"
    bstored = {
        r["img_id"]: r for r in pq.read_table(BMP_TRUTH).to_pylist()
    }
    for img in bmps:
        assert truth_row(img) == bstored[img["img_id"]]


def test_gif_frame_fanout_and_nested_png_pipeline(spark):
    """The one-to-many frame fan-out and the nested array<binary>
    GIF->PNG->decode loop, over the committed fixtures: every frame
    row's pixel hash equals the loop-math truth, and the sampled
    nested pipeline reproduces the even frames exactly."""
    from diachronic_spark.operators.multimodal import (
        decode_frame_features,
        extract_gif_frame_features,
        gif_frames_as_png,
    )
    from diachronic_spark.sources.gif_fixture import (
        generate_gifs,
        truth_rows,
    )

    truth = {
        (r["gif_id"], r["frame_idx"]): r
        for gif in generate_gifs()
        for r in truth_rows(gif)
    }
    gifs = spark.createDataFrame(
        [(g["gif_id"], bytearray(g["blob"])) for g in generate_gifs()],
        "gif_id bigint, gif binary",
    )
    rows = extract_gif_frame_features(gifs).collect()
    assert len(rows) == 22
    for r in rows:
        t = truth[(r.gif_id, r.frame_idx)]
        assert (
            r.width, r.height, r.interlaced, r.pix_sha,
            r.sum_r, r.sum_g, r.sum_b, r.n_frames,
        ) == (
            t["width"], t["height"], t["interlaced"], t["pix_sha"],
            t["sum_r"], t["sum_g"], t["sum_b"], t["n_frames"],
        )

    nested = gif_frames_as_png(gifs)
    schema = dict(nested.dtypes)
    assert schema["frames"] == "array<binary>"
    sampled = nested.select(
        "gif_id", F.posexplode("frames").alias("frame_idx", "png")
    ).filter(F.col("frame_idx") % 2 == 0)
    out = decode_frame_features(sampled).collect()
    want = {k for k in truth if k[1] % 2 == 0}
    assert {(r.gif_id, r.frame_idx) for r in out} == want
    for r in out:
        assert r.pix_sha == truth[(r.gif_id, r.frame_idx)]["pix_sha"]

    # stride pushed into the emit loop must equal explode-then-filter:
    # element pos is source frame pos*stride, n_frames stays the TOTAL
    strided = gif_frames_as_png(gifs, stride=2)
    assert {(r.gif_id, r.n_frames) for r in strided.collect()} == {
        (r.gif_id, r.n_frames) for r in nested.collect()
    }
    out2 = decode_frame_features(
        strided.select(
            "gif_id", F.posexplode("frames").alias("pos", "png")
        ).select(
            "gif_id",
            (F.col("pos") * 2).cast("int").alias("frame_idx"),
            "png",
        )
    ).collect()
    assert {(r.gif_id, r.frame_idx, r.pix_sha) for r in out2} == {
        (r.gif_id, r.frame_idx, r.pix_sha) for r in out
    }
