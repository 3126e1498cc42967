#!/usr/bin/env python
"""10x scaling point for the multimodal decode family
(VERDICT r8 item 7).

The codecs are correctness-proven (q143-q170) but had no ladder
entry: SCALING_INGEST covers WARC only. Decode is per-file
independent work behind a binaryFile scan + Arrow ``mapInPandas``,
so the scale hypothesis is linear-in-files wall growth bounded by
file-unit parallelism — the same contract as the WARC scan. A
super-linear ratio would indicate per-batch state leaking across
files (codec caches, quadratic demux, Arrow batch re-marshalling).

Corpus: byte-identical copies of the COMMITTED media fixtures under
distinct names (decode cost is content-deterministic and per-file
independent, so — unlike the dedup corpus, where verbatim copies
would fake pathological candidate fan-out — replication measures
exactly what production replication measures: more files).
1x = 3 copies of each fixture set, 10x = 30 copies.

Methodology mirrors scaling_corpus10x: one warmup pass per point
(codegen + Arrow path JIT), then best-of-2; flag ratio 13 = linear
10x + scheduling headroom.

Writes SCALING_MEDIA10X.json.

Usage: python tools/scaling_media10x.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from diachronic_spark.operators import multimodal as M  # noqa: E402
from diachronic_spark.session import get_spark  # noqa: E402
from diachronic_spark.sources.files import read_pdf_pages  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, "fixtures")
SCRATCH = "/tmp/diachronic_media10x"
# the 1x point must SATURATE the 32 local cores, or the ratio
# measures scheduling slack instead of decode work (a 3-copy first
# cut read x1.0-1.5 across every family — cores absorbed 10x the
# files in the same task waves); 12 copies of the smallest set (15
# pdf files) = 180 files >= 5 waves at 1x
BASE_COPIES = 12
SCALE = 10
FLAG_RATIO = 13.0


def _binary(spark, path: str, glob: str, col: str):
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.monotonically_increasing_id().alias("img_id"),
        F.col("content").alias(col),
    )


def _image_family(glob: str, col: str):
    def run(spark, path: str):
        return M.extract_image_features(
            _binary(spark, path, glob, col), payload_col=col
        )

    return run


def _audio(spark, path: str):
    clips = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(path)
        .select(
            F.monotonically_increasing_id().alias("clip_id"),
            F.col("content").alias("wav"),
        )
    )
    return M.extract_spectral_features(clips)


def _video(spark, path: str):
    from diachronic_spark.sources.avi_fixture import VIDEO_EVERY_N

    vids = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avi")
        .load(path)
        .select(
            F.monotonically_increasing_id().alias("video_id"),
            F.col("content").alias("avi"),
        )
    )
    return M.extract_video_frame_features(vids, stride=VIDEO_EVERY_N)


def _pdf(spark, path: str):
    return read_pdf_pages(spark, path)


FAMILIES = [
    ("jpeg", "jpeg", "*.jpg", _image_family("*.jpg", "jpg")),
    ("png", "png", "*.png", _image_family("*.png", "png")),
    ("tiff", "tiff", "*.tif", _image_family("*.tif", "tif")),
    ("wav_spectral", "wav_spectral", "*.wav", _audio),
    ("avi_mjpeg", "avi", "*.avi", _video),
    ("pdf_text", "pdf", "*.pdf", _pdf),
]


def build_heavy_png(dst: str, n: int, w: int = 256, h: int = 256) -> int:
    """Generated LARGE PNGs (deterministic pixels, all five filter
    types via the committed encoder): the fixture images are tiny
    (decode ~0.1 ms), so their wall is fixed job overhead at both
    points; these make the per-file DECODE the dominant term, which
    is the quantity whose linearity the ladder actually claims."""
    from diachronic_spark.functions.png import encode_png

    os.makedirs(dst, exist_ok=True)
    for i in range(n):
        pix = bytes(
            (i * 31 + p * 7 + (p >> 8)) % 256 for p in range(w * h * 3)
        )
        with open(os.path.join(dst, f"big_{i:04d}.png"), "wb") as f:
            f.write(encode_png(w, h, 3, pix))
    return n


def build_heavy_wav(dst: str, n: int, n_samples: int = 400_000) -> int:
    """Generated LONG PCM WAVs for the spectral family — same
    rationale as build_heavy_png (FFT work must dominate)."""
    import math
    import struct as st

    os.makedirs(dst, exist_ok=True)
    for i in range(n):
        freq = 200 + 13 * i
        frames = bytearray()
        for t in range(n_samples):
            v = int(12000 * math.sin(2 * math.pi * freq * t / 16000))
            frames += st.pack("<h", v)
        data = bytes(frames)
        hdr = (
            b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, 16000,
                                32000, 2, 16)
            + b"data" + st.pack("<I", len(data))
        )
        with open(os.path.join(dst, f"tone_{i:04d}.wav"), "wb") as f:
            f.write(hdr + data)
    return n


def build_corpus(src: str, glob_ext: str, dst: str, copies: int) -> int:
    os.makedirs(dst, exist_ok=True)
    n = 0
    ext = glob_ext.lstrip("*")
    for name in sorted(os.listdir(src)):
        if not name.endswith(ext):
            continue
        src_f = os.path.join(src, name)
        stem = name[: -len(ext)]
        for c in range(copies):
            shutil.copyfile(
                src_f, os.path.join(dst, f"{stem}_c{c:03d}{ext}")
            )
            n += 1
    return n


def time_point(fn, spark, path: str) -> float:
    fn(spark, path).toPandas()  # warmup: codegen + Arrow path
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, path).toPandas()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "SCALING_MEDIA10X.json"
    )
    spark = get_spark("media-10x")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.isdir(SCRATCH):
        shutil.rmtree(SCRATCH)

    rows, flagged = [], []

    # decode-dominant points: generated heavy corpora (fixture files
    # are ~KB — their wall is pure job overhead at 32 cores)
    HEAVY = [
        ("png_heavy", build_heavy_png, _image_family("*.png", "png"),
         8),
        ("wav_spectral_heavy", build_heavy_wav, _audio, 8),
    ]
    for name, builder, fn, base_n in HEAVY:
        d1 = os.path.join(SCRATCH, f"{name}_1x")
        d10 = os.path.join(SCRATCH, f"{name}_10x")
        n1 = builder(d1, base_n)
        n10 = builder(d10, base_n * SCALE)
        t1 = time_point(fn, spark, d1)
        t10 = time_point(fn, spark, d10)
        ratio = round(t10 / t1, 2) if t1 > 0 else None
        super_lin = ratio is not None and ratio > FLAG_RATIO
        rows.append(
            {"family": name, "files_1x": n1, "files_10x": n10,
             "sec_1x": t1, "sec_10x": t10, "x_1_to_10": ratio,
             "superlinear": super_lin}
        )
        if super_lin:
            flagged.append(name)
        print(f"{name}: {n1}f {t1}s -> {n10}f {t10}s (x{ratio})")

    for name, sub, glob, fn in FAMILIES:
        src = os.path.join(FIX, sub)
        d1 = os.path.join(SCRATCH, f"{name}_1x")
        d10 = os.path.join(SCRATCH, f"{name}_10x")
        n1 = build_corpus(src, glob, d1, BASE_COPIES)
        n10 = build_corpus(src, glob, d10, BASE_COPIES * SCALE)
        t1 = time_point(fn, spark, d1)
        t10 = time_point(fn, spark, d10)
        ratio = round(t10 / t1, 2) if t1 > 0 else None
        super_lin = ratio is not None and ratio > FLAG_RATIO
        rows.append(
            {
                "family": name,
                "files_1x": n1,
                "files_10x": n10,
                "sec_1x": t1,
                "sec_10x": t10,
                "x_1_to_10": ratio,
                "superlinear": super_lin,
            }
        )
        if super_lin:
            flagged.append(name)
        print(f"{name}: {n1}f {t1}s -> {n10}f {t10}s (x{ratio})")

    result = {
        "metric": "scaling_media_10x",
        "unit": "sec",
        "data_factor": SCALE,
        "flag_ratio": FLAG_RATIO,
        "flagged_superlinear": flagged,
        "families": rows,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({"flagged_superlinear": flagged}))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
