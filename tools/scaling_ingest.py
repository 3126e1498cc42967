"""File-parallel ingestion scaling point for the archive sources.

The WARC/ZIP/WebDataset scans all declare the same 100 TB shape:
the archive is the parallelism unit (unsplittable formats), so wall
time should fall ~linearly with cores while files ≫ cores, and grow
~linearly with shard count at fixed per-shard size. This tool
MEASURES both claims for the WARC path (the heaviest policy —
gzip + HTTP split + text decode per record):

- builds 32 synthetic ~1 MB .warc.gz shards (deterministic bodies,
  assembled by the fixture's independent record assembler);
- times a full scan + aggregate at local[1] / local[4] / local[8]
  over all 32 shards (speedup = file-level parallelism);
- times 8 vs 32 shards at local[8] (bytes-linearity).

Scratch shards live in /tmp (never committed, never a correctness
input). Timings are best-of-2 after a warmup pass.

Usage: python tools/scaling_ingest.py [out.json]
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.warc_fixture import assemble_record  # noqa: E402

SHARD_DIR = "/tmp/diachronic_scaling_warc"
N_SHARDS = 32
DOCS_PER_SHARD = 1500


def _body(shard: int, i: int) -> bytes:
    words = [
        f"w{(shard * 7919 + i * 104729 + k * 31) % 9973}"
        for k in range(160)
    ]
    return (" ".join(words)).encode()


def build_shards() -> None:
    if os.path.isdir(SHARD_DIR):
        shutil.rmtree(SHARD_DIR)
    os.makedirs(SHARD_DIR)
    for s in range(N_SHARDS):
        members = []
        for i in range(DOCS_PER_SHARD):
            rec = {
                "type": "response",
                "uri": f"https://example.org/{s}/{i}",
                "status": 200,
                "reason": "OK",
                "ctype": "text/plain",
                "body": _body(s, i),
            }
            members.append(
                gzip.compress(assemble_record(900 + s, i, rec), mtime=0)
            )
        with open(f"{SHARD_DIR}/crawl_{s:03d}.warc.gz", "wb") as f:
            f.write(b"".join(members))


def _scan_time(spark, n_shards: int) -> float:
    from pyspark.sql import functions as F

    from diachronic_spark.sources.files import read_warc

    glob = "*.warc.gz"
    # restrict by copying paths? cheaper: glob prefix trick per count
    if n_shards == 8:
        glob = "crawl_00[0-7].warc.gz"
    def fresh_agg():
        # a NEW plan instance per run — re-collecting one DataFrame
        # would reuse its shuffle map outputs and skip the scan stage
        return read_warc(spark, SHARD_DIR, glob=glob).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("content_len").alias("bytes"),
            F.sum(F.length("text")).alias("chars"),
        )

    best = float("inf")
    fresh_agg().collect()  # warmup (codegen + Arrow init)
    for _ in range(2):
        t0 = time.perf_counter()
        row = fresh_agg().collect()[0]
        best = min(best, time.perf_counter() - t0)
    expect = DOCS_PER_SHARD * n_shards
    assert row["n"] == expect, (row["n"], expect)
    return round(best, 3)


def _with_master(master: str):
    from pyspark.sql import SparkSession

    SparkSession.builder.getOrCreate().stop()
    return (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_INGEST.json"
    build_shards()
    total_bytes = sum(
        os.path.getsize(os.path.join(SHARD_DIR, f))
        for f in os.listdir(SHARD_DIR)
    )
    points = []
    for master, cores in (
        ("local[1]", 1), ("local[4]", 4), ("local[8]", 8)
    ):
        spark = _with_master(master)
        t = _scan_time(spark, N_SHARDS)
        points.append({"cores": cores, "shards": N_SHARDS, "sec": t})
    # bytes-linearity at fixed cores
    spark = _with_master("local[8]")
    t8 = _scan_time(spark, 8)
    points.append({"cores": 8, "shards": 8, "sec": t8})
    spark.stop()

    t1 = next(p["sec"] for p in points if p["cores"] == 1)
    t8c = next(
        p["sec"] for p in points if p["cores"] == 8 and p["shards"] == 32
    )
    t32 = t8c
    result = {
        "metric": "scaling_ingest_warc",
        "unit": "sec",
        "shard_bytes_total": total_bytes,
        "docs_total": N_SHARDS * DOCS_PER_SHARD,
        "points": points,
        "speedup_8cores_vs_1": round(t1 / t8c, 2),
        "bytes_ratio_32_vs_8_shards": round(t32 / t8, 2),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
