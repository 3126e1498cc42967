#!/usr/bin/env python
"""10x scaling point for the packed training-shard sink (round 10;
q184/q188 are its correctness rows).

The sink's scale claim (PLANS.md q184): the token payload crosses
exactly ONE corpus-scale shuffle (encode_text's collect), pack
assignments shuffle only (bucket, id, n_tokens), the assembly
aggregate is pack-count-sized, and Python stays vocabulary-sized.
If any of that silently regressed corpus-scaled (a driver collect,
a vocab that scales with rows, a per-doc Python path), the 10x wall
ratio would blow past linear. Both at-rest layouts are measured:
parquet (write_packed_shards) and WDS tar (write_wds_token_shards).

Corpus: sf0.01 documents (500 rows — the documents table is
constant below sf0.1) vs the SCALING_DOCS10X build (50,000 rows =
10x of sf0.1), so the measured span is 100x DOCS — real distinct
documents (not copies), the distinct-pretoken vocab growing the way
a real corpus grows. Byte-level BPE with the committed table, bin
2048, 32 buckets (= local cores).

Methodology mirrors scaling_media10x: warmup pass per point, then
best-of-2; flag ratio 13 would indicate a corpus-scaled regression
even if the span were read as 10x; against the true 100x span the
measured ~2x is deeply sub-linear (fixed cost dominated).

Writes SCALING_SHARDS10X.json.

Usage: python tools/scaling_shards10x.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diachronic_spark.catalog import load  # noqa: E402
from diachronic_spark.operators.bpe import (  # noqa: E402
    RE_TOKEN_UNI,
    write_packed_shards,
)
from diachronic_spark.session import get_spark  # noqa: E402
from diachronic_spark.sources.bpe_fixture import (  # noqa: E402
    load_byte_merges,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 13.0


def _measure(spark, sf_dir: str, merges) -> dict:
    from diachronic_spark.operators.bpe import build_packed_shards
    from diachronic_spark.sources.files import (
        write_wds_token_shards,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    def run_parquet() -> float:
        out = tempfile.mkdtemp(prefix="shards10x_pq_")
        t0 = time.perf_counter()
        write_packed_shards(
            docs, merges, out, bin_tokens=2048, n_buckets=32,
            byte_level=True, pretoken_re=RE_TOKEN_UNI,
        )
        dt = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        return dt

    def run_wds() -> float:
        out = tempfile.mkdtemp(prefix="shards10x_wds_")
        packs = build_packed_shards(
            docs, merges, bin_tokens=2048, n_buckets=32,
            byte_level=True, pretoken_re=RE_TOKEN_UNI,
        )
        t0 = time.perf_counter()
        write_wds_token_shards(packs, out)
        dt = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        return dt

    run_parquet()  # warmup (codegen + Arrow paths)
    pq = min(run_parquet(), run_parquet())
    wds = min(run_wds(), run_wds())
    return {
        "n_docs": n_docs,
        "parquet_sink_sec": round(pq, 3),
        "wds_sink_sec": round(wds, 3),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "SCALING_SHARDS10X.json"
    )
    spark = get_spark("shards10x")
    spark.sparkContext.setLogLevel("ERROR")

    from scaling_corpus10x import SCALED, build_scaled_dir

    build_scaled_dir(spark)
    merges = load_byte_merges()

    one = _measure(spark, "/root/testdata/sf0.01", merges)
    ten = _measure(spark, SCALED, merges)
    result = {
        "metric": "packed_shard_sink_wall_ratio_100x_docs",
        "config": (
            "byte-level BPE (committed 112-merge table), bin 2048, "
            "32 buckets, best-of-2 after warmup"
        ),
        "x1": one,
        "x100": ten,
        "parquet_ratio": round(
            ten["parquet_sink_sec"] / one["parquet_sink_sec"], 2
        ),
        "wds_ratio": round(
            ten["wds_sink_sec"] / one["wds_sink_sec"], 2
        ),
        "flag_ratio": FLAG_RATIO,
    }
    for k in ("parquet_ratio", "wds_ratio"):
        assert result[k] <= FLAG_RATIO, (
            f"{k} {result[k]} super-linear past the flag — the sink "
            "has a corpus-scaled regression"
        )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
