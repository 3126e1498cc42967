"""JSON-lines / CSV scans (S11): explicit-schema roundtrips against the
parquet truth, and malformed-row tolerance."""

from __future__ import annotations

from diachronic_spark.catalog import load
from diachronic_spark.schemas import TABLE_SCHEMAS
from diachronic_spark.sources.files import read_csv, read_jsonl


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_jsonl")
    nation.write.json(p)
    back = read_jsonl(spark, p, TABLE_SCHEMAS["nation"])
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    region = load(spark, sf_dir, "region")
    p = str(tmp_path / "region_csv")
    region.write.option("header", "true").csv(p)
    back = read_csv(spark, p, TABLE_SCHEMAS["region"])
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )


def test_jsonl_permissive_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"k": 1, "v": "a"}\nNOT JSON\n{"k": 2, "v": "b"}\n')
    df = read_jsonl(spark, str(p), "k long, v string")
    rows = df.collect()
    # malformed line becomes a null row, valid rows survive
    assert sorted(r.k for r in rows if r.k is not None) == [1, 2]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from diachronic_spark.catalog import load
    from diachronic_spark.sources.files import read_orc, write_orc

    src = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path, src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_wiki_manifest_datasource(spark, tmp_path):
    import json

    from diachronic_spark.sources import manifest_ds
    from diachronic_spark.sources.manifest import files_to_run

    for wiki, files in [
        ("enwiki", {"enwiki-a.7z": {"size": 11, "url": "u/a", "sha1": "aa"},
                    "enwiki-b.7z": {"size": 22, "url": "u/b", "sha1": "bb"}}),
        ("dewiki", {"dewiki-a.7z": {"size": 33, "url": "u/c", "sha1": "cc"}}),
    ]:
        d = tmp_path / wiki
        d.mkdir()
        (d / "dumpstatus.json").write_text(json.dumps(
            {"jobs": {"metahistory7zdump": {"files": files}}}
        ))

    manifest_ds.register(spark)
    df = (
        spark.read.format("wiki_manifest")
        .option("paths", ",".join(
            str(tmp_path / w / "dumpstatus.json") for w in ["enwiki", "dewiki"]
        ))
        .load()
    )
    rows = {(r["wiki"], r["file_name"], r["size"]) for r in df.collect()}
    assert rows == {("enwiki", "enwiki-a.7z", 11),
                    ("enwiki", "enwiki-b.7z", 22),
                    ("dewiki", "dewiki-a.7z", 33)}
    # parse parallelism = one partition per manifest
    assert df.rdd.getNumPartitions() == 2

    # composes with the incremental-skip anti-join
    done = spark.createDataFrame(
        [("enwiki-a.7z.parquet",)], "blob_name string"
    )
    todo = {r["file_name"]
            for r in files_to_run(df, done).select("file_name").collect()}
    assert todo == {"enwiki-b.7z", "dewiki-a.7z"}


def test_read_binary_files_multimodal_schema(spark, tmp_path):
    """binaryFile scan lands in the multimodal storage schema and feeds
    extract_features unchanged; the glob filter prunes at LISTING time
    (non-matching files never contribute rows)."""
    from diachronic_spark.operators.multimodal import extract_features
    from diachronic_spark.sources.files import read_binary_files

    payloads = {
        "a.png": b"\x89PNG\r\n" + b"a" * 10,
        "b.jpg": b"\xff\xd8\xff" + b"b" * 20,
        "c.wav": b"RIFF" + b"c" * 5,
    }
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)
    (tmp_path / "skip.txt").write_text("not media")

    df = read_binary_files(spark, str(tmp_path), glob="*.{png,jpg,wav}")
    rows = {r.src_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads)
    assert rows["a.png"].meta.mime == "image/png"
    assert rows["b.jpg"].meta.mime == "image/jpeg"
    assert rows["c.wav"].meta.mime == "audio/wav"
    for name, blob in payloads.items():
        assert bytes(rows[name].payload) == blob
        assert rows[name].meta.n_bytes == len(blob)
    # doc_id is stable across re-scans (path-derived, not row-order)
    again = {r.src_path.rsplit("/", 1)[-1]: r.doc_id
             for r in read_binary_files(
                 spark, str(tmp_path), glob="*.{png,jpg,wav}"
             ).collect()}
    assert again == {n: r.doc_id for n, r in rows.items()}
    # the downstream feature pipeline runs unchanged on file payloads
    feats = {r.doc_id: r for r in extract_features(
        df.select("doc_id", "payload", "meta")
    ).collect()}
    assert set(feats) == {r.doc_id for r in rows.values()}
    import hashlib
    for name, blob in payloads.items():
        f = feats[rows[name].doc_id]
        assert f.byte_len == len(blob)
        assert f.sha_hex == hashlib.sha256(blob).hexdigest()


def test_widen_raises_only_underparallel_sources(spark):
    """widen() repartitions an under-partitioned frame to default
    parallelism and leaves an already-wide frame untouched."""
    from diachronic_spark.catalog import widen

    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    wide = widen(narrow)
    assert wide.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    assert wide.count() == 1000
    already = spark.range(1000).repartition(64)
    assert widen(already) is already  # no extra exchange


def test_events_ts_unit_handles_directory_tables(spark, tmp_path):
    """catalog.load sniffs the ts footer from a part file when the
    events table is a Spark-written DIRECTORY (micros timestamps) —
    the shape every engine-written events derivative has."""
    from diachronic_spark.catalog import load

    src = load(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events.parquet")
    src.write.parquet(out)
    back = load(spark, str(tmp_path), "events")
    assert back.schema["ts"].dataType.typeName() == "timestamp"
    a = sorted(r.event_id for r in src.select("event_id").collect())
    b = sorted(r.event_id for r in back.select("event_id").collect())
    assert a == b


def test_csv_roundtrip_preserves_newlines_and_whitespace(spark, tmp_path):
    """The q122 CSV settings (quoteAll + no write-side trimming +
    multiline read) round-trip embedded newlines, quotes, commas, and
    edge whitespace byte-for-byte."""
    from diachronic_spark.sources.files import read_csv

    rows = [
        (1, "line one\nline two"),
        (2, ' leading and trailing '),
        (3, 'comma, "quoted", done'),
        (4, ""),
    ]
    d = spark.createDataFrame(rows, "id bigint, text string")
    out = str(tmp_path / "csv")
    (
        d.write.option("header", "true")
        .option("quoteAll", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    back = read_csv(spark, out, "id bigint, text string", multiline=True)
    got = {r.id: r.text for r in back.collect()}
    want = dict(rows)
    # empty string vs null is the one documented CSV ambiguity: Spark
    # writes "" and reads it back as null unless emptyValue is pinned
    want[4] = None
    assert got == want


def test_csv_roundtrip_null_vs_empty_string(spark, tmp_path):
    """With an explicit non-empty nullValue on both write and read
    (the q122 settings), NULL and '' stay distinct through the CSV
    round-trip — the one ambiguity the default nullValue='' cannot
    express under quoteAll."""
    from diachronic_spark.sources.files import read_csv

    rows = [(1, "plain"), (2, ""), (3, None), (4, "__SQL_NULL__x")]
    d = spark.createDataFrame(rows, "id bigint, text string")
    out = str(tmp_path / "csv")
    (
        d.write.option("header", "true")
        .option("quoteAll", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", "__SQL_NULL__")
        .csv(out)
    )
    back = read_csv(
        spark, out, "id bigint, text string", multiline=True,
        null_value="__SQL_NULL__",
    )
    got = {r.id: r.text for r in back.collect()}
    assert got == dict(rows)


def test_schema_drift_scan_twins_produce_one_relation(spark, sf_dir):
    """q147 (mergeSchema inference) and q153 (explicit unified schema
    — the 100 TB recommendation: one footer read at planning) must
    produce the same relation over the same staged drift layout, with
    identical schemas and identical rows."""
    from diachronic_spark.plans.ext_queries import q147, q153

    a = q147(spark, sf_dir)
    b = q153(spark, sf_dir)
    assert a.schema == b.schema
    assert a.collect() == b.collect()
