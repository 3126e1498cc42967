"""WebDataset tar-shard ingestion tests (sources/files.py
read_webdataset, sources/wds_fixture.py).

Anchors: (1) the committed shards scan to rows bit-exact against the
pre-assembly sample-dict truth (pixel sha over RAW pixels — the
extract→decode composition); (2) the format rules are enforced:
first-dot key split (multi-part extensions group correctly),
ADJACENCY (a recurring key raises — the property tar streaming
depends on); (3) contract violations are loud (missing image/cls,
extensionless members, corrupt tar)."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pandas as pd
import pytest

from diachronic_spark.sources.files import WdsError, read_webdataset
from diachronic_spark.sources.wds_fixture import (
    TRUTH_PATH,
    WDS_DIR,
    generate_shards,
    truth_rows,
)


def _scan_blob(blob: bytes) -> pd.DataFrame:
    """Drive the mapInPandas body directly (no SparkSession)."""
    captured = {}

    class FakeDF:
        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    class FakeReader:
        def format(self, *_): return self
        def option(self, *_): return self
        def load(self, *_): return self
        def select(self, *_): return FakeDF()

    class FakeSpark:
        read = FakeReader()

    read_webdataset(FakeSpark(), "unused")
    batches = iter([pd.DataFrame({"path": ["p"], "content": [blob]})])
    return pd.concat(list(captured["fn"](batches)), ignore_index=True)


def test_fixture_set_scans_bit_exact_vs_truth():
    for sh in generate_shards():
        pdf = _scan_blob(sh["blob"])
        truths = truth_rows(sh)
        assert len(pdf) == len(truths)
        for (_, row), t in zip(pdf.iterrows(), truths):
            assert row["key"] == t["key"]
            assert row["n_members"] == t["n_members"]
            assert row["cls"] == t["cls"]
            assert row["caption"] == t["caption"] or (
                row["caption"] is None and t["caption"] is None
            )
            assert (row["width"], row["height"], row["channels"]) == (
                t["width"], t["height"], t["channels"]
            )
            assert row["pix_sha"] == t["pix_sha"]


def test_committed_wds_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    shards = generate_shards()
    assert len(shards) == 3
    for sh in shards:
        with open(os.path.join(WDS_DIR, sh["name"]), "rb") as f:
            assert f.read() == sh["blob"], f"fixture drift: {sh['name']}"
    stored = sorted(
        pq.read_table(TRUTH_PATH).to_pylist(),
        key=lambda r: (r["shard"], r["sample_idx"]),
    )
    fresh = sorted(
        (r for sh in shards for r in truth_rows(sh)),
        key=lambda r: (r["shard"], r["sample_idx"]),
    )
    assert fresh == stored


def test_multipart_extension_groups_under_first_dot():
    sh = generate_shards()[1]
    pdf = _scan_blob(sh["blob"])
    row = pdf[pdf["key"] == "val/s_0003"].iloc[0]
    # png + cls + txt + json + depth.npy = 5 members, one sample
    assert row["n_members"] == 5


def _tar_of(members: list) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_loud_rejections():
    from diachronic_spark.functions import png as PNG

    img = PNG.encode_png(2, 2, 3, bytes(12))
    # non-adjacent recurrence of a key
    bad = _tar_of(
        [
            ("a.png", img), ("a.cls", b"1"),
            ("b.png", img), ("b.cls", b"2"),
            ("a.txt", b"late member"),
        ]
    )
    with pytest.raises(WdsError, match="non-adjacently"):
        _scan_blob(bad)
    # missing cls
    with pytest.raises(WdsError, match="lacks an image or cls"):
        _scan_blob(_tar_of([("a.png", img), ("a.txt", b"t")]))
    # extensionless member
    with pytest.raises(WdsError, match="no extension"):
        _scan_blob(_tar_of([("noext", b"x")]))
    # corrupt shard
    with pytest.raises(WdsError, match="bad tar shard"):
        _scan_blob(b"definitely not a tar" * 40)


# --- token shards (q188; the tar twin of the q184 parquet sink) -------------


def _token_tar(members) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def _scan_token_blob(spark_, blob: bytes, tmp_path) -> list:
    from diachronic_spark.sources.files import read_wds_token_shards

    p = tmp_path / "t.tar"
    p.write_bytes(blob)
    return read_wds_token_shards(spark_, str(tmp_path)).collect()


def test_token_shards_roundtrip_matches_parquet_twin(spark, sf_dir):
    """q188's relation must equal q184's row-for-row (same chain,
    two at-rest layouts) with the key rendered by the writer rule —
    and the shard bytes must be deterministic (mtime pinned)."""
    from diachronic_spark.plans import QUERIES

    wds = QUERIES["q188"](spark, sf_dir).collect()
    pq = QUERIES["q184"](spark, sf_dir).collect()
    assert len(wds) == len(pq)
    for a, b in zip(wds, pq):
        assert (a.bucket, a.pack_id, a.n_docs, a.pack_tokens) == (
            b.bucket, b.pack_id, b.n_docs, b.pack_tokens
        )
        assert a.tokens_text == b.tokens_text
        assert a.key == f"{b.bucket:04d}-{b.pack_id:08d}"


def test_token_shard_write_is_byte_deterministic(spark, tmp_path):
    from diachronic_spark.operators.bpe import (
        RE_TOKEN_UNI,
        build_packed_shards,
    )
    from diachronic_spark.sources.bpe_fixture import load_byte_merges
    from diachronic_spark.sources.files import write_wds_token_shards

    df = spark.createDataFrame(
        [(i, f"word{i} common text") for i in range(6)],
        "doc_id bigint, text string",
    )
    packs = build_packed_shards(
        df, load_byte_merges(), bin_tokens=32, n_buckets=1,
        byte_level=True, pretoken_re=RE_TOKEN_UNI,
    )
    d1, d2 = tmp_path / "a", tmp_path / "b"
    write_wds_token_shards(packs, str(d1))
    write_wds_token_shards(packs, str(d2))
    (f1,) = list(d1.iterdir())
    (f2,) = list(d2.iterdir())
    assert f1.name == f2.name
    assert f1.read_bytes() == f2.read_bytes()


def test_token_shard_mass_mismatch_is_loud(spark, tmp_path):
    from diachronic_spark.sources.files import WdsError

    bad = _token_tar(
        [
            ("0000-00000000.txt", b"tok1\ntok2"),
            ("0000-00000000.json",
             b'{"n_docs": 1, "pack_tokens": 5}'),
        ]
    )
    with pytest.raises(Exception, match="corrupt shard"):
        _scan_token_blob(spark, bad, tmp_path)


def test_token_shard_missing_member_is_loud(spark, tmp_path):
    bad = _token_tar([("0000-00000001.txt", b"tok1")])
    with pytest.raises(Exception, match="lacks txt or json"):
        _scan_token_blob(spark, bad, tmp_path)
