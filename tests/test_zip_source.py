"""ZIP dataset-archive ingestion tests (sources/files.py,
sources/zip_fixture.py).

Anchors: (1) the committed archives read back bit-exactly against
the pre-archiving member-pair truth; (2) the declared text policy is
extension-based and case-insensitive; (3) corruption is loud —
stdlib CRC verification surfaces a flipped payload byte instead of
yielding silent garbage; (4) archives are regenerable byte-stable.
"""

from __future__ import annotations

import hashlib
import io
import os
import zipfile

import pytest

from diachronic_spark.sources.zip_fixture import (
    TEXT_EXTS,
    TRUTH_PATH,
    ZIPS_DIR,
    generate_zips,
    truth_rows,
)


def test_fixture_set_reads_back_bit_exact_vs_truth():
    for zf in generate_zips():
        with zipfile.ZipFile(io.BytesIO(zf["blob"])) as z:
            infos = z.infolist()
            truths = truth_rows(zf)
            assert len(infos) == len(truths)
            for info, t in zip(infos, truths):
                data = z.read(info)
                assert info.filename == t["name"]
                assert len(data) == t["n_bytes"]
                assert (
                    hashlib.sha256(data).hexdigest() == t["content_sha"]
                )


def test_committed_zip_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    zips = generate_zips()
    assert len(zips) == 3
    for zf in zips:
        with open(os.path.join(ZIPS_DIR, zf["name"]), "rb") as f:
            assert f.read() == zf["blob"], f"fixture drift: {zf['name']}"
    stored = sorted(
        pq.read_table(TRUTH_PATH).to_pylist(),
        key=lambda r: (r["zip_id"], r["entry_idx"]),
    )
    fresh = sorted(
        (r for zf in zips for r in truth_rows(zf)),
        key=lambda r: (r["zip_id"], r["entry_idx"]),
    )
    assert fresh == stored


def test_text_policy_extension_rules():
    rows = [r for zf in generate_zips() for r in truth_rows(zf)]
    by_name = {r["name"]: r for r in rows}
    assert by_name["UPPER.CSV"]["text"] is not None  # case-insensitive
    assert by_name["blob.bin"]["text"] is None
    assert by_name["assets/logo.png"]["text"] is None
    assert by_name["assets/empty.txt"]["text"] == ""
    assert "wält" in by_name["data/train.csv"]["text"]
    assert all(e == e.lower() for e in TEXT_EXTS)


def test_corruption_is_loud():
    """Flip one payload byte in a STORED member: the stdlib CRC check
    must raise, never return garbage rows."""
    zf = generate_zips()[1]
    blob = bytearray(zf["blob"])
    # corrupt the STORED PNG member (deflated members would often
    # fail at inflate instead — CRC is the stored path's only guard)
    png_sig = b"\x89PNG"
    pos = bytes(blob).find(png_sig)
    assert pos > 0
    blob[pos + 10] ^= 0xFF
    with zipfile.ZipFile(io.BytesIO(bytes(blob))) as z:
        with pytest.raises(zipfile.BadZipFile):
            z.read("assets/logo.png")
    # truncated central directory is loud at open
    with pytest.raises(zipfile.BadZipFile):
        zipfile.ZipFile(io.BytesIO(zf["blob"][:-20]))


def test_method_column_covers_all_stdlib_codecs(spark, tmp_path):
    """ADVICE r8: bzip2/lzma members read fine via stdlib but were
    mislabeled 'stored'; the method column must name the real codec,
    and out-of-scope methods must raise instead of mislabeling."""
    from diachronic_spark.sources.files import (
        _ZIP_METHODS,
        read_zip_entries,
    )

    p = tmp_path / "mixed.zip"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            zipfile.ZipInfo("a.txt"), b"alpha" * 40,
        )
        z.writestr("b.txt", b"beta" * 40, zipfile.ZIP_DEFLATED)
        z.writestr("c.txt", b"gamma" * 40, zipfile.ZIP_BZIP2)
        z.writestr("d.txt", b"delta" * 40, zipfile.ZIP_LZMA)
    rows = (
        read_zip_entries(spark, str(tmp_path), glob="mixed.zip")
        .orderBy("entry_idx")
        .collect()
    )
    assert [r.method for r in rows] == [
        "stored", "deflate", "bzip2", "lzma",
    ]
    # every content round-trips despite the codec mix
    with zipfile.ZipFile(p) as z:
        for r in rows:
            data = z.read(r.name)
            assert hashlib.sha256(data).hexdigest() == r.content_sha
    # the map is exactly the stdlib-readable set
    assert set(_ZIP_METHODS.values()) == {
        "stored", "deflate", "bzip2", "lzma",
    }
