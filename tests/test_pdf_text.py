"""PDF text extraction tests (functions/pdf.py, sources/files.py).

Anchors: (1) the committed fixtures extract BIT-EXACTLY to the
layout-policy replay of their operation scripts — through Flate/
none/ASCIIHex/LZW/ASCII85 filters, ObjStm-packed objects, octal
escapes, hex strings, CID ToUnicode mapping, a two-level page tree,
and a raw-stream object-lookalike decoy; (2) EXTERNAL validation —
both host /usr/share/doc PDFs (real PDF 1.5 xref-stream + ObjStm
files written by other toolchains) extract end-to-end and contain
known words; (3) the declared loud edges: /Encrypt, Type0 without
ToUnicode, unsupported filters, truncated streams."""

from __future__ import annotations

import os

import pytest

from diachronic_spark.functions.pdf import (
    PdfError,
    extract_text,
    page_count,
    parse_object,
)
from diachronic_spark.sources.pdf_fixture import (
    PDFS_DIR,
    TRUTH_PATH,
    generate_pdfs,
    truth_rows,
)

_HOST_PDFS = {
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf": "Syntax Notation One",
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf":
        "Shared MIME-info Database",
}


def test_fixture_set_extracts_bit_exact_vs_policy_replay():
    for d in generate_pdfs():
        pages = extract_text(d["blob"])
        truths = truth_rows(d)
        assert len(pages) == len(truths)
        for p, t in zip(pages, truths):
            assert p == t["text"], (
                f"doc {d['doc_id']} page {t['page_idx']} diverged"
            )


def test_committed_pdf_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    docs = generate_pdfs()
    assert len(docs) == 5
    for d in docs:
        path = os.path.join(PDFS_DIR, f"doc_{d['doc_id']:03d}.pdf")
        with open(path, "rb") as f:
            assert f.read() == d["blob"], f"fixture drift: {path}"
    stored = sorted(
        pq.read_table(TRUTH_PATH).to_pylist(),
        key=lambda r: (r["doc_id"], r["page_idx"]),
    )
    fresh = sorted(
        (r for d in docs for r in truth_rows(d)),
        key=lambda r: (r["doc_id"], r["page_idx"]),
    )
    assert fresh == stored


def test_host_pdfs_extract_end_to_end():
    """Real 1.5-era xref-stream + ObjStm files from other toolchains
    — the recovery-mode scan must walk them fully."""
    found = False
    for path, needle in _HOST_PDFS.items():
        if not os.path.exists(path):
            continue
        found = True
        with open(path, "rb") as f:
            pages = extract_text(f.read())
        assert len(pages) > 5
        joined = "\n".join(pages)
        assert needle in joined, f"{needle!r} not found in {path}"
    if not found:
        pytest.skip("no host PDFs present")


def test_cid_and_filters_are_load_bearing():
    docs = generate_pdfs()
    # d3's CID page decodes Greek through the ToUnicode CMap
    t3 = extract_text(docs[3]["blob"])[0]
    assert "αβγ" in t3 and "ΔΕ" in t3
    # d2's page lives in an ObjStm and its content is LZW
    t2 = extract_text(docs[2]["blob"])[0]
    assert "objstm page, lzw content" in t2
    # the decoy registers as a phantom object without derailing d1
    t1 = extract_text(docs[1]["blob"])[0]
    assert "decoy: 12 0 obj" in t1
    # TJ kern threshold: -99 concatenates, -100 spaces
    assert "ab c" in t1


def test_loud_rejections():
    blob = generate_pdfs()[0]["blob"]

    with pytest.raises(PdfError, match="header"):
        extract_text(b"not a pdf at all")
    with pytest.raises(PdfError, match="encrypted"):
        extract_text(
            blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        )
    with pytest.raises(PdfError, match="unsupported stream filter"):
        extract_text(
            blob.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode", 1)
        )
    # Type0 without ToUnicode
    d3 = generate_pdfs()[3]["blob"]
    with pytest.raises(PdfError, match="ToUnicode"):
        extract_text(d3.replace(b"/ToUnicode 7 0 R", b"/T0Unicode 7 0 R"))
    # corrupt Flate stream: flip the first two bytes of a stream body
    pos = blob.find(b"stream\n") + 7
    broken = blob[:pos] + b"\x00\x00" + blob[pos + 2 :]
    with pytest.raises(PdfError):
        extract_text(broken)


def test_object_grammar_corners():
    # names with #-escapes, nested parens, octal strings, refs
    obj, _ = parse_object(b"<< /A#20B (x(y)z) /C <41 42> /D 3 0 R >>", 0)
    assert obj["A B"] == b"x(y)z"
    assert obj["C"] == b"AB"
    from diachronic_spark.functions.pdf import Ref

    assert obj["D"] == Ref(3)
    obj, _ = parse_object(rb"(oct \101\102 nl \n done)", 0)
    assert obj == b"oct AB nl \n done"


def test_inherited_resources_resolve_through_page_tree():
    """ADVICE r8: /Resources is inheritable (PDF 7.7.3.4). A page
    with no local Resources must pick up the ancestor's font map —
    both for correct simple-font decoding and so the Type0
    no-ToUnicode contract stays loud instead of Latin-1 garbage."""
    import zlib

    from diachronic_spark.sources.pdf_fixture import (
        _assemble,
        _obj,
        _render_content,
        _stream_obj,
        _SIMPLE_FONT,
    )

    content = zlib.compress(
        _render_content([("BT",), ("Tf", "F1"), ("Tj", "inherited ok"),
                         ("ET",)])
    )
    # Resources lives on the Pages node; page 3 carries none
    blob = _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
                        b"/Resources << /Font << /F1 6 0 R >> >> >>")),
            (3, _obj(3, b"<< /Type /Page /Parent 2 0 R "
                        b"/Contents 5 0 R >>")),
            (5, _stream_obj(5, b"/Filter /FlateDecode", content)),
            (6, _obj(6, _SIMPLE_FONT)),
        ]
    )
    assert extract_text(blob) == ["inherited ok"]

    # same tree, but the inherited font is Type0 WITHOUT ToUnicode:
    # the loud contract must fire through the inheritance walk
    t0 = (b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
          b"/Encoding /Identity-H >>")
    loud = _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
                        b"/Resources << /Font << /F1 6 0 R >> >> >>")),
            (3, _obj(3, b"<< /Type /Page /Parent 2 0 R "
                        b"/Contents 5 0 R >>")),
            (5, _stream_obj(5, b"/Filter /FlateDecode", content)),
            (6, _obj(6, t0)),
        ]
    )
    with pytest.raises(PdfError, match="ToUnicode"):
        extract_text(loud)


def test_objstm_without_stream_is_loud():
    """ADVICE r8: an /ObjStm dict with no stream payload must raise
    the declared PdfError, not a raw KeyError."""
    from diachronic_spark.sources.pdf_fixture import _assemble, _obj

    blob = _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [] /Count 0 >>")),
            (4, _obj(4, b"<< /Type /ObjStm /N 1 /First 4 >>")),
        ]
    )
    with pytest.raises(PdfError, match="no stream data"):
        extract_text(blob)
