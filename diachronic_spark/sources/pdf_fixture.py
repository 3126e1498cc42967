"""Deterministic PDF text-extraction fixture.

Five documents covering the extractor's axes: multi-page with Flate
content and octal-escaped Latin-1 literal strings, a Contents ARRAY
mixing an unfiltered stream with an ASCIIHexDecode one (plus the
' / " / T* operators and hex strings), page + font dicts packed in
a /ObjStm object stream with LZWDecode content (the TIFF-convention
coder, encoded by the INDEPENDENT tiff_fixture encoder), a Type0
(CID) font whose hex-string text decodes through a /ToUnicode CMap
(bfchar + bfrange) mixed with simple-font segments via Tf
switching, and an ASCII85 stream under a two-level page tree.

Independence structure: each page is DEFINED as a list of text
OPERATIONS first; the truth string replays the DECLARED layout
policy (' / " / T* / TD → newline; TJ kern ≤ -100 → space;
concatenate otherwise) with ten lines of plain Python, while the
assembler renders the SAME operations into real content streams —
escapes, octal bytes, hex strings, kerning arrays, font switches,
positioning noise — wrapped in real filters and a real xref/trailer
skeleton. The engine must unwind all of that to reproduce the
truth; the truth never touches a parser, a filter, or an escape.
"""

from __future__ import annotations

import os
import zlib

from .tiff_fixture import _lzw_encode

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
PDFS_DIR = os.path.join(_HERE, "fixtures", "pdf")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "pdf_truth.parquet")


# --- the declared layout policy, replayed in plain Python ------------------

def render_ops(ops: list) -> str:
    out = []
    for op in ops:
        k = op[0]
        if k == "Tj":
            out.append(op[1])
        elif k in ("'", '"'):
            out.append("\n" + op[1])
        elif k in ("T*", "TD"):
            out.append("\n")
        elif k == "TJ":
            for el in op[1]:
                if isinstance(el, str):
                    out.append(el)
                elif el <= -100:
                    out.append(" ")
    return "".join(out)


# --- per-document page operation scripts ------------------------------------

_D0_PAGES = [
    [
        ("Tj", "Hello Wörld « (parens) and \\backslash\\ »"),
        ("T*",),
        ("TJ", ["Kerned", -250, "gap", -50, "close", -1500, "far"]),
        ("'", "präzise Zeile zwei"),
    ],
    [
        ("Tj", "Seite 2: ÄÖÜ äöü ß ¡¿"),
        ("TD",),
        ("Tj", "ende."),
    ],
]

_D1_PAGES = [
    [
        # the literal below lands RAW in an unfiltered stream — the
        # linear object scan must register the lookalike as a
        # phantom (unreferenced) object, never derail extraction
        ("Tj", "plain first; decoy: 12 0 obj << /X 1 >> endobj ."),
        ("'", "apostrophe line"),
        ('"', "quoted line"),
        # second content stream (ASCIIHex) continues the same page
        ("Tj", " hex-filtered tail"),
        ("TJ", ["a", -99, "b", -100, "c"]),  # -99 is NOT a space
    ],
]

_D2_PAGES = [
    [
        ("Tj", "objstm page, lzw content"),
        ("T*",),
        ("Tj", "0 0 obj decoy inside a string endobj"),
    ],
]

# CID text: codes 0x2000.. map via bfchar; 0x3000-0x3005 via bfrange
_D3_CID_CHARS = {0x2000: "α", 0x2001: "β", 0x2002: "γ"}
_D3_RANGE_BASE = 0x0394  # Δ..
_D3_PAGES = [
    [
        ("Tj", "latin intro: "),
        ("cid", [0x2000, 0x2001, 0x2002, 0x3000, 0x3001, 0x3005]),
        ("'", "back to simple"),
    ],
]

_D4_PAGES = [
    [("Tj", "ascii85 page one")],
    [("Tj", "deep tree page two"), ("T*",), ("Tj", "fin")],
]


def _d3_cid_to_text(codes: list) -> str:
    out = []
    for c in codes:
        if c in _D3_CID_CHARS:
            out.append(_D3_CID_CHARS[c])
        else:
            out.append(chr(_D3_RANGE_BASE + (c - 0x3000)))
    return "".join(out)


def _page_truth(doc_id: int, ops: list) -> str:
    # expand cid pseudo-ops into their decoded text before replay
    expanded = []
    for op in ops:
        if op[0] == "cid":
            expanded.append(("Tj", _d3_cid_to_text(op[1])))
        else:
            expanded.append(op)
    return render_ops(expanded)


# --- content-stream rendering (the engine must unwind all of this) ---------

def _lit(s: str) -> bytes:
    """Literal string with (), \\ escaped and >127 as octal."""
    out = bytearray(b"(")
    for b in s.encode("latin-1"):
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif b > 127:
            out += ("\\%03o" % b).encode()
        else:
            out.append(b)
    return bytes(out) + b")"


def _hexstr(s: str) -> bytes:
    return b"<" + s.encode("latin-1").hex().encode() + b">"


def _render_content(ops: list, hex_every_other: bool = False) -> bytes:
    """Render operations as a content stream with positioning noise."""
    parts = [b"BT /F1 12 Tf 14 TL 1 0 0 1 72 720 Tm 0 g"]
    for i, op in enumerate(ops):
        k = op[0]
        enc = (
            _hexstr if (hex_every_other and i % 2 == 1) else _lit
        )
        if k == "Tj":
            parts.append(b"0.2 w " + enc(op[1]) + b" Tj")
        elif k == "'":
            parts.append(enc(op[1]) + b" '")
        elif k == '"':
            parts.append(b"0 0.1 " + enc(op[1]) + b' "')
        elif k == "T*":
            parts.append(b"T*")
        elif k == "TD":
            parts.append(b"2 -14 TD")
        elif k == "TJ":
            el = b" ".join(
                _lit(e) if isinstance(e, str) else str(e).encode()
                for e in op[1]
            )
            parts.append(b"[" + el + b"] TJ")
        elif k == "cid":
            codes = b"".join(c.to_bytes(2, "big") for c in op[1])
            parts.append(
                b"/F2 12 Tf <" + codes.hex().encode() + b"> Tj /F1 12 Tf"
            )
    parts.append(b"ET")
    return b" ".join(parts)


def _stream_obj(num: int, dict_extra: bytes, data: bytes) -> bytes:
    return (
        b"%d 0 obj\n<< /Length %d %s >>\nstream\n" % (num, len(data), dict_extra)
        + data
        + b"\nendstream\nendobj\n"
    )


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _assemble(objs: list) -> bytes:
    """objs: list of (num, bytes). Emits header, bodies, a correct
    classic xref table, trailer (/Root = object 1), EOF."""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += body
    xref_off = len(out)
    max_num = max(offsets)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for n in range(1, max_num + 1):
        if n in offsets:
            out += b"%010d 00000 n \n" % offsets[n]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_off)
    )
    return bytes(out)


_SIMPLE_FONT = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"


def _tounicode_cmap() -> bytes:
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"begincmap",
        b"3 beginbfchar",
    ]
    for code, ch in sorted(_D3_CID_CHARS.items()):
        lines.append(
            b"<%04x> <%04x>" % (code, ord(ch))
        )
    lines += [
        b"endbfchar",
        b"1 beginbfrange",
        b"<3000> <3005> <%04x>" % _D3_RANGE_BASE,
        b"endbfrange",
        b"endcmap end",
    ]
    return b"\n".join(lines)


def _build_d0() -> bytes:
    c1 = zlib.compress(_render_content(_D0_PAGES[0]))
    c2 = zlib.compress(_render_content(_D0_PAGES[1]))
    return _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")),
            (3, _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
                        b"/Resources << /Font << /F1 7 0 R >> >> >>")),
            (4, _obj(4, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
                        b"/Resources << /Font << /F1 7 0 R >> >> >>")),
            (5, _stream_obj(5, b"/Filter /FlateDecode", c1)),
            (6, _stream_obj(6, b"/Filter /FlateDecode", c2)),
            (7, _obj(7, _SIMPLE_FONT)),
        ]
    )


def _build_d1() -> bytes:
    ops = _D1_PAGES[0]
    plain = _render_content(ops[:3], hex_every_other=True)
    hexed = _render_content(ops[3:])
    ahx = hexed.hex().encode() + b">"
    return _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")),
            (3, _obj(3, b"<< /Type /Page /Parent 2 0 R "
                        b"/Contents [4 0 R 5 0 R] "
                        b"/Resources << /Font << /F1 6 0 R >> >> >>")),
            (4, _stream_obj(4, b"", plain)),
            (5, _stream_obj(5, b"/Filter /ASCIIHexDecode", ahx)),
            (6, _obj(6, _SIMPLE_FONT)),
        ]
    )


def _build_d2() -> bytes:
    content = _lzw_encode(_render_content(_D2_PAGES[0]))
    # page dict + font dict live INSIDE an ObjStm
    m3 = b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R " \
         b"/Resources << /Font << /F1 6 0 R >> >> >>"
    m6 = _SIMPLE_FONT
    header = b"3 0 6 %d " % (len(m3) + 1)
    body = m3 + b" " + m6
    objstm_payload = header + body
    first = len(header)
    packed = zlib.compress(objstm_payload)
    return _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")),
            (5, _stream_obj(5, b"/Filter /LZWDecode", content)),
            (7, _stream_obj(
                7,
                b"/Type /ObjStm /N 2 /First %d /Filter /FlateDecode"
                % first,
                packed,
            )),
        ]
    )


def _build_d3() -> bytes:
    content = zlib.compress(_render_content(_D3_PAGES[0]))
    cmap = zlib.compress(_tounicode_cmap())
    return _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")),
            (3, _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                        b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> "
                        b">> >>")),
            (4, _stream_obj(4, b"/Filter /FlateDecode", content)),
            (5, _obj(5, _SIMPLE_FONT)),
            (6, _obj(6, b"<< /Type /Font /Subtype /Type0 "
                        b"/BaseFont /Fixture-CID /ToUnicode 7 0 R >>")),
            (7, _stream_obj(7, b"/Filter /FlateDecode", cmap)),
        ]
    )


def _build_d4() -> bytes:
    import base64

    c1 = base64.a85encode(_render_content(_D4_PAGES[0])) + b"~>"
    c2 = zlib.compress(_render_content(_D4_PAGES[1]))
    return _assemble(
        [
            (1, _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")),
            (2, _obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")),
            (3, _obj(3, b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R] "
                        b"/Count 1 >>")),
            (4, _obj(4, b"<< /Type /Pages /Parent 2 0 R /Kids [6 0 R] "
                        b"/Count 1 >>")),
            (5, _obj(5, b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R "
                        b"/Resources << /Font << /F1 9 0 R >> >> >>")),
            (6, _obj(6, b"<< /Type /Page /Parent 4 0 R /Contents 8 0 R "
                        b"/Resources << /Font << /F1 9 0 R >> >> >>")),
            (7, _stream_obj(7, b"/Filter /ASCII85Decode", c1)),
            (8, _stream_obj(8, b"/Filter /FlateDecode", c2)),
            (9, _obj(9, _SIMPLE_FONT)),
        ]
    )


_PAGE_SCRIPTS = [_D0_PAGES, _D1_PAGES, _D2_PAGES, _D3_PAGES, _D4_PAGES]
_BUILDERS = [_build_d0, _build_d1, _build_d2, _build_d3, _build_d4]


def generate_pdfs() -> list:
    out = []
    for doc_id, (pages, build) in enumerate(
        zip(_PAGE_SCRIPTS, _BUILDERS)
    ):
        out.append(
            {
                "doc_id": doc_id,
                "blob": build(),
                "pages": pages,
            }
        )
    return out


def truth_rows(d: dict) -> list:
    rows = []
    for idx, ops in enumerate(d["pages"]):
        text = _page_truth(d["doc_id"], ops)
        rows.append(
            {
                "doc_id": d["doc_id"],
                "page_idx": idx,
                "n_pages": len(d["pages"]),
                "text": text,
                "n_chars": len(text),
            }
        )
    return rows
