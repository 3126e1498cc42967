"""Pure-stdlib PDF text extraction.

PDF is the dominant document format of a web corpus after HTML, and
its text layer is the highest-value payload a curation pipeline
extracts. This module implements the RECOVERY-MODE strategy real
parsers use on damaged files — a linear scan for ``N G obj``
objects plus expansion of /ObjStm object streams — which makes the
cross-reference machinery advisory and unused: classic xref tables
and PDF 1.5 xref streams both parse identically because neither is
consulted. (The two host PDFs under /usr/share/doc are 1.5-era
xref-stream + ObjStm files and extract end-to-end;
tests/test_pdf_text.py pins known words from each.)

Scope, all DECLARED and loud at the edges:
- object grammar: numbers, names (#xx escapes), literal strings
  (escapes, octal, balanced parens), hex strings, arrays, dicts,
  references, streams (/Length resolved through references);
  later duplicate object ids win (incremental-update semantics),
  ObjStm members fill vacancies only;
- stream filters: FlateDecode, LZWDecode (the TIFF early-change
  convention — PDF adopted it from TIFF, functions/tiff.py's
  decoder is reused), ASCIIHexDecode, ASCII85Decode, filter chains;
  anything else (DCT, JBIG2, Crypt, predictors) raises;
- text layer: BT/ET blocks with Tf font tracking; Tj / ' / " / TJ
  text-showing operators. The layout policy is declared, not
  positional: ' and " and T* and TD prepend a newline, TJ numeric
  kerns ≤ -100/1000 em insert a space, everything else
  concatenates;
- encodings: simple fonts decode bytes as Latin-1 (declared
  approximation — exact for the fixture corpus, best-effort for
  wild Type1 /Differences fonts); Type0 (CID) fonts REQUIRE a
  /ToUnicode CMap (bfchar + bfrange over 2-byte codes) and raise
  without one — silently emitting CID integers would poison text;
- /Encrypt anywhere in the file raises (no key derivation here).

Format per the public ISO 32000-1 specification.
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    """Loud rejection for malformed or unsupported PDF input."""


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):
        return f"Ref({self.num})"

    def __eq__(self, other):
        return isinstance(other, Ref) and other.num == self.num

    def __hash__(self):
        return hash(("Ref", self.num))


class Name(str):
    """A PDF /Name (distinct from strings)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(b: bytes, i: int) -> int:
    n = len(b)
    while i < n:
        c = b[i : i + 1]
        if c in b"%":
            j = b.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


def _parse_name(b: bytes, i: int):
    j = i + 1
    out = bytearray()
    n = len(b)
    while j < n and b[j : j + 1] not in _WS and b[j : j + 1] not in _DELIM:
        if b[j] == 0x23 and j + 2 < n:  # '#xx'
            out.append(int(b[j + 1 : j + 3], 16))
            j += 3
        else:
            out.append(b[j])
            j += 1
    return Name(out.decode("latin-1")), j


def _parse_literal_string(b: bytes, i: int):
    out = bytearray()
    depth = 1
    j = i + 1
    n = len(b)
    while j < n:
        c = b[j]
        if c == 0x5C:  # backslash
            j += 1
            if j >= n:
                break
            e = b[j]
            mapped = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
            if e in mapped:
                out.append(mapped[e])
                j += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                k = j
                while k < j + 3 and k < n and 0x30 <= b[k] <= 0x37:
                    k += 1
                out.append(int(b[j:k], 8) & 0xFF)
                j = k
            elif e == 0x0A:
                j += 1  # line continuation
            else:
                out.append(e)
                j += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            j += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), j + 1
            out.append(c)
            j += 1
        else:
            out.append(c)
            j += 1
    raise PdfError(f"unterminated literal string at {i}")


def _parse_hex_string(b: bytes, i: int):
    j = b.find(b">", i)
    if j < 0:
        raise PdfError(f"unterminated hex string at {i}")
    hx = re.sub(rb"\s", b"", b[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R(?![A-Za-z0-9])")


def parse_object(b: bytes, i: int):
    """Parse one PDF object at (whitespace-skipped) position i.
    Returns (obj, next_pos)."""
    i = _skip_ws(b, i)
    if i >= len(b):
        raise PdfError("unexpected end of data")
    c = b[i : i + 1]
    if c == b"/":
        return _parse_name(b, i)
    if c == b"(":
        return _parse_literal_string(b, i)
    if b[i : i + 2] == b"<<":
        d = {}
        j = i + 2
        while True:
            j = _skip_ws(b, j)
            if b[j : j + 2] == b">>":
                return d, j + 2
            if b[j : j + 1] != b"/":
                raise PdfError(f"dict key is not a name at {j}")
            key, j = _parse_name(b, j)
            val, j = parse_object(b, j)
            d[key] = val
    if c == b"<":
        return _parse_hex_string(b, i)
    if c == b"[":
        arr = []
        j = i + 1
        while True:
            j = _skip_ws(b, j)
            if b[j : j + 1] == b"]":
                return arr, j + 1
            val, j = parse_object(b, j)
            arr.append(val)
    m = _REF_RE.match(b, i)
    if m:
        return Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(b, i)
    if m:
        tok = m.group(0)
        val = float(tok) if b"." in tok else int(tok)
        return val, m.end()
    for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
        if b[i : i + len(kw)] == kw:
            return val, i + len(kw)
    raise PdfError(f"unparseable token at {i}: {b[i:i+20]!r}")


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDoc:
    def __init__(self, objects: dict, streams: dict):
        self.objects = objects  # num -> parsed object
        self.streams = streams  # num -> raw stream bytes (undecoded)

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            v = self.objects.get(v.num)
            seen += 1
            if seen > 32:
                raise PdfError("reference chain too deep")
        return v


def _decode_filters(doc: PdfDoc, d: dict, raw: bytes) -> bytes:
    filters = doc.resolve(d.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = doc.resolve(d.get("DecodeParms"))
    if parms is not None and not isinstance(parms, list):
        parms = [parms]
    for fi, f in enumerate(filters):
        p = doc.resolve(parms[fi]) if parms and fi < len(parms) else None
        if p and doc.resolve(p.get("Predictor", 1)) not in (None, 1):
            raise PdfError("stream predictors unsupported")
        if f == "FlateDecode" or f == "Fl":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise PdfError(f"bad Flate stream: {e}") from None
        elif f == "LZWDecode" or f == "LZW":
            from .tiff import TiffError, _lzw_decode

            # PDF adopted TIFF's early-change LZW (decode to EOI)
            try:
                raw = _lzw_decode(raw, None)
            except TiffError as e:
                raise PdfError(f"bad LZW stream: {e}") from None
        elif f == "ASCIIHexDecode" or f == "AHx":
            body = raw.split(b">", 1)[0]
            hx = re.sub(rb"\s", b"", body)
            if len(hx) % 2:
                hx += b"0"
            raw = bytes.fromhex(hx.decode("ascii"))
        elif f == "ASCII85Decode" or f == "A85":
            import base64

            body = raw.split(b"~>", 1)[0]
            raw = base64.a85decode(re.sub(rb"\s", b"", body))
        else:
            raise PdfError(f"unsupported stream filter /{f}")
    return raw


def scan_pdf(blob: bytes) -> PdfDoc:
    """Linear-scan object recovery + ObjStm expansion."""
    blob = bytes(blob)
    if not blob.startswith(b"%PDF-"):
        raise PdfError("missing %PDF header")
    if b"/Encrypt" in blob:
        raise PdfError("encrypted PDF unsupported")
    objects: dict = {}
    hits: list = []
    # pass 1: parse every object VALUE (no stream extraction yet) so
    # forward-referenced /Length ints resolve in pass 2 — indirect
    # /Length exists precisely because writers emit it after the data
    for m in _OBJ_RE.finditer(blob):
        num = int(m.group(1))
        try:
            obj, pos = parse_object(blob, m.end())
        except ValueError:
            # tolerated: the linear scan can hit lookalikes inside
            # uncompressed stream bytes (PdfError and the raw
            # ValueError/UnicodeDecodeError of fromhex/int both land
            # here — ValueError is their common base)
            continue
        hits.append((num, obj, pos))
        objects[num] = obj  # later duplicates (updates) win
    streams: dict = {}
    for num, obj, pos in hits:
        pos = _skip_ws(blob, pos)
        if blob[pos : pos + 6] != b"stream":
            continue
        pos += 6
        if blob[pos : pos + 2] == b"\r\n":
            pos += 2
        elif blob[pos : pos + 1] == b"\n":
            pos += 1
        length = obj.get("Length") if isinstance(obj, dict) else None
        if isinstance(length, Ref):
            lobj = objects.get(length.num)
            length = lobj if isinstance(lobj, int) else None
        if isinstance(length, int) and blob[
            pos + length : pos + length + 20
        ].lstrip().startswith(b"endstream"):
            data = blob[pos : pos + length]
        else:  # /Length wrong: scan for endstream (recovery mode)
            e = blob.find(b"endstream", pos)
            if e < 0:
                raise PdfError(f"object {num}: unterminated stream")
            data = blob[pos:e].rstrip(b"\r\n")
        if num in objects and objects[num] is obj:
            streams[num] = data
    doc = PdfDoc(objects, streams)
    # expand object streams — members fill vacancies only
    for num, obj in list(objects.items()):
        if isinstance(obj, dict) and obj.get("Type") == "ObjStm":
            if num not in streams:
                raise PdfError(f"ObjStm {num} has no stream data")
            data = _decode_filters(doc, obj, streams[num])
            n = doc.resolve(obj.get("N"))
            first = doc.resolve(obj.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise PdfError(f"ObjStm {num}: bad N/First")
            pairs, i = [], 0
            for _ in range(n):
                a, i = parse_object(data, i)
                b_, i = parse_object(data, i)
                pairs.append((a, b_))
            for onum, off in pairs:
                if onum not in doc.objects:
                    member, _ = parse_object(data, first + off)
                    doc.objects[onum] = member
    if not doc.objects:
        raise PdfError("no objects recovered")
    return doc


def _find_catalog(doc: PdfDoc) -> dict:
    cat = None
    for num in sorted(doc.objects):
        o = doc.objects[num]
        if isinstance(o, dict) and o.get("Type") == "Catalog":
            cat = o
    if cat is None:
        raise PdfError("no /Catalog object")
    return cat


def _walk_pages(doc: PdfDoc, node, out: list, depth: int = 0) -> None:
    if depth > 64:
        raise PdfError("page tree too deep")
    node = doc.resolve(node)
    if not isinstance(node, dict):
        raise PdfError("bad page-tree node")
    t = node.get("Type")
    if t == "Pages":
        for kid in doc.resolve(node.get("Kids", [])):
            _walk_pages(doc, kid, out, depth + 1)
    elif t == "Page":
        out.append(node)
    else:
        raise PdfError(f"unexpected page-tree node type {t!r}")


def _content_bytes(doc: PdfDoc, page: dict) -> bytes:
    c = doc.resolve(page.get("Contents"))
    refs = c if isinstance(c, list) else [page.get("Contents")]
    out = b""
    for r in refs:
        num = r.num if isinstance(r, Ref) else None
        if num is None or num not in doc.streams:
            raise PdfError("page /Contents is not a stream reference")
        out += _decode_filters(
            doc, doc.objects[num], doc.streams[num]
        ) + b"\n"
    return out


def _parse_tounicode(data: bytes) -> dict:
    """bfchar/bfrange CMap → {2-byte code: str}."""
    cmap: dict = {}

    def u16s(hexs: bytes) -> str:
        raw = bytes.fromhex(hexs.decode("ascii"))
        return raw.decode("utf-16-be", "replace")

    for m in re.finditer(
        rb"beginbfchar(.*?)endbfchar", data, re.S
    ):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            cmap[int(src, 16)] = u16s(dst)
    for m in re.finditer(
        rb"beginbfrange(.*?)endbfrange", data, re.S
    ):
        body = m.group(1)
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
            body,
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            for k in range(lo_i, hi_i + 1):
                cmap[k] = chr(base + (k - lo_i))
    return cmap


def _page_fonts(doc: PdfDoc, page: dict) -> dict:
    # /Resources is inheritable (PDF 7.7.3.4): walk up /Parent until
    # a node carries it, so Type0 fonts declared on a Pages ancestor
    # still hit the loud no-ToUnicode contract instead of silently
    # decoding CID bytes as Latin-1. Depth-bounded against cycles.
    node, res = page, None
    for _ in range(64):
        if not isinstance(node, dict):
            break
        if "Resources" in node:
            res = doc.resolve(node["Resources"])
            break
        parent = node.get("Parent")
        node = doc.resolve(parent) if parent is not None else None
    res = res or {}
    fonts = doc.resolve(res.get("Font", {})) or {}
    out = {}
    for name, ref in fonts.items():
        f = doc.resolve(ref)
        if not isinstance(f, dict):
            raise PdfError(f"font {name} is not a dict")
        if f.get("Subtype") == "Type0":
            tu = f.get("ToUnicode")
            if not isinstance(tu, Ref) or tu.num not in doc.streams:
                raise PdfError(
                    f"Type0 font {name} lacks a /ToUnicode CMap — "
                    "CID text would be emitted as garbage"
                )
            cmap = _parse_tounicode(
                _decode_filters(
                    doc, doc.objects[tu.num], doc.streams[tu.num]
                )
            )
            out[name] = ("cid", cmap)
        else:
            out[name] = ("simple", None)
    return out


_KERN_SPACE = -100  # TJ adjustment threshold (thousandths of an em)


def _decode_shown(font, raw: bytes) -> str:
    if font is None or font[0] == "simple":
        return raw.decode("latin-1")
    cmap = font[1]
    if len(raw) % 2:
        raise PdfError("odd-length CID string")
    return "".join(
        cmap.get(int.from_bytes(raw[i : i + 2], "big"), "�")
        for i in range(0, len(raw), 2)
    )


def _extract_page_text(doc: PdfDoc, page: dict) -> str:
    content = _content_bytes(doc, page)
    fonts = _page_fonts(doc, page)
    out: list = []
    stack: list = []
    cur_font = None
    i, n = 0, len(content)
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i : i + 1]
        if c in b"/(<[" or c.isdigit() or c in b"+-.":
            # operand ('<<' dicts also appear, e.g. BDC properties)
            obj, i = parse_object(content, i)
            stack.append(obj)
            continue
        j = i
        while j < n and content[j : j + 1] not in _WS and content[
            j : j + 1
        ] not in _DELIM:
            j += 1
        op = content[i:j]
        i = j if j > i else i + 1
        if op == b"Tf" and len(stack) >= 2:
            cur_font = fonts.get(stack[-2])
        elif op == b"Tj" and stack:
            out.append(_decode_shown(cur_font, stack[-1]))
        elif op == b"'" and stack:
            out.append("\n" + _decode_shown(cur_font, stack[-1]))
        elif op == b'"' and stack:
            out.append("\n" + _decode_shown(cur_font, stack[-1]))
        elif op in (b"T*", b"TD"):
            out.append("\n")
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    out.append(_decode_shown(cur_font, el))
                elif isinstance(el, (int, float)) and el <= _KERN_SPACE:
                    out.append(" ")
        if op not in (b"BT",):
            stack.clear()
    return "".join(out)


def extract_text(blob: bytes) -> list:
    """One decoded text string per page, in page-tree order."""
    doc = scan_pdf(blob)
    cat = _find_catalog(doc)
    pages: list = []
    _walk_pages(doc, cat.get("Pages"), pages)
    if not pages:
        raise PdfError("catalog has no pages")
    return [_extract_page_text(doc, p) for p in pages]


def page_count(blob: bytes) -> int:
    doc = scan_pdf(blob)
    pages: list = []
    _walk_pages(doc, _find_catalog(doc).get("Pages"), pages)
    return len(pages)
