"""Pure-stdlib+numpy baseline JPEG decoder — the fourth image
container, closing VERDICT r6's "JPEG needs a DCT library" gap: a
DCT is an 8×8 matrix of cosines, and numpy is in the container.

Scope (ITU-T T.81, public spec): BASELINE SEQUENTIAL (SOF0) and
PROGRESSIVE (SOF2) with Huffman entropy coding — together the
overwhelming majority of JPEGs in a web corpus — grayscale and
3-component YCbCr at any sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
multiple DQT/DHT segments (tables may be redefined between scans),
restart intervals, 0xFF00 byte stuffing, APPn/COM skipping.
Progressive covers the full annex-G Huffman feature set: spectral
selection, successive approximation (DC first/refine, AC first with
EOBn band-end runs, AC refinement correction-bit interleave),
interleaved and single-component scans. Rejected loudly
(``JpegError``): the other SOF families (lossless, hierarchical),
arithmetic coding, 12-bit precision, truncated or desynced entropy
streams, references to undefined tables.

Determinism contract (what the oracle hashes): JPEG decoders
legitimately differ in IDCT precision, chroma upsampling, and
rounding — there is no single bit-exact "correct" pixel output
across implementations. This module PINS its choices and the fixture
truth replays them with an independent pure-Python loop
implementation:

- IDCT: float64, terms accumulated in (u-major, v-minor) order via
  ``np.cumsum`` — bit-identical to a sequential Python loop in the
  same order (the cumsum-equals-fold property pinned in round 7);
- the 8×8 cosine basis is computed ONCE with ``math.cos`` and shared
  as a module table, so numpy's SIMD libm can't drift a last ulp;
- chroma upsampling: pixel replication (nearest);
- color transform: JFIF equations, one non-accumulating expression
  per pixel, rounded half-up and clamped;
- final sample rounding: round-half-up to int, clamp to [0, 255].

Real-world validation: libjpeg-encoded files (IPython/stdlib/rust-doc
test images) parse cleanly end-to-end — a Huffman or bit-reader bug
desyncs the stream within a few MCUs on any real photo.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg", "COS_BASIS", "ZIGZAG"]


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


# natural order index of each zigzag position (T.81 figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# the ONE cosine basis both the engine and the fixture's loop-math
# truth read: basis[u][x] = c(u)/2 * cos((2x+1) u pi / 16), computed
# with math.cos so no SIMD libm variant can drift a bit
COS_BASIS = [
    [
        ((math.sqrt(0.5) if u == 0 else 1.0) / 2.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]
_B = np.array(COS_BASIS)  # (u, x)


def idct_block(coef: np.ndarray) -> np.ndarray:
    """8×8 inverse DCT, terms accumulated in (u-major, v-minor) order
    via cumsum — bit-identical to the sequential loop the fixture
    truth runs. ``coef`` is the dequantized block in natural order."""
    # term[u*8+v, x, y] = coef[u,v] * basis[u,x] * basis[v,y]
    t = (
        coef[:, :, None, None]
        * _B[:, None, :, None]
        * _B[None, :, None, :]
    ).reshape(64, 8, 8)
    return np.cumsum(t, axis=0)[-1]


class _Bits:
    """MSB-first bit reader over the entropy-coded segment with
    0xFF00 unstuffing; stops at any real marker."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("entropy stream exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: pad with zero bits (spec behavior for
                # the final partial byte) — callers detect markers via
                # at_marker() before trusting further reads
                raise JpegError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self, m: int) -> None:
        """Discard padding bits and consume the expected RSTm marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or d[self.pos + 1] != 0xD0 + (m & 7)
        ):
            raise JpegError(
                f"expected RST{m & 7} at byte {self.pos}, found "
                f"{d[self.pos:self.pos + 2]!r}"
            )
        self.pos += 2


def _huff_table(counts: list, symbols: list) -> dict:
    """(length, code) -> symbol map per T.81 annex C code assignment."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[(ln, code)] = symbols[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code (stream desynced?)")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude pattern to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, channels, pixels)``
    — interleaved RGB (3 components) or grayscale (1), top-down."""
    blob = bytes(blob)
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise JpegError("bad SOI marker")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None
    prog = None  # progressive coefficient state, born at first SOS
    while True:
        if pos + 2 > len(blob):
            raise JpegError("truncated stream")
        if blob[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            continue  # SOI repeat / stray RST: no payload
        if marker == 0xD9:
            if prog is not None:
                return _reconstruct_progressive(frame, qt, prog)
            raise JpegError("EOI before SOS")
        if pos + 2 > len(blob):
            raise JpegError("truncated segment header")
        (seg_len,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("truncated segment")
        body_start = pos + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                elif pq == 1:
                    vals = list(
                        struct.unpack(f">{64}H", seg[i : i + 128])
                    )
                    i += 128
                else:
                    raise JpegError(f"bad DQT precision {pq}")
                nat = np.zeros(64)
                for z, v in enumerate(vals):
                    nat[ZIGZAG[z]] = v
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                counts = list(seg[i : i + 16])
                i += 16
                n = sum(counts)
                syms = list(seg[i : i + n])
                i += n
                huff[(tc, th)] = _huff_table(counts, syms)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegError(f"only 8-bit precision, got {prec}")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "w": w, "h": h, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF type 0xffc{marker & 0xF:x} "
                "(only baseline SOF0 / progressive SOF2 decode)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    (
                        i
                        for i, x in enumerate(frame["comps"])
                        if x["id"] == cs
                    ),
                    None,
                )
                if ci is None:
                    raise JpegError(f"scan references unknown comp {cs}")
                scan.append(
                    (ci, frame["comps"][ci], tt >> 4, tt & 0x0F)
                )
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise JpegError("only interleaved single-scan baseline")
                return _decode_scan(
                    blob,
                    body_start,
                    frame,
                    [(c, d, a) for _, c, d, a in scan],
                    qt,
                    huff,
                    restart,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if prog is None:
                prog = _init_progressive(frame)
            pos = _decode_scan_progressive(
                blob, body_start, scan, ss, se, ah, al, huff,
                restart, prog,
            )
            continue
        # APPn (0xE0-0xEF), COM (0xFE), others with length: skipped
        pos = body_start


def _decode_scan(blob, pos, frame, scan, qt, huff, restart):
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        raise JpegError(f"bad dimensions {w}x{h}")
    comps = frame["comps"]
    if len(scan) == 1:
        # T.81 A.2: a scan with Ns=1 is NON-interleaved — its MCU is
        # ONE data unit, walked row-major over the component's own
        # ceil(w/8) x ceil(h/8) grid with sampling factors ignored
        # (libjpeg agrees: jpegtran -grayscale keeps 2x2 luma factors
        # and writes exactly this stream). Forcing effective 1x1
        # sampling makes the interleaved MCU walk below BE that
        # row-major block walk; restart intervals count data units,
        # which the forced walk also preserves.
        c0 = dict(scan[0][0])
        c0["h"] = c0["v"] = 1
        scan = [(c0, scan[0][1], scan[0][2])]
        comps = [c0]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise JpegError("bad sampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise JpegError(f"undefined quant table {c['tq']}")
        planes.append(
            np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
        )
    bits = _Bits(blob, pos)
    pred = [0] * len(comps)
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bits.align_restart(n_rst)
            n_rst = (n_rst + 1) & 7
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (comp, tdc, tac) in enumerate(scan):
            dct = huff.get((0, tdc))
            act = huff.get((1, tac))
            if dct is None or act is None:
                raise JpegError("undefined Huffman table in scan")
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64)
                    t = _huff_decode(bits, dct)
                    if t > 11:
                        raise JpegError(f"bad DC category {t}")
                    pred[ci] += _extend(bits.bits(t), t)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC run past block end")
                        zz[k] = _extend(bits.bits(s), s)
                        k += 1
                    nat = np.zeros((8, 8))
                    for z in range(64):
                        nat[ZIGZAG[z] // 8, ZIGZAG[z] % 8] = zz[z]
                    sp = idct_block(nat * qt[comp["tq"]]) + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = sp
    return _planes_to_pixels(w, h, comps, planes, hmax, vmax)


# --- progressive (SOF2) entropy layer ---------------------------------------
# T.81 G: the image is sent as a SEQUENCE of scans, each covering a
# component subset, a zigzag spectral band [Ss..Se], and a bit-plane
# range (successive approximation Ah→Al). Coefficients accumulate in
# per-component block state across scans; pixels exist only after EOI,
# through the SAME pinned IDCT/upsample/color tail as baseline. The
# fixture truth (a loop replay of the quantized coefficients) is
# therefore identical machinery for both families — progressive only
# changes how the coefficients travel.


def _init_progressive(frame) -> dict:
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        raise JpegError(f"bad dimensions {w}x{h}")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise JpegError("bad sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    st = {"mcux": mcux, "mcuy": mcuy, "hmax": hmax, "vmax": vmax,
          "comps": []}
    for c in comps:
        # full (interleaved, MCU-padded) block grid — the superset;
        # non-interleaved scans address only the component's own
        # ceil(cw/8) x ceil(ch/8) blocks (T.81 A.2.2)
        by_full, bx_full = mcuy * c["v"], mcux * c["h"]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        st["comps"].append(
            {
                "coef": [
                    [[0] * 64 for _ in range(bx_full)]
                    for _ in range(by_full)
                ],
                "BY": by_full, "BX": bx_full,
                "nbx": (cw + 7) // 8, "nby": (ch + 7) // 8,
            }
        )
    return st


def _dc_progressive(bits, huff, tdc, cf, ah, al, pred):
    """One block of a DC scan. First pass (Ah=0): Huffman diff coding
    like baseline, value scaled by 2^Al. Refinement (Ah>0): one raw
    bit per block, no Huffman (T.81 G.1.2.1)."""
    if ah == 0:
        dct = huff.get((0, tdc))
        if dct is None:
            raise JpegError("undefined DC table in scan")
        t = _huff_decode(bits, dct)
        if t > 11:
            raise JpegError(f"bad DC category {t}")
        pred += _extend(bits.bits(t), t)
        cf[0] = pred << al
    else:
        if bits.bits(1):
            cf[0] |= 1 << al
    return pred


def _ac_first_block(bits, act, cf, ss, se, al, eobrun):
    """One block of a first-pass AC scan (Ah=0): baseline run/size
    coding plus EOBn band-end runs (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(bits, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += bits.bits(r)
            return eobrun - 1  # this block is one of them
        k += r
        if k > se:
            raise JpegError("AC run past band end")
        cf[k] = _extend(bits.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(bits, act, cf, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah>0): newly-significant
    coefficients arrive as ±2^Al while every already-nonzero
    coefficient traversed receives a correction bit (T.81 G.1.2.3).
    Bitwise parity with the C reference semantics: the
    correction-needed test is ``(coef & 2^Al) == 0`` on the two's-
    complement value, which Python's ``&`` matches for negatives."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refinement size must be 1")
                newval = p1 if bits.bits(1) else -p1
            while k <= se:
                if cf[k] != 0:
                    if bits.bits(1) and (cf[k] & p1) == 0:
                        cf[k] += p1 if cf[k] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise JpegError("AC refinement insert past band end")
                cf[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # band remainder: correction bits only
            if cf[k] != 0:
                if bits.bits(1) and (cf[k] & p1) == 0:
                    cf[k] += p1 if cf[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_progressive(
    blob, pos, scan, ss, se, ah, al, huff, restart, prog
):
    """Decode one progressive scan's entropy data into the coefficient
    state; returns the byte offset of the next marker. Scan walks:
    interleaved DC scans use MCU order with sampling; single-component
    scans (all AC scans, and Ns=1 DC scans) walk the component's own
    block grid row-major with sampling ignored — the same T.81 A.2
    rule the baseline path applies. Restart intervals reset DC
    predictors AND the EOB run."""
    if se < ss or se > 63:
        raise JpegError(f"bad spectral band Ss={ss} Se={se}")
    if ss == 0 and se != 0:
        raise JpegError("progressive scan mixing DC and AC bands")
    if ss > 0 and len(scan) != 1:
        raise JpegError("progressive AC scan must be single-component")
    if ah and ah != al + 1:
        raise JpegError(f"bad successive approximation Ah={ah} Al={al}")
    bits = _Bits(blob, pos)
    n_rst = 0
    eobrun = 0
    pred = [0] * len(scan)
    interleaved = len(scan) > 1
    if interleaved:
        total = prog["mcux"] * prog["mcuy"]
    else:
        cst0 = prog["comps"][scan[0][0]]
        total = cst0["nbx"] * cst0["nby"]
    for m in range(total):
        if restart and m and m % restart == 0:
            bits.align_restart(n_rst)
            n_rst = (n_rst + 1) & 7
            pred = [0] * len(scan)
            eobrun = 0
        if ss == 0:
            if interleaved:
                my, mx = divmod(m, prog["mcux"])
                for si, (ci, comp, tdc, _) in enumerate(scan):
                    cst = prog["comps"][ci]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            cf = cst["coef"][my * comp["v"] + by][
                                mx * comp["h"] + bx
                            ]
                            pred[si] = _dc_progressive(
                                bits, huff, tdc, cf, ah, al, pred[si]
                            )
            else:
                ci, _, tdc, _ = scan[0]
                cst = prog["comps"][ci]
                by, bx = divmod(m, cst["nbx"])
                pred[0] = _dc_progressive(
                    bits, huff, tdc, cst["coef"][by][bx], ah, al, pred[0]
                )
        else:
            ci, _, _, tac = scan[0]
            cst = prog["comps"][ci]
            by, bx = divmod(m, cst["nbx"])
            act = huff.get((1, tac))
            if act is None:
                raise JpegError("undefined AC table in scan")
            cf = cst["coef"][by][bx]
            if ah == 0:
                eobrun = _ac_first_block(bits, act, cf, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(bits, act, cf, ss, se, al, eobrun)
    # skip pad bits / fill bytes to the next marker
    p = bits.pos
    while p + 1 < len(blob) and (
        blob[p] != 0xFF or blob[p + 1] in (0x00, 0xFF)
    ):
        p += 1
    if p + 1 >= len(blob):
        raise JpegError("truncated after scan")
    return p


def _reconstruct_progressive(frame, qt, prog):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    planes = []
    for c, cst in zip(comps, prog["comps"]):
        if c["tq"] not in qt:
            raise JpegError(f"undefined quant table {c['tq']}")
        q = qt[c["tq"]]
        plane = np.zeros((cst["BY"] * 8, cst["BX"] * 8))
        for by in range(cst["BY"]):
            for bx in range(cst["BX"]):
                cf = cst["coef"][by][bx]
                nat = np.zeros((8, 8))
                for z in range(64):
                    nat[ZIGZAG[z] // 8, ZIGZAG[z] % 8] = cf[z]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct_block(nat * q) + 128.0
                )
        planes.append(plane)
    return _planes_to_pixels(
        w, h, comps, planes, prog["hmax"], prog["vmax"]
    )


def _planes_to_pixels(w, h, comps, planes, hmax, vmax):
    """Shared reconstruction tail: replication-upsample each component
    plane to full resolution, crop, and apply the pinned JFIF color
    transform + half-up rounding (identical for the baseline and
    progressive paths — the entropy layers differ, the pixel contract
    does not)."""
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise JpegError("non-integer sampling ratio")
        full.append(np.repeat(np.repeat(p, ry, 0), rx, 1)[:h, :w])
    if len(comps) == 1:
        gray = np.floor(np.clip(full[0], 0, 255) + 0.5)
        return w, h, 1, gray.astype(np.uint8).tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    rgb = np.floor(np.clip(rgb, 0, 255) + 0.5)
    return w, h, 3, rgb.astype(np.uint8).tobytes()
