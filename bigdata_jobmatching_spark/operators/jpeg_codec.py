"""Pure-Python baseline + progressive JPEG codec — the third
pixel-real image format (round 6; progressive since round 8),
closing the "JPEG pixels stay NULL" gap.

Everything a baseline sequential JPEG needs is integer bit-twiddling
plus an 8x8 IDCT — no entropy-codec library: marker parse (DQT/DHT/
SOF0/SOS/DRI, APPn skipped), canonical Huffman decode over the
byte-stuffed bit stream, DC prediction with EXTEND, zigzag/dequant,
separable float IDCT (numpy matmul), level shift + clamp, and
nearest-neighbor chroma upsampling for 4:2:0/4:2:2. Supported
subset: 8-bit baseline (SOF0) or progressive (SOF2, round-8: all
four T.81 Annex-G scan kinds — DC first/refinement, AC first with
EOB runs, AC refinement with correction bits — coefficients
accumulate across scans, dequant+IDCT runs once at EOI), grayscale
or 3-component YCbCr, sampling factors whose max is <= 2, restart
markers (which persist across progressive scans per spec).
12-bit extended-sequential grayscale (SOF1, round-9: 2048 level
shift, 16-category DC table, uint16 output) is in subset; arithmetic
coding, 12-bit progressive/color, and hierarchical raise ValueError
(loud-subset discipline, same as the PNG/GIF codecs).

The encoder exists for fixtures/tests: grayscale or 4:4:4 YCbCr,
spec Annex-K example Huffman tables, configurable quantization;
``encode_jpeg_progressive_gray/color`` emit real multi-scan SOF2
streams (successive approximation, spectral selection, cross-block
EOB runs with buffered correction bits). The progressive/baseline
pair quantizes identically, so the two decodes of the same pixels
are BIT-IDENTICAL — the round-trip tests assert equality, not
closeness.
JPEG is lossy, so round-trip tests assert closeness, not equality —
EXCEPT for flat 8x8 blocks with a DC quant step of 8, where the
whole pipeline is exact (FDCT of a flat block is DC-only; the IDCT
of a DC-only block is dc*q/8 = dc + 128 to ~1e-13), which is what
the oracle-checked gate fixtures use: REAL Huffman + dequant + IDCT
with an arithmetically predictable output.

Scale: the codec runs inside Arrow mapInPandas like its PNG/GIF
siblings — payloads never shuffle, outputs are small typed columns.

Reference for the format: ITU-T T.81 (public spec); tables from its
Annex K. No code is derived from any JPEG library.
"""

from __future__ import annotations

import numpy as np

# --- shared constants -----------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT basis: C[u, x] = c(u) * cos((2x+1) u pi / 16), c(0)=sqrt(1/8)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def idct2(block: np.ndarray) -> np.ndarray:
    """Separable 2-D inverse DCT of one dequantized 8x8 block."""
    return _C.T @ block @ _C


def fdct2(block: np.ndarray) -> np.ndarray:
    """Separable 2-D forward DCT (encoder side)."""
    return _C @ block @ _C.T


# Annex K example tables (ITU-T T.81, public): luminance quantization
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# A flat quant table with DC step 8 makes flat blocks EXACT through
# the pipeline: decoded value = dc*8/8 + 128 = dc + 128.
QTABLE_FLAT8 = np.full(64, 8, dtype=np.int64)

# Annex K example Huffman specs: (bits[1..16], values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value for the decoder."""
    return {
        (length, code): v
        for v, (code, length) in _canonical_codes(bits, values).items()
    }


# --- bit I/O --------------------------------------------------------------

class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    un-stuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # a real marker: pad with 1-bits per spec
                    b = 0xFF  # markers are handled by the caller
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in JPEG stream")


# --- decoder --------------------------------------------------------------

def decode_jpeg(b: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, raw 8-bit pixel bytes) for a baseline
    OR progressive (round-8, SOF2) JPEG, or None for non-JPEG
    payloads. channels is 1 (grayscale) or 3 (RGB from YCbCr, BT.601
    integer-rounded). 12-bit extended-sequential grayscale (SOF1,
    round-9) returns little-endian uint16 sample bytes instead. Progressive streams accumulate coefficients
    across scans (DC first/refine, AC first/refine with EOB runs and
    successive approximation per T.81 Annex G) and run dequant+IDCT
    once at EOI. Raises ValueError on arithmetic/12-bit/hierarchical/
    truncated streams."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    precision = 8
    coef: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag int64
    scans_done = 0
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        while i + 2 < len(b) and b[i + 1] == 0xFF:
            i += 1  # legal fill bytes before any marker
        marker = b[i + 1]
        if marker == 0xD9:  # EOI (no length segment)
            if progressive and scans_done:
                return _finish_progressive(w, h, comps, coef, qtables)
            raise ValueError("JPEG has no scan")
        if i + 4 > len(b):
            break
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        seg = b[i + 4:i + 2 + seg_len]
        if seg_len < 2 or len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG marker segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j:j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated JPEG Huffman table")
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            if seg[0] == 12:
                # round-9: 12-bit extended sequential (SOF1 only —
                # T.81 restricts baseline SOF0 to 8-bit), grayscale
                if marker != 0xC1:
                    raise ValueError(
                        "12-bit JPEG is supported for extended "
                        "sequential (SOF1) only")
                if seg[5] != 1:
                    raise ValueError("12-bit JPEG subset is grayscale")
                precision = 12
            elif seg[0] != 8:
                raise ValueError(f"unsupported JPEG precision {seg[0]}")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq,
                })
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if hmax > 2 or vmax > 2:
                    raise ValueError(f"unsupported sampling {hmax}x{vmax}")
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    coef[c["id"]] = np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64),
                        dtype=np.int64,
                    )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA and progressive:  # one progressive scan
            i = _decode_prog_scan(
                b, i + 2 + seg_len, seg, comps, coef, huff_dc, huff_ac,
                restart_interval, w, h,
            )
            scans_done += 1
            continue
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            if ns < len(comps):
                # Multi-scan baseline (per-component SOS) is outside the
                # supported subset: decoding only the first scan would
                # return corrupt pixels (all-zero chroma planes) as if
                # valid — raise loudly instead (round-6 ADVICE).
                raise ValueError(
                    "unsupported multi-scan baseline JPEG "
                    f"(SOS covers {ns} of {len(comps)} components)"
                )
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(
                b, i + 2 + seg_len, w, h, comps, scan, qtables,
                huff_dc, huff_ac, restart_interval, precision,
            )
        i += 2 + seg_len
    raise ValueError("JPEG stream ended before SOS")


def _decode_scan(b, pos, w, h, comps, scan, qtables, huff_dc, huff_ac,
                 restart_interval, precision=8):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError(f"unsupported sampling {hmax}x{vmax}")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # per-component padded pixel planes
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in comps
    }
    if len(scan) == 1:
        # non-interleaved single-component scan: MCU = one block
        c = scan[0][0]
        bx = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
        by = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
        layout = [(c, scan[0][1], scan[0][2], 1, 1)]
        n_mcus, grid = bx * by, (bx, by)
    else:
        layout = [(c, td, ta, c["h"], c["v"]) for c, td, ta in scan]
        n_mcus, grid = mcus_x * mcus_y, (mcus_x, mcus_y)

    r = _BitReader(b, pos)
    preds = {c["id"]: 0 for c in comps}
    done = 0
    for my in range(grid[1]):
        for mx in range(grid[0]):
            if restart_interval and done and done % restart_interval == 0:
                r.align()
                if not (r.pos + 1 < len(b) and b[r.pos] == 0xFF
                        and 0xD0 <= b[r.pos + 1] <= 0xD7):
                    raise ValueError("missing JPEG restart marker")
                r.pos += 2
                preds = {c["id"]: 0 for c in comps}
            for c, td, ta, ch, cv in layout:
                q = qtables[c["tq"]]
                for v in range(cv):
                    for hh in range(ch):
                        coefs = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(r, huff_dc[td])
                        diff = _extend(r.receive(t), t)
                        preds[c["id"]] += diff
                        coefs[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, huff_ac[ta])
                            rl, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if rl == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rl
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coefs[k] = _extend(r.receive(sz), sz)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = (coefs * q).astype(np.float64)
                        px = idct2(block.reshape(8, 8)) \
                            + float(1 << (precision - 1))
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px
            done += 1

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        # upsample subsampled components to full resolution (nearest)
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        if precision == 12:
            gray = np.clip(np.rint(out_planes[0]), 0, 4095).astype("<u2")
            return w, h, 1, gray.tobytes()
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


# --- progressive decode (round-8, T.81 Annex G) ----------------------------

def _skip_to_marker(b: bytes, pos: int) -> int:
    """Position of the next marker (0xFF + non-stuffing byte) at or
    after ``pos`` — used to re-enter the marker loop after a scan's
    entropy segment (whose tail may carry pad bits / fill bytes)."""
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] not in (0x00,):
            # skip fill bytes: 0xFF 0xFF ... <marker>
            while pos + 2 < len(b) and b[pos + 1] == 0xFF:
                pos += 1
            return pos
        pos += 1
    raise ValueError("JPEG stream ended inside a progressive scan")


def _expect_rst(b: bytes, r: "_BitReader", n: int) -> None:
    r.align()
    p = _skip_to_marker(b, r.pos)
    if not 0xD0 <= b[p + 1] <= 0xD7:
        raise ValueError("missing JPEG restart marker")
    if b[p + 1] != 0xD0 + (n % 8):
        raise ValueError("JPEG restart marker out of sequence")
    r.pos = p + 2


def _decode_prog_scan(b, pos, seg, comps, coef, huff_dc, huff_ac,
                      restart_interval, w, h):
    """Decode ONE progressive scan into the coefficient store and
    return the stream index of the next marker. Implements all four
    scan kinds of T.81 Annex G: DC first (Ah=0), DC refinement, AC
    first with EOB runs, AC refinement with correction bits."""
    ns = seg[0]
    scan = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        comp = next(x for x in comps if x["id"] == cs)
        scan.append((comp, tt >> 4, tt & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    a = seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    r = _BitReader(b, pos)

    if ss == 0:  # DC scan (must cover Se=0; interleaved when ns>1)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        preds = {c["id"]: 0 for c, _, _ in scan}
        if ns == 1:
            c = scan[0][0]
            bx_n = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
            by_n = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
            layout = [(scan[0], 1, 1)]
            grid = (bx_n, by_n)
        else:
            layout = [((c, td, ta), c["h"], c["v"]) for c, td, ta in scan]
            grid = (mcus_x, mcus_y)
        done = 0
        n_rst = 0
        for my in range(grid[1]):
            for mx in range(grid[0]):
                if restart_interval and done and done % restart_interval == 0:
                    _expect_rst(b, r, n_rst)
                    n_rst += 1
                    preds = {c["id"]: 0 for c, _, _ in scan}
                for (c, td, _ta), ch, cv in layout:
                    cf = coef[c["id"]]
                    for v in range(cv):
                        for hh in range(ch):
                            by, bx = my * cv + v, mx * ch + hh
                            if ah == 0:
                                t = _huff_decode(r, huff_dc[td])
                                diff = _extend(r.receive(t), t)
                                preds[c["id"]] += diff
                                cf[by, bx, 0] = preds[c["id"]] << al
                            elif r.read_bit():
                                cf[by, bx, 0] |= 1 << al
                done += 1
    else:  # AC scan: single component, non-interleaved (G.1.1.1.1)
        if ns != 1:
            raise ValueError("progressive AC scan over multiple components")
        if not 1 <= ss <= se <= 63:
            raise ValueError(f"bad spectral band {ss}..{se}")
        c, _td, ta = scan[0]
        cf = coef[c["id"]]
        bx_n = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
        by_n = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
        table = huff_ac[ta]
        eobrun = 0
        done = 0
        n_rst = 0
        for by in range(by_n):
            for bx in range(bx_n):
                if restart_interval and done and done % restart_interval == 0:
                    _expect_rst(b, r, n_rst)
                    n_rst += 1
                    eobrun = 0
                done += 1
                blk = cf[by, bx]
                if ah == 0:
                    eobrun = _ac_first(r, table, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(r, table, blk, ss, se, al, eobrun)
    return _skip_to_marker(b, r.pos)


def _ac_first(r, table, blk, ss, se, al, eobrun) -> int:
    """AC first scan for one block (G.1.2.2); returns new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, table)
        rl, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if rl < 15:
                eobrun = (1 << rl) - 1
                if rl:
                    eobrun += r.receive(rl)
                return eobrun
            k += 16  # ZRL
            continue
        k += rl
        if k > se:
            raise ValueError("AC run past spectral band end")
        blk[k] = _extend(r.receive(sz), sz) << al
        k += 1
    return 0


def _ac_refine(r, table, blk, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (G.1.2.3): correction bits for
    already-significant coefficients, +-1<<Al for newly significant
    ones, EOB runs carrying trailing correction bits."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, table)
            rl, sz = rs >> 4, rs & 0x0F
            newval = 0
            if sz == 0:
                if rl < 15:
                    eobrun = 1 << rl
                    if rl:
                        eobrun += r.receive(rl)
                    break  # trailing corrections handled below
                # ZRL: pass 16 zero-HISTORY positions
            else:
                if sz != 1:
                    raise ValueError("AC refinement size > 1")
                newval = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if rl == 0:
                        break
                    rl -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and r.read_bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(w, h, comps, coef, qtables):
    """Dequantize + IDCT the accumulated coefficient store, upsample,
    color-convert — the baseline tail run once at EOI."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        cf = coef[c["id"]]
        q = qtables[c["tq"]].astype(np.float64)
        by_n, bx_n, _ = cf.shape
        plane = np.zeros((by_n * 8, bx_n * 8))
        for by in range(by_n):
            for bx in range(bx_n):
                block = np.zeros(64)
                block[ZIGZAG] = cf[by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    idct2(block.reshape(8, 8)) + 128.0
                )
        if c["h"] < hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        # progressive is 8-bit only (the SOF guard rejects 12-bit SOF2)
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


# --- encoder (fixtures/tests) ---------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) of a coefficient per the JPEG magnitude code."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg_gray(
    pixels: np.ndarray,
    qtable: np.ndarray = QTABLE_LUMA,
    restart_interval: int = 0,
) -> bytes:
    """Baseline grayscale JPEG from an (h, w) uint8 array (dims must
    be multiples of 8). Real FDCT + quantization + Annex-K Huffman;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
    (exercising the decoder's byte-align/predictor-reset path). With
    QTABLE_FLAT8 and flat 8x8 blocks the FDCT is DC-only and the
    stream decodes EXACTLY back to the planted value (dc*8/8 + 128)."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    wtr = _BitWriter()
    pred = 0
    done = 0
    # qtable is NATURAL order; DQT and the coefficient stream are
    # zigzag order — q_zig[i] = qtable[ZIGZAG[i]]
    q_zig = qtable.astype(np.float64)[ZIGZAG]
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and done and done % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                pred = 0
            done += 1
            blk = pixels[8 * by:8 * by + 8, 8 * bx:8 * bx + 8].astype(np.float64) - 128.0
            coefs = fdct2(blk).reshape(64)[ZIGZAG]
            qz = np.rint(coefs / q_zig).astype(np.int64)
            # qz is in zigzag order, matching the entropy-coded layout
            diff = int(qz[0]) - pred
            pred = int(qz[0])
            t, bits = _magnitude(diff)
            c, ln = dc_codes[t]
            wtr.put(c, ln)
            if t:
                wtr.put(bits, t)
            run = 0
            for k in range(1, 64):
                v = int(qz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.put(c, ln)
                    run -= 16
                t, bits = _magnitude(v)
                c, ln = ac_codes[(run << 4) | t]
                wtr.put(c, ln)
                wtr.put(bits, t)
                run = 0
            if run:
                c, ln = ac_codes[0x00]  # EOB
                wtr.put(c, ln)
    wtr.flush()

    dqt = bytes([0x00]) + bytes(int(x) for x in qtable[ZIGZAG])
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = (
        _seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + dri
        + _seg(0xDA, sos)
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


# 12-bit DC categories reach 0..15; a 16-entry canonical table at a
# single code length covers them (incomplete Huffman trees are legal
# in JPEG — the decoder walks canonical codes, not a full tree).
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALS = list(range(16))


def encode_jpeg12_gray(
    pixels: np.ndarray,
    qtable: np.ndarray = QTABLE_FLAT8,
    restart_interval: int = 0,
) -> bytes:
    """12-bit extended-sequential (SOF1) grayscale JPEG from an
    (h, w) uint16 array of samples < 4096 (round-9). Same pipeline as
    the 8-bit encoder with the wider level shift (2048), a 16-category
    DC table, and the flat 255-symbol AC table (which covers the
    12-bit size range Annex K's baseline table cannot). With
    QTABLE_FLAT8 and flat blocks the stream decodes EXACTLY."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    if int(pixels.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be < 4096")
    dc_codes = _canonical_codes(_DC12_BITS, _DC12_VALS)
    ac_codes = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    wtr = _BitWriter()
    pred = 0
    done = 0
    q_zig = qtable.astype(np.float64)[ZIGZAG]
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and done and done % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes(
                    [0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                pred = 0
            done += 1
            blk = pixels[8 * by:8 * by + 8, 8 * bx:8 * bx + 8].astype(
                np.float64) - 2048.0
            coefs = fdct2(blk).reshape(64)[ZIGZAG]
            qz = np.rint(coefs / q_zig).astype(np.int64)
            diff = int(qz[0]) - pred
            pred = int(qz[0])
            t, bits = _magnitude(diff)
            c, ln = dc_codes[t]
            wtr.put(c, ln)
            if t:
                wtr.put(bits, t)
            run = 0
            for k in range(1, 64):
                v = int(qz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    wtr.put(c, ln)
                    run -= 16
                t, bits = _magnitude(v)
                c, ln = ac_codes[(run << 4) | t]
                wtr.put(c, ln)
                wtr.put(bits, t)
                run = 0
            if run:
                c, ln = ac_codes[0x00]
                wtr.put(c, ln)
    wtr.flush()

    dqt = bytes([0x00]) + bytes(int(x) for x in qtable[ZIGZAG])
    sof = bytes([12]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(_DC12_BITS) + bytes(_DC12_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = (
        _seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC1, sof)  # SOF1: extended sequential
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + dri
        + _seg(0xDA, sos)
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


# Progressive AC scans need EOBn symbols (0x10..0xE0) that Annex K's
# baseline AC table does not define. A flat canonical table — all 255
# RS values 0x00..0xFE at code length 8 (the all-ones code stays
# unused per spec) — covers every EOBn/ZRL/run-size symbol; it ships
# in the stream's DHT, so the decoder needs nothing special.
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = list(range(255))


def _quantize_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(by, bx, 64) zigzag-order quantized coefficients of a plane
    whose dims are multiples of 8 — the shared front half of every
    encoder scan."""
    h, w = plane.shape
    q_zig = qtable.astype(np.float64)[ZIGZAG]
    out = np.zeros((h // 8, w // 8, 64), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = plane[8 * by:8 * by + 8, 8 * bx:8 * bx + 8].astype(
                np.float64) - 128.0
            out[by, bx] = np.rint(
                fdct2(blk).reshape(64)[ZIGZAG] / q_zig
            ).astype(np.int64)
    return out


class _ProgACWriter:
    """AC-scan emitter with cross-block EOB runs (T.81 G.1.2.2/3):
    EOB codes are deferred until the run length is known; refinement
    correction bits accumulate in a pending buffer flushed right
    after the deferred EOB code — the exact stream order the decoder
    consumes."""

    def __init__(self, wtr: _BitWriter, ac_codes: dict) -> None:
        self.w = wtr
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def emit_rs(self, rs: int) -> None:
        c, ln = self.ac[rs]
        self.w.put(c, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            rl = self.eobrun.bit_length() - 1
            self.emit_rs(rl << 4)
            if rl:
                self.w.put(self.eobrun - (1 << rl), rl)
            self.eobrun = 0
        for bit in self.pending:
            self.w.put(bit, 1)
        self.pending = []

    def defer_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _encode_ac_first_block(pw: _ProgACWriter, qz: np.ndarray,
                           ss: int, se: int, al: int) -> None:
    run = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(qz[k])
        tv = (abs(v) >> al) * (1 if v > 0 else -1)
        if tv == 0:
            run += 1
            continue
        pw.flush_eobrun()
        while run > 15:
            pw.emit_rs(0xF0)
            run -= 16
        t, bits = _magnitude(tv)
        pw.emit_rs((run << 4) | t)
        pw.w.put(bits, t)
        run = 0
        wrote = True
    if run or not wrote:
        pw.defer_eob()


def _encode_ac_refine_block(pw: _ProgACWriter, qz: np.ndarray,
                            ss: int, se: int, al: int) -> None:
    """Token-walk emitter mirroring the decoder's consumption cutoffs
    exactly: a ZRL carries the correction bits of already-significant
    positions encountered BEFORE its 16th zero-history zero; a coded
    coefficient carries those before its placement position; trailing
    corrections ride the (deferred, cross-block) EOB run."""
    absv = np.abs(qz[ss:se + 1])
    hist = absv >> (al + 1)      # significant from previous scans
    now = absv >> al             # magnitude at this level
    # tokens in k order: ('c', bit) correction / 'z' zero-history zero
    # / ('n', sign) newly significant
    toks: list = []
    for k in range(ss, se + 1):
        j = k - ss
        if hist[j] != 0:
            toks.append(("c", int(now[j] & 1)))
        elif now[j] == 1:
            toks.append(("n", 1 if int(qz[k]) > 0 else 0))
        else:
            toks.append("z")
    last_new = max(
        (i for i, t in enumerate(toks) if t[0] == "n"), default=-1
    )
    if last_new < 0:
        # whole block joins the EOB run; its corrections owe in k order
        pw.pending.extend(t[1] for t in toks if t[0] == "c")
        pw.defer_eob()
        return
    pw.flush_eobrun()
    run = 0
    buf: list[int] = []  # corrections since the last RS, k order
    for i, t in enumerate(toks):
        if i > last_new:
            break
        if t[0] == "c":
            buf.append(t[1])
        elif t == "z":
            run += 1
            if run == 16:
                pw.emit_rs(0xF0)
                for bit in buf:
                    pw.w.put(bit, 1)
                buf = []
                run = 0
        else:  # newly significant
            pw.emit_rs((run << 4) | 1)
            pw.w.put(t[1], 1)
            for bit in buf:
                pw.w.put(bit, 1)
            buf = []
            run = 0
    # trailing tokens after the last newly-significant position
    trailing = toks[last_new + 1:]
    if trailing:
        pw.pending.extend(t[1] for t in trailing if t[0] == "c")
        pw.defer_eob()


def encode_jpeg_progressive_gray(
    pixels: np.ndarray,
    qtable: np.ndarray = QTABLE_LUMA,
    dc_al: int = 1,
    ac_al: int = 1,
    band_split: int = 5,
    restart_interval: int = 0,
) -> bytes:
    """REAL progressive grayscale JPEG (SOF2) from an (h, w) uint8
    array (dims multiples of 8): DC first at Al=``dc_al`` + one DC
    refinement scan per lower bit, then per spectral band
    (1..``band_split``, ``band_split``+1..63) an AC first scan at
    Al=``ac_al`` + one AC refinement scan per lower bit — every
    Annex-G scan kind on the wire, with cross-block EOB runs and
    buffered correction bits. ``restart_interval`` > 0 plants DRI +
    RSTn in the DC first scan."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    qz = _quantize_blocks(pixels, qtable)
    by_n, bx_n, _ = qz.shape
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    scans: list[bytes] = []

    # DC first (Al=dc_al), optional restarts
    wtr = _BitWriter()
    pred = 0
    done = 0
    for by in range(by_n):
        for bx in range(bx_n):
            if restart_interval and done and done % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes(
                    [0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                pred = 0
            done += 1
            dcv = int(qz[by, bx, 0]) >> dc_al
            diff = dcv - pred
            pred = dcv
            t, bits = _magnitude(diff)
            c, ln = dc_codes[t]
            wtr.put(c, ln)
            if t:
                wtr.put(bits, t)
    wtr.flush()
    dri = (
        _seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval else b""
    )
    scans.append(
        dri + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, dc_al]))
        + bytes(wtr.out)
    )

    # DC refinement: one raw bit per block per lower bit plane
    # (DRI persists across scans per spec, so every later scan must
    # honor the same restart interval)
    for al in range(dc_al - 1, -1, -1):
        wtr = _BitWriter()
        done = 0
        for by in range(by_n):
            for bx in range(bx_n):
                if restart_interval and done and done % restart_interval == 0:
                    wtr.flush()
                    wtr.out += bytes(
                        [0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                done += 1
                wtr.put((int(qz[by, bx, 0]) >> al) & 1, 1)
        wtr.flush()
        scans.append(
            _seg(0xDA, bytes([1, 1, 0x00, 0, 0, (al + 1) << 4 | al]))
            + bytes(wtr.out)
        )

    # AC scans per spectral band: first at ac_al, then refinements
    bands = [(1, band_split), (band_split + 1, 63)]
    for ss, se in bands:
        wtr = _BitWriter()
        pw = _ProgACWriter(wtr, ac_codes)
        done = 0
        for by in range(by_n):
            for bx in range(bx_n):
                if restart_interval and done and done % restart_interval == 0:
                    pw.flush_eobrun()
                    wtr.flush()
                    wtr.out += bytes(
                        [0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                done += 1
                _encode_ac_first_block(pw, qz[by, bx], ss, se, ac_al)
        pw.flush_eobrun()
        wtr.flush()
        scans.append(
            _seg(0xDA, bytes([1, 1, 0x00, ss, se, ac_al]))
            + bytes(wtr.out)
        )
    for al in range(ac_al - 1, -1, -1):
        for ss, se in bands:
            wtr = _BitWriter()
            pw = _ProgACWriter(wtr, ac_codes)
            done = 0
            for by in range(by_n):
                for bx in range(bx_n):
                    if (restart_interval and done
                            and done % restart_interval == 0):
                        pw.flush_eobrun()
                        wtr.flush()
                        wtr.out += bytes(
                            [0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                    done += 1
                    _encode_ac_refine_block(pw, qz[by, bx], ss, se, al)
            pw.flush_eobrun()
            wtr.flush()
            scans.append(
                _seg(0xDA, bytes([1, 1, 0x00, ss, se, (al + 1) << 4 | al]))
                + bytes(wtr.out)
            )

    dqt = bytes([0x00]) + bytes(int(x) for x in qtable[ZIGZAG])
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC2, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + b"".join(scans)
        + b"\xff\xd9"
    )


def encode_jpeg_progressive_color(
    rgb: np.ndarray,
    qtable: np.ndarray = QTABLE_LUMA,
) -> bytes:
    """REAL progressive 4:4:4 YCbCr JPEG: interleaved 3-component DC
    first scan (Al=0) followed by one full-band AC scan per component
    (spectral selection; the successive-approximation paths are
    exercised by the grayscale encoder). Dims multiples of 8."""
    h, w, _ = rgb.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires multiple-of-8 dims")
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b_ = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b_
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b_
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b_
    qzs = {cid: _quantize_blocks(p, qtable)
           for cid, p in ((1, y), (2, cb), (3, cr))}
    by_n, bx_n, _ = qzs[1].shape
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    scans: list[bytes] = []
    wtr = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for by in range(by_n):
        for bx in range(bx_n):
            for cid in (1, 2, 3):
                dcv = int(qzs[cid][by, bx, 0])
                t, bits = _magnitude(dcv - preds[cid])
                preds[cid] = dcv
                c, ln = dc_codes[t]
                wtr.put(c, ln)
                if t:
                    wtr.put(bits, t)
    wtr.flush()
    scans.append(
        _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0]))
        + bytes(wtr.out)
    )
    for cid in (1, 2, 3):
        wtr = _BitWriter()
        pw = _ProgACWriter(wtr, ac_codes)
        for by in range(by_n):
            for bx in range(bx_n):
                _encode_ac_first_block(pw, qzs[cid][by, bx], 1, 63, 0)
        pw.flush_eobrun()
        wtr.flush()
        scans.append(
            _seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0])) + bytes(wtr.out)
        )

    dqt = bytes([0x00]) + bytes(int(x) for x in qtable[ZIGZAG])
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC2, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + b"".join(scans)
        + b"\xff\xd9"
    )


def encode_jpeg_color(
    rgb: np.ndarray,
    qtable: np.ndarray = QTABLE_LUMA,
    subsample_420: bool = False,
) -> bytes:
    """Baseline YCbCr JPEG from an (h, w, 3) uint8 array — 4:4:4 or
    4:2:0 (box-averaged chroma). Exists to drive the decoder's
    3-component, MCU-interleave, chroma-upsampling and color-convert
    paths; all components share one quant table and one Huffman pair
    (legal per T.81). Dims must be multiples of 16 for 4:2:0, 8 for
    4:4:4."""
    h, w, _ = rgb.shape
    mult = 16 if subsample_420 else 8
    if h % mult or w % mult:
        raise ValueError(f"encoder requires multiple-of-{mult} dims")
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b_ = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b_
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b_
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b_
    if subsample_420:
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        samp = [(1, 0x22), (2, 0x11), (3, 0x11)]
    else:
        samp = [(1, 0x11), (2, 0x11), (3, 0x11)]
    planes = {1: y, 2: cb, 3: cr}

    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    q_zig = qtable.astype(np.float64)[ZIGZAG]
    wtr = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}

    def put_block(plane: np.ndarray, cid: int, by: int, bx: int) -> None:
        blk = plane[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] - 128.0
        qz = np.rint(fdct2(blk).reshape(64)[ZIGZAG] / q_zig).astype(np.int64)
        diff = int(qz[0]) - preds[cid]
        preds[cid] = int(qz[0])
        t, bits = _magnitude(diff)
        c, ln = dc_codes[t]
        wtr.put(c, ln)
        if t:
            wtr.put(bits, t)
        run = 0
        for k in range(1, 64):
            v = int(qz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                wtr.put(c, ln)
                run -= 16
            t, bits = _magnitude(v)
            c, ln = ac_codes[(run << 4) | t]
            wtr.put(c, ln)
            wtr.put(bits, t)
            run = 0
        if run:
            c, ln = ac_codes[0x00]
            wtr.put(c, ln)

    if subsample_420:
        for my in range(h // 16):
            for mx in range(w // 16):
                for v in range(2):
                    for hh in range(2):
                        put_block(planes[1], 1, 2 * my + v, 2 * mx + hh)
                put_block(planes[2], 2, my, mx)
                put_block(planes[3], 3, my, mx)
    else:
        for my in range(h // 8):
            for mx in range(w // 8):
                for cid in (1, 2, 3):
                    put_block(planes[cid], cid, my, mx)
    wtr.flush()

    dqt = bytes([0x00]) + bytes(int(x) for x in qtable[ZIGZAG])
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, hv in samp:
        sof += bytes([cid, hv, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes(wtr.out)
        + b"\xff\xd9"
    )
