"""Pure-Python VP8L (WebP lossless) codec — the eighth pixel-real
format, written against the public "WebP Lossless Bitstream
Specification" (Google, RFC-style; no code derived from libwebp).

Decoder subset (grown stage-wise, loud outside it):
- RIFF/WEBP/VP8L container, LSB-first bit reader, 14-bit dims;
- prefix codes: both the SIMPLE form (1-2 symbols) and the NORMAL
  form (code lengths themselves entropy-coded with 16/17/18 repeat
  codes in the spec's kCodeLengthCodeOrder);
- one prefix-code group of five codes (green+length+cache, red,
  blue, alpha, distance) decoding literals, LZ77 back-references
  (length/distance extra bits, the 120-entry 2-D distance
  neighborhood map) and color-cache hits;
- transforms: SUBTRACT_GREEN, PREDICTOR (all 14 modes, mod-256 per
  channel, the spec's top/left border + linear-buffer TR rules),
  COLOR (cross-color: tiled signed-multiply deltas, red restored
  before blue), and COLOR_INDEXING (delta-coded palette, sub-byte
  pixel bundling for <= 16 colors at reduced coded width);
- META prefix codes (round-9, spec 5.2.2): a tiled meta image maps
  each pixel position to one of several prefix-code groups
  ((red<<8)|green indexing, shared color cache, per-SYMBOL-position
  group choice).
Out of subset (ValueError): color-indexing combined with any other
transform (real-world palette WebPs use it alone). The fixture
encoder emits real streams with
canonical Huffman codes built from the image's frequencies and can
plant every in-subset decoder path: simple AND normal prefix codes,
subtract-green, a uniform-mode PREDICTOR transform whose forward
residuals use the SAME shared prediction routine the decoder inverts
(all 14 modes), a uniform cross-color transform element, a
delta-coded palette with bundling, a real color cache (mirrored
insert rule), and distance-1-run LZ77 back-references.

Scale: runs inside Arrow mapInPandas like every codec here — payloads
never shuffle.
"""

from __future__ import annotations

import heapq

# ---------------------------------------------------------------------------
# bit IO (LSB-first, per spec)


class _BitReader:
    """LSB-first reader over one big int: a VP8L payload is small
    (the fixtures are KBs), so int.from_bytes once + arithmetic shifts
    makes every read O(1)-ish instead of a per-bit Python loop — the
    measured ~5x lever on the decode-per-row gate query."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.val = int.from_bytes(data, "little")
        self.limit = len(data) * 8
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if self.pos + n > self.limit:
            raise ValueError("VP8L stream truncated")
        v = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes

_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                      13, 14, 15, 16)


def _canonical_from_lengths(lengths: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, codes assigned per the canonical rule
    (shorter first, then symbol order), matching the spec. Codes are
    read MSB-first bit-by-bit off the LSB-first stream."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    for ln in range(1, 16):
        for sym, l in enumerate(lengths):
            if l == ln:
                table[(ln, code)] = sym
                code += 1
        code <<= 1
    # completeness check: a used code must fill its tree exactly
    used = [l for l in lengths if l > 0]
    if len(used) == 1:
        return table  # degenerate single-symbol code: zero bits read
    kraft = sum(2 ** -l for l in used)
    if abs(kraft - 1.0) > 1e-9:
        raise ValueError(f"incomplete VP8L prefix code (Kraft {kraft})")
    return table


class _PrefixCode:
    _LUT_BITS = 8

    def __init__(self, lengths: list[int]):
        self.lengths = lengths
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        self.single = nz[0][0] if len(nz) == 1 else None
        self.table = _canonical_from_lengths(lengths)
        # 8-bit stream-order LUT: codes are MSB-first over the
        # LSB-first stream, so a code (c, l<=8) owns every 8-bit
        # stream value whose low l bits are bit-reversed(c); longer
        # codes fall back to the bitwise walk. The LUT turns the
        # 4-reads-per-pixel hot path into one peek + one list index.
        lb = self._LUT_BITS
        lut: list = [None] * (1 << lb)
        for (ln, code), sym in self.table.items():
            if ln > lb:
                continue
            rev = 0
            for i in range(ln):
                rev |= ((code >> i) & 1) << (ln - 1 - i)
            for pad in range(1 << (lb - ln)):
                lut[rev | (pad << ln)] = (sym, ln)
        self.lut = lut

    def read(self, r: _BitReader) -> int:
        if self.single is not None:
            return self.single
        lb = self._LUT_BITS
        avail = r.limit - r.pos
        if avail >= lb:
            hit = self.lut[(r.val >> r.pos) & ((1 << lb) - 1)]
            if hit is not None:
                r.pos += hit[1]
                return hit[0]
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | r.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code in stream")


# _PrefixCode is a pure function of its lengths, and decode-per-row
# workloads (the gate query: 1024 distinct tiny images, decoded once
# per fact row) rebuild identical codes constantly — a bounded cache
# of constructed tables+LUTs is the dominant per-decode saving.
_PREFIX_CACHE: dict[tuple[int, ...], _PrefixCode] = {}
_PREFIX_CACHE_MAX = 4096


def _prefix_code(lengths: list[int]) -> _PrefixCode:
    key = tuple(lengths)
    pc = _PREFIX_CACHE.get(key)
    if pc is None:
        pc = _PrefixCode(lengths)
        if len(_PREFIX_CACHE) >= _PREFIX_CACHE_MAX:
            _PREFIX_CACHE.clear()  # bounded: wholesale reset is fine
        _PREFIX_CACHE[key] = pc
    return pc


def _read_prefix_code(r: _BitReader, alphabet: int) -> _PrefixCode:
    if r.read(1):  # simple code
        n_syms = r.read(1) + 1
        if r.read(1):  # first symbol is 8 bits
            s0 = r.read(8)
        else:
            s0 = r.read(1)
        lengths = [0] * alphabet
        if n_syms == 2:
            s1 = r.read(8)
            if s0 >= alphabet or s1 >= alphabet:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            if s0 >= alphabet:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[s0] = 1
        return _prefix_code(lengths)
    # normal: code lengths themselves prefix-coded
    n_codes = r.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(n_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = r.read(3)
    cl_code = _prefix_code(cl_lengths)
    if r.read(1):  # use a max_symbol cap
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl_code.read(r)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + r.read(2)):
                if i < alphabet:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + r.read(3)
        else:  # 18
            i += 11 + r.read(7)
    return _prefix_code(lengths)


# ---------------------------------------------------------------------------
# LZ77 distance neighborhood map (spec section 4.2.2)

_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_code_to_distance(w: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * w + dx
    return d if d >= 1 else 1


def _lz77_extra(symbol: int, r: _BitReader) -> int:
    """Length/distance symbol (0..39) -> value, with extra bits."""
    if symbol < 4:
        return symbol + 1
    extra = (symbol - 2) >> 1
    offset = (2 + (symbol & 1)) << extra
    return offset + r.read(extra) + 1


# ---------------------------------------------------------------------------
# predictor transform (spec section 4.4: 14 modes)

def _avg2(a: int, b: int) -> int:
    return (a + b) // 2


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    return min(255, max(0, a + b - c))


def _clamp_add_sub_half(a: int, b: int) -> int:
    # C integer division truncates toward zero (libwebp
    # ClampedAddSubtractHalf: a + (a - b) / 2); Python's // floors,
    # which diverges by 1 for negative odd differences — round-9
    # advice fix, pinned by the independent reference predictor in
    # tests/test_vp8l_spec.py.
    d = a - b
    half = abs(d) // 2
    return min(255, max(0, a + (half if d >= 0 else -half)))


def _cdelta(t: int, c: int) -> int:
    """ColorTransformDelta (spec section 4.3): both the transform
    element and the channel value are reinterpreted as SIGNED 8-bit,
    multiplied, then arithmetic-shifted right by 5. Python's ``>>``
    floors like C's arithmetic shift on the int type libwebp uses."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _select(l, t, tl):  # noqa: E741 - spec naming
    p_l = sum(abs(t[i] - tl[i]) for i in range(4))
    p_t = sum(abs(l[i] - tl[i]) for i in range(4))
    return l if p_l < p_t else t


def _predicted_at(out, i, w, mode):
    """Prediction for pixel i given already-reconstructed prefix
    ``out`` — the ONE routine both the encoder (forward residual) and
    decoder (inverse add) use, so the border conventions cannot
    diverge: (0,0) predicts opaque black, row 0 predicts left,
    column 0 predicts top, and the rightmost column's top-right
    neighbor is the LINEAR-BUFFER wraparound — the first pixel of the
    CURRENT row (spec/libwebp convention: pixels live in one flat
    array, so top-right of (w-1, y) is index (y-1)*w + w = y*w).
    Round-9 advice fix; pinned against an independent reference
    predictor in tests/test_vp8l_spec.py."""
    x, y = i % w, i // w
    if x == 0 and y == 0:
        return (255, 0, 0, 0)
    if y == 0:
        return out[i - 1]
    if x == 0:
        return out[i - w]
    l = out[i - 1]  # noqa: E741
    t = out[i - w]
    tl = out[i - w - 1]
    # i - w + 1 == y*w (current row's first pixel) when x == w-1:
    # always already reconstructed, no special case needed.
    tr = out[i - w + 1]
    return _predict(mode, l, t, tr, tl)


def _predict(mode: int, l, t, tr, tl):  # noqa: E741
    if mode == 0:
        return (255, 0, 0, 0)  # opaque black (ARGB)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return tuple(_avg2(_avg2(l[i], tr[i]), t[i]) for i in range(4))
    if mode == 6:
        return tuple(_avg2(l[i], tl[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(l[i], t[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(tl[i], t[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(t[i], tr[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(l[i], tl[i]), _avg2(t[i], tr[i])) for i in range(4))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return tuple(
            _clamp_add_sub_full(l[i], t[i], tl[i]) for i in range(4))
    if mode == 13:
        return tuple(
            _clamp_add_sub_half(_avg2(l[i], t[i]), tl[i]) for i in range(4))
    raise ValueError(f"bad VP8L predictor mode {mode}")


# ---------------------------------------------------------------------------
# decoder

_SIG = 0x2F
_GREEN_LITS = 256
_LEN_CODES = 24
_DIST_CODES = 40


def _read_code_group(r: _BitReader, cache_size: int) -> tuple:
    """One prefix-code group: (green+length+cache, red, blue, alpha,
    distance) codes in spec order."""
    green_alpha = _GREEN_LITS + _LEN_CODES + cache_size
    return (
        _read_prefix_code(r, green_alpha),
        _read_prefix_code(r, 256),
        _read_prefix_code(r, 256),
        _read_prefix_code(r, 256),
        _read_prefix_code(r, _DIST_CODES),
    )


def _decode_entropy_image(r: _BitReader, w: int, h: int,
                          cache_bits: int, meta=None) -> list:
    """Decode one entropy-coded ARGB image. ``meta`` is None for a
    single prefix-code group (sub-images, simple main images), or
    (tile_bits, tile_w, tile_group_indices) from the meta prefix
    image (spec 5.2.2): the group used for each SYMBOL is the one of
    the pixel position where the symbol starts; the color cache is
    shared across groups. Returns a flat list of (a, r, g, b)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if meta is None:
        groups = [_read_code_group(r, cache_size)]

        def group_at(pos: int) -> tuple:
            return groups[0]
    else:
        mbits, mt_w, idxs = meta
        n_groups = max(idxs) + 1
        groups = [_read_code_group(r, cache_size) for _ in range(n_groups)]

        def group_at(pos: int) -> tuple:
            x, y = pos % w, pos // w
            return groups[idxs[(y >> mbits) * mt_w + (x >> mbits)]]

    cache = [(0, 0, 0, 0)] * cache_size
    px: list = []
    n = w * h

    def cache_insert(p):
        if cache_size:
            a_, r_, g_, b_ = p
            argb = (a_ << 24) | (r_ << 16) | (g_ << 8) | b_
            key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
            cache[key] = p

    while len(px) < n:
        green, red, blue, alpha, dist = group_at(len(px))
        s = green.read(r)
        if s < _GREEN_LITS:
            g = s
            rr = red.read(r)
            b = blue.read(r)
            a = alpha.read(r)
            p = (a, rr, g, b)
            px.append(p)
            cache_insert(p)
        elif s < _GREEN_LITS + _LEN_CODES:
            length = _lz77_extra(s - _GREEN_LITS, r)
            dcode = dist.read(r)
            d = _plane_code_to_distance(w, _lz77_extra(dcode, r))
            if d > len(px):
                raise ValueError("VP8L back-reference before image start")
            for _ in range(length):
                p = px[-d]
                px.append(p)
                cache_insert(p)
                if len(px) > n:
                    raise ValueError("VP8L LZ77 overrun")
        else:
            if not cache_size:
                raise ValueError("VP8L cache hit without a color cache")
            px.append(cache[s - _GREEN_LITS - _LEN_CODES])
    return px


def decode_vp8l(b: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, 4, RGBA bytes) for a WebP lossless stream, or
    None for non-WebP payloads. Raises ValueError on truncation and
    on spec features outside the subset (cross-color transform,
    color-indexing, meta prefix codes)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    if b[12:16] != b"VP8L":
        raise ValueError("WebP is not lossless (no VP8L chunk first)")
    size = int.from_bytes(b[16:20], "little")
    payload = b[20:20 + size]
    if len(payload) < size:
        raise ValueError("truncated VP8L chunk")
    r = _BitReader(payload)
    if r.read(8) != _SIG:
        raise ValueError("bad VP8L signature byte")
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise ValueError("bad VP8L version")

    # transforms. ``w`` may be REDUCED by a color-indexing transform
    # (pixel bundling): the main image and LZ77 distances are then
    # coded at the reduced width.
    orig_w = w
    transforms: list = []
    while r.read(1):
        ttype = r.read(2)
        if ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        elif ttype == 0:  # PREDICTOR
            size_bits = r.read(3) + 2
            bs = 1 << size_bits
            tw = (w + bs - 1) // bs
            th = (h + bs - 1) // bs
            # the mode sub-image: entropy-coded with its own optional
            # color cache; per spec, sub-images carry NO meta-prefix
            # bit (that field exists only for the main ARGB image)
            sub_cache = r.read(4) if r.read(1) else 0
            modes = _decode_entropy_image(r, tw, th, sub_cache)
            transforms.append(("predictor", bs, tw, modes))
        elif ttype == 1:  # COLOR (cross-color, spec 4.3)
            size_bits = r.read(3) + 2
            bs = 1 << size_bits
            tw = (w + bs - 1) // bs
            th = (h + bs - 1) // bs
            sub_cache = r.read(4) if r.read(1) else 0
            ctes = _decode_entropy_image(r, tw, th, sub_cache)
            transforms.append(("color", bs, tw, ctes))
        else:  # ttype == 3: COLOR_INDEXING (spec 4.5)
            n_pal = r.read(8) + 1
            sub_cache = r.read(4) if r.read(1) else 0
            deltas = _decode_entropy_image(r, n_pal, 1, sub_cache)
            # palette entries are component-wise delta-coded
            palette: list = []
            prev = (0, 0, 0, 0)
            for d in deltas:
                cur = tuple((d[i] + prev[i]) & 0xFF for i in range(4))
                palette.append(cur)
                prev = cur
            if n_pal <= 2:
                width_bits = 3
            elif n_pal <= 4:
                width_bits = 2
            elif n_pal <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(("color_indexing", palette, width_bits))
            w = (w + (1 << width_bits) - 1) >> width_bits  # bundled
    if any(t[0] == "color_indexing" for t in transforms) and \
            len(transforms) > 1:
        # real-world palette images use the indexing transform alone;
        # mixed chains would need width bookkeeping per transform
        raise ValueError(
            "VP8L color-indexing combined with other transforms is "
            "out of subset")

    # color cache + meta prefix codes for the main image
    cache_bits = r.read(4) if r.read(1) else 0
    if cache_bits > 11:
        raise ValueError(f"bad VP8L cache bits {cache_bits}")
    meta = None
    if r.read(1):  # meta prefix codes (spec 5.2.2, round-9)
        mbits = r.read(3) + 2
        mt_w = (w + (1 << mbits) - 1) >> mbits
        mt_h = (h + (1 << mbits) - 1) >> mbits
        sub_cache = r.read(4) if r.read(1) else 0
        mimg = _decode_entropy_image(r, mt_w, mt_h, sub_cache)
        # group index rides (red << 8) | green of each tile pixel
        idxs = [(p[1] << 8) | p[2] for p in mimg]
        meta = (mbits, mt_w, idxs)
    px = _decode_entropy_image(r, w, h, cache_bits, meta)

    # apply transforms in reverse order
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            px = [((a, (rr + g) & 0xFF, g, (bb + g) & 0xFF))
                  for (a, rr, g, bb) in px]
        elif t[0] == "predictor":
            _, bs, tw, modes = t
            out: list = []
            for i, delta in enumerate(px):
                x, y = i % w, i // w
                mode = modes[(y // bs) * tw + (x // bs)][2]  # green
                pred = _predicted_at(out, i, w, mode)
                out.append(tuple((d + p) & 0xFF
                                 for d, p in zip(delta, pred)))
            px = out
        elif t[0] == "color":
            # cte pixel channels (spec 4.3): green_to_red rides BLUE,
            # green_to_blue rides GREEN, red_to_blue rides RED. Red is
            # restored FIRST; blue's red term uses the restored red.
            _, bs, tw, ctes = t
            out = []
            for i, (a, rr, g, bb) in enumerate(px):
                x, y = i % w, i // w
                _ca, r2b, g2b, g2r = ctes[(y // bs) * tw + (x // bs)]
                rd = (rr + _cdelta(g2r, g)) & 0xFF
                bl = (bb + _cdelta(g2b, g) + _cdelta(r2b, rd)) & 0xFF
                out.append((a, rd, g, bl))
            px = out
        else:  # color_indexing: unbundle then map through the palette
            _, palette, width_bits = t
            xsub = 1 << width_bits
            ibits = 8 >> width_bits
            imask = (1 << ibits) - 1
            out = []
            for y in range(h):
                row = px[y * w:(y + 1) * w]
                for x in range(orig_w):
                    g = row[x >> width_bits][2]
                    idx = (g >> ((x % xsub) * ibits)) & imask
                    if idx >= len(palette):
                        raise ValueError(
                            f"VP8L palette index {idx} out of range "
                            f"({len(palette)} entries)")
                    out.append(palette[idx])
            px = out
            w = orig_w

    rgba = bytearray(w * h * 4)
    for i, (a, rr, g, bb) in enumerate(px):
        rgba[4 * i:4 * i + 4] = bytes((rr, g, bb, a))
    return w, h, 4, bytes(rgba)


# ---------------------------------------------------------------------------
# fixture encoder: literal-only, real canonical Huffman codes

def _huffman_lengths(freqs: dict[int, int], alphabet: int,
                     max_len: int = 15) -> list[int]:
    """Code lengths from frequencies (heap Huffman; depths beyond
    max_len are flattened by frequency clamping — fixture-grade, the
    decoder checks Kraft completeness)."""
    items = [(f, s) for s, f in freqs.items() if f > 0]
    if not items:
        raise ValueError("empty alphabet")
    if len(items) == 1:
        lengths = [0] * alphabet
        lengths[items[0][1]] = 1
        return lengths
    heap = [(f, i, (s,)) for i, (f, s) in enumerate(items)]
    heapq.heapify(heap)
    depth = {s: 0 for _, s in items}
    nxt = len(items)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    if max(depth.values()) > max_len:
        raise ValueError("fixture Huffman exceeded 15 bits — flatten input")
    lengths = [0] * alphabet
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _canonical_codes_msb(lengths: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    for ln in range(1, 16):
        for sym, l in enumerate(lengths):
            if l == ln:
                out[sym] = (code, ln)
                code += 1
        code <<= 1
    return out


def _write_prefix_code(wtr: _BitWriter, lengths: list[int]) -> None:
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) <= 2 and all(s < 256 for s in nz):
        wtr.write(1, 1)  # simple
        wtr.write(len(nz) - 1, 1)
        if nz[0] > 1:
            wtr.write(1, 1)
            wtr.write(nz[0], 8)
        else:
            wtr.write(0, 1)
            wtr.write(nz[0], 1)
        if len(nz) == 2:
            wtr.write(nz[1], 8)
        return
    # normal form: every code length emitted verbatim (no 16/17/18
    # repeats — fixture-grade); symbol lengths may go to 15 (cl
    # symbols 0..15), only the code-length code's OWN lengths are
    # capped at 7 by their 3-bit field
    cl_freq: dict[int, int] = {}
    for l in lengths:  # noqa: E741
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, 19, max_len=7)
    wtr.write(0, 1)  # normal
    # emit all 19 code-length-code lengths in spec order
    wtr.write(19 - 4, 4)
    for s in _CODE_LENGTH_ORDER:
        wtr.write(cl_lengths[s], 3)
    wtr.write(0, 1)  # no max_symbol cap
    cl_codes = _canonical_codes_msb(cl_lengths)
    single_cl = sum(1 for l in cl_lengths if l > 0) == 1
    for l in lengths:  # noqa: E741
        if single_cl:
            continue  # zero-bit code
        c, n = cl_codes[l]
        # MSB-first code emission onto the LSB-first stream
        for i in range(n - 1, -1, -1):
            wtr.write((c >> i) & 1, 1)


def _lz77_symbol(value: int) -> tuple[int, int, int]:
    """(symbol, extra_bits_value, extra_bits_count) — inverse of
    :func:`_lz77_extra`."""
    if value <= 4:
        return value - 1, 0, 0
    t = value - 1
    extra = t.bit_length() - 2
    hi = t >> extra
    return 2 * extra + hi, t - (hi << extra), extra


def _cache_key(p, cache_bits: int) -> int:
    a, r, g, b = p
    argb = (a << 24) | (r << 16) | (g << 8) | b
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _emit_entropy_image(wtr: _BitWriter, w: int, tokens: list,
                        cache_bits: int) -> None:
    """Write one entropy-coded image from tokens ('lit', pixel) /
    ('copy', length, distance) / ('cache', index): real canonical
    Huffman codes per channel built from the token frequencies."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = _GREEN_LITS + _LEN_CODES + cache_size
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d, s):
        d[s] = d.get(s, 0) + 1

    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = tok[1]
            bump(gf, g)
            bump(rf, r)
            bump(bf, b)
            bump(af, a)
        elif tok[0] == "copy":
            ls, _, _ = _lz77_symbol(tok[1])
            bump(gf, _GREEN_LITS + ls)
            ds, _, _ = _lz77_symbol(tok[2])
            bump(df, ds)
        else:
            bump(gf, _GREEN_LITS + _LEN_CODES + tok[1])
    for d, fallback in ((rf, 0), (bf, 0), (af, 255), (df, 0)):
        if not d:
            d[fallback] = 1
    lens = {
        "g": _huffman_lengths(gf, green_alpha),
        "r": _huffman_lengths(rf, 256),
        "b": _huffman_lengths(bf, 256),
        "a": _huffman_lengths(af, 256),
        "d": _huffman_lengths(df, _DIST_CODES),
    }
    for k in ("g", "r", "b", "a", "d"):
        _write_prefix_code(wtr, lens[k])
    codes = {k: _canonical_codes_msb(v) for k, v in lens.items()}
    singles = {k: sum(1 for l in v if l > 0) == 1 for k, v in lens.items()}

    def put(k: str, sym: int) -> None:
        if singles[k]:
            return  # zero-bit single-symbol code
        c, n = codes[k][sym]
        for i in range(n - 1, -1, -1):  # MSB-first onto the LSB stream
            wtr.write((c >> i) & 1, 1)

    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = tok[1]
            put("g", g)
            put("r", r)
            put("b", b)
            put("a", a)
        elif tok[0] == "copy":
            ls, lx, ln = _lz77_symbol(tok[1])
            put("g", _GREEN_LITS + ls)
            if ln:
                wtr.write(lx, ln)
            ds, dx, dn = _lz77_symbol(tok[2])
            put("d", ds)
            if dn:
                wtr.write(dx, dn)
        else:
            put("g", _GREEN_LITS + _LEN_CODES + tok[1])


def _emit_entropy_image_grouped(
    wtr: _BitWriter, pixels: list, w: int, mbits: int, tw_t: int,
    gidx: list, n_groups: int,
) -> None:
    """Literal-only emission under META prefix codes: per-group
    canonical code tables built from that group's own pixel
    frequencies (the whole point of meta codes — different statistics
    per region), then each pixel's symbols written with the codes of
    its tile's group."""
    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}} for _ in range(n_groups)
    ]

    def grp(pos: int) -> int:
        x, y = pos % w, pos // w
        return gidx[(y >> mbits) * tw_t + (x >> mbits)]

    for i, (a, rr, g, bb) in enumerate(pixels):
        f = freqs[grp(i)]
        for d, s in (("g", g), ("r", rr), ("b", bb), ("a", a)):
            f[d][s] = f[d].get(s, 0) + 1
    tables = []
    for f in freqs:
        for d, fb in (("g", 0), ("r", 0), ("b", 0), ("a", 255)):
            if not f[d]:
                f[d][fb] = 1
        lens = {
            "g": _huffman_lengths(f["g"], _GREEN_LITS + _LEN_CODES),
            "r": _huffman_lengths(f["r"], 256),
            "b": _huffman_lengths(f["b"], 256),
            "a": _huffman_lengths(f["a"], 256),
            "d": _huffman_lengths({0: 1}, _DIST_CODES),
        }
        for k in ("g", "r", "b", "a", "d"):
            _write_prefix_code(wtr, lens[k])
        codes = {k: _canonical_codes_msb(v) for k, v in lens.items()}
        singles = {
            k: sum(1 for l in v if l > 0) == 1 for k, v in lens.items()
        }
        tables.append((codes, singles))

    def put(ti: int, k: str, sym: int) -> None:
        codes, singles = tables[ti]
        if singles[k]:
            return
        c, n = codes[k][sym]
        for i in range(n - 1, -1, -1):
            wtr.write((c >> i) & 1, 1)

    for i, (a, rr, g, bb) in enumerate(pixels):
        t = grp(i)
        put(t, "g", g)
        put(t, "r", rr)
        put(t, "b", bb)
        put(t, "a", a)


def _tokenize(px: list, cache_bits: int, lz77: bool) -> list:
    """Token stream for the coded pixel list: distance-1 runs >= 4
    become LZ77 copies (plane code 2, the 2-D map's (1,0) entry);
    color-cache hits become cache symbols; the rest are literals.
    The encoder-side cache mirrors the decoder's insert rule exactly
    (literals and every copied pixel insert; cache hits do not)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [(0, 0, 0, 0)] * cache_size
    toks: list = []
    i = 0
    n = len(px)
    while i < n:
        if lz77 and i > 0:
            run = 0
            while i + run < n and px[i + run] == px[i - 1] and run < 4096:
                run += 1
            if run >= 4:
                toks.append(("copy", run, 2))  # plane code 2 -> d=1
                if cache_size:
                    for j in range(i, i + run):
                        cache[_cache_key(px[j], cache_bits)] = px[j]
                i += run
                continue
        p = px[i]
        if cache_size:
            key = _cache_key(p, cache_bits)
            if cache[key] == p:
                toks.append(("cache", key))
                i += 1
                continue
            cache[key] = p
        toks.append(("lit", p))
        i += 1
    return toks


def encode_vp8l(
    width: int,
    height: int,
    rgba: bytes,
    subtract_green: bool = False,
    predictor_bits: int | None = None,
    predictor_mode: int = 2,
    cache_bits: int = 0,
    lz77: bool = False,
    cross_color: tuple[int, int, int] | None = None,
    palette: bool = False,
    meta_split: int | None = None,
) -> bytes:
    """Real VP8L stream (no meta codes — one prefix-code group) with
    canonical Huffman codes built from the image's frequencies.
    Options plant the decoder's paths: ``subtract_green`` and a
    uniform-mode PREDICTOR transform (forward residuals computed with
    the SAME shared prediction routine the decoder inverts),
    ``cache_bits`` a real color cache, ``lz77`` distance-1 run
    back-references, ``cross_color`` a uniform cross-color transform
    element (green_to_red, green_to_blue, red_to_blue — byte values,
    signed-interpreted per spec), ``palette`` the color-indexing
    transform (delta-coded palette; indices bundled sub-byte when the
    palette is <= 16 colors — must be the ONLY transform, matching
    the decoder's subset fence). Tiny alphabets emit SIMPLE codes."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba buffer size mismatch")
    if not 0 <= predictor_mode <= 13:
        raise ValueError(f"bad predictor mode {predictor_mode}")
    if palette and (subtract_green or predictor_bits is not None
                    or cross_color is not None):
        raise ValueError("palette must be the only transform")
    px = [
        (rgba[4 * i + 3], rgba[4 * i], rgba[4 * i + 1], rgba[4 * i + 2])
        for i in range(width * height)
    ]  # (a, r, g, b)

    wtr = _BitWriter()
    wtr.write(_SIG, 8)
    wtr.write(width - 1, 14)
    wtr.write(height - 1, 14)
    wtr.write(0, 1)  # alpha hint
    wtr.write(0, 3)  # version

    coded_width = width

    # stream order [subtract_green, cross_color, predictor] (or
    # [palette] alone): the decoder applies inverses in reverse, so
    # the encoder applies forward transforms in stream order
    if subtract_green:
        wtr.write(1, 1)
        wtr.write(2, 2)  # SUBTRACT_GREEN
        px = [(a, (r - g) & 0xFF, g, (b - g) & 0xFF) for (a, r, g, b) in px]
    if cross_color is not None:
        g2r, g2b, r2b = (v & 0xFF for v in cross_color)
        bs_bits = 9  # one 512-px tile covers the fixture sizes
        bs = 1 << bs_bits
        tw = (width + bs - 1) // bs
        th = (height + bs - 1) // bs
        wtr.write(1, 1)
        wtr.write(1, 2)  # COLOR
        wtr.write(bs_bits - 2, 3)
        wtr.write(0, 1)  # cte sub-image: no color cache
        cte_px = ("lit", (0, r2b, g2b, g2r))  # channel mapping, spec 4.3
        _emit_entropy_image(wtr, tw, [cte_px] * (tw * th), 0)
        fwd = []
        for a, r, g, b in px:
            nr = (r - _cdelta(g2r, g)) & 0xFF
            # blue's red term uses the ORIGINAL red — the value the
            # decoder will have restored before computing blue
            nb = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
            fwd.append((a, nr, g, nb))
        px = fwd
    if palette:
        uniq: list = []
        seen: dict = {}
        for p in px:
            if p not in seen:
                seen[p] = len(uniq)
                uniq.append(p)
        if len(uniq) > 256:
            raise ValueError(f"{len(uniq)} distinct colors > 256")
        n_pal = len(uniq)
        wtr.write(1, 1)
        wtr.write(3, 2)  # COLOR_INDEXING
        wtr.write(n_pal - 1, 8)
        wtr.write(0, 1)  # palette sub-image: no color cache
        deltas, prev = [], (0, 0, 0, 0)
        for p in uniq:
            deltas.append(("lit", tuple((p[i] - prev[i]) & 0xFF
                                        for i in range(4))))
            prev = p
        _emit_entropy_image(wtr, n_pal, deltas, 0)
        if n_pal <= 2:
            width_bits = 3
        elif n_pal <= 4:
            width_bits = 2
        elif n_pal <= 16:
            width_bits = 1
        else:
            width_bits = 0
        xsub = 1 << width_bits
        ibits = 8 >> width_bits
        coded_width = (width + xsub - 1) >> width_bits
        packed = []
        for y in range(height):
            for cx in range(coded_width):
                g = 0
                for j in range(xsub):
                    x = cx * xsub + j
                    if x >= width:
                        break
                    g |= seen[px[y * width + x]] << (j * ibits)
                packed.append((0, 0, g, 0))
        px = packed
    if predictor_bits is not None:
        if not 2 <= predictor_bits <= 9:
            raise ValueError("predictor_bits must be 2..9")
        bs = 1 << predictor_bits
        tw = (width + bs - 1) // bs
        th = (height + bs - 1) // bs
        wtr.write(1, 1)
        wtr.write(0, 2)  # PREDICTOR
        wtr.write(predictor_bits - 2, 3)
        wtr.write(0, 1)  # mode sub-image: no color cache (no meta
        # bit here — sub-images don't carry one per spec)
        mode_px = ("lit", (0, 0, predictor_mode, 0))
        _emit_entropy_image(wtr, tw, [mode_px] * (tw * th), 0)
        residuals = []
        for i, p in enumerate(px):
            pred = _predicted_at(px, i, width, predictor_mode)
            residuals.append(tuple((c - q) & 0xFF for c, q in zip(p, pred)))
        px = residuals
    wtr.write(0, 1)  # no more transforms

    if cache_bits:
        if not 1 <= cache_bits <= 11:
            raise ValueError("cache_bits must be 1..11")
        wtr.write(1, 1)
        wtr.write(cache_bits, 4)
    else:
        wtr.write(0, 1)
    if meta_split is not None:
        # META prefix codes (round-9): split tiles into a left/right
        # group pair, each with its own code tables. Literal-only by
        # construction (group choice is per-symbol-position; copies
        # and cache hits would need position bookkeeping the fixture
        # doesn't exercise).
        if cache_bits or lz77 or palette:
            raise ValueError(
                "meta_split is literal-only (no cache/lz77/palette)")
        if not 2 <= meta_split <= 9:
            raise ValueError("meta_split must be 2..9 (tile bits)")
        mbits = meta_split
        bs = 1 << mbits
        tw_t = (coded_width + bs - 1) // bs
        th_t = (height + bs - 1) // bs
        half = (tw_t + 1) // 2
        gidx = [0 if tx < half else 1
                for ty in range(th_t) for tx in range(tw_t)]
        n_groups = max(gidx) + 1
        wtr.write(1, 1)  # meta prefix codes present
        wtr.write(mbits - 2, 3)
        wtr.write(0, 1)  # meta image: no color cache
        _emit_entropy_image(
            wtr, tw_t, [("lit", (0, 0, i, 0)) for i in gidx], 0)
        _emit_entropy_image_grouped(
            wtr, px, coded_width, mbits, tw_t, gidx, n_groups)
    else:
        wtr.write(0, 1)  # no meta prefix codes
        _emit_entropy_image(
            wtr, coded_width, _tokenize(px, cache_bits, lz77), cache_bits)

    payload = wtr.done()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"  # RIFF padding
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
