"""Pure-Python FLAC codec — the ninth pixel/sample-real format,
written against the public FLAC format specification (xiph.org /
RFC 9639; no code derived from libFLAC).

Decoder subset (loud ValueError outside it):
- "fLaC" magic + metadata blocks (STREAMINFO parsed: block sizes,
  sample rate, channels, bits-per-sample, total samples; other
  blocks skipped by length);
- frames: 14-bit sync, blocking-strategy bit, coded block-size /
  sample-rate / channel-assignment / sample-size fields, UTF-8-coded
  frame number, CRC-8 verified header, CRC-16 verified frame;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the closed-form
  polynomial predictors), wasted-bits unary prefix;
- residuals: partitioned Rice, both coding methods (4-bit RICE and
  5-bit RICE2 parameters), escape code (raw binary residuals);
- channel assignments: independent, left/side, right/side, mid/side
  (the lossless stereo decorrelations);
- 16-bit samples (the WAV-family grain used across this repo).
- LPC subframes (orders 1-32): stream-supplied quantized integer
  coefficients, 4-bit precision field, 5-bit shift, the same
  partitioned-Rice residuals — with FIXED/CONSTANT/VERBATIM this
  closes the full subframe taxonomy for 16-bit streams.

The fixture encoder emits REAL streams: correct CRC-8/CRC-16, exact
FIXED-order residuals (same closed-form predictors the decoder
inverts), single-partition or 2^k-partition Rice with per-partition
parameter choice, any in-subset channel assignment. Round-trip and
gate-query verified like every codec here; runs inside Arrow
mapInPandas — payloads never shuffle.

Reference parity: theman1811/BigData_jobMatching has no media
decoding; the multimodal family is this engine's training-data
extension surface.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# bit IO (MSB-first, per spec)


class _BitReader:
    """MSB-first reader over one big int (the VP8L big-int-cursor
    lesson applied MSB-side): every read is O(1) arithmetic, and
    ``read_unary`` — the Rice-code hot path — counts a whole zero run
    in one ``bit_length`` instead of a per-bit Python loop (measured
    1.5x on the decode-per-row gate fixture)."""

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "big")
        self.total = len(data) * 8
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if self.pos + n > self.total:
            raise ValueError("FLAC stream truncated")
        v = (self.val >> (self.total - self.pos - n)) & ((1 << n) - 1)
        self.pos += n
        return v

    def read_unary(self) -> int:
        rem = self.total - self.pos
        window = self.val & ((1 << rem) - 1) if rem else 0
        if window == 0:
            raise ValueError("FLAC stream truncated")
        zeros = rem - window.bit_length()
        self.pos += zeros + 1
        return zeros

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_unary(self, n: int) -> None:
        for _ in range(n):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (FLAC frame header's frame/sample number)


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError(f"bad FLAC UTF-8 lead byte {b0:#x}")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# FIXED predictors (closed-form polynomial orders 0..4, spec 9.2.2)

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _fixed_predict(order: int, hist: list, i: int) -> int:
    return sum(c * hist[i - k - 1] for k, c in enumerate(_FIXED_COEFS[order]))


# ---------------------------------------------------------------------------
# Rice coding


def _rice_read(r: _BitReader, param: int) -> int:
    q = r.read_unary()
    v = (q << param) | (r.read(param) if param else 0)
    return (v >> 1) ^ -(v & 1)  # zigzag -> signed


def _rice_write(w: _BitWriter, value: int, param: int) -> None:
    # zigzag: non-negative -> 2v, negative -> 2|v|-1
    v = (value << 1) if value >= 0 else ((-value) << 1) - 1
    w.write_unary(v >> param)
    if param:
        w.write(v & ((1 << param) - 1), param)


def _residuals_read(r: _BitReader, blocksize: int, order: int) -> list:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts != 0:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            raw_bits = r.read(5)
            for _ in range(n):
                v = r.read(raw_bits) if raw_bits else 0
                if raw_bits and v >= (1 << (raw_bits - 1)):
                    v -= 1 << raw_bits
                out.append(v)
        else:
            for _ in range(n):
                out.append(_rice_read(r, param))
    return out


# ---------------------------------------------------------------------------
# decoder


def decode_flac(b: bytes):
    """(sample_rate, n_channels, samples: list[list[int]] per channel)
    for an in-subset FLAC stream; None for non-FLAC payloads; raises
    ValueError on corruption and out-of-subset features."""
    if len(b) < 4 or b[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = b[pos + 4:pos + 4 + ln]
        if len(body) < ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if ln != 34:
                raise ValueError(f"bad STREAMINFO length {ln}")
            br = _BitReader(body)
            br.read(16)  # min block
            br.read(16)  # max block
            br.read(24)  # min frame
            br.read(24)  # max frame
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, nch, bps, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total = info
    if bps != 16:
        raise ValueError(f"FLAC bits-per-sample {bps} out of subset (16)")

    chans: list = [[] for _ in range(nch)]
    while pos < len(b):
        frame_start = pos
        # a fresh SMALL-int cursor per frame: big-int shifts cost
        # O(value size), so one whole-stream integer would make every
        # read pay for the full file; per-frame ints stay KB-sized
        # (measured faster than the single-reader variant)
        r = _BitReader(b[pos:])
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync {sync:#x}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _utf8_decode(r)  # frame/sample number (position is implicit)
        if bs_code == 0:
            raise ValueError("reserved FLAC block-size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code 15")
        if ss_code not in (0, 4):  # 4 = 16-bit; 0 = get from STREAMINFO
            raise ValueError(f"FLAC sample-size code {ss_code} out of subset")
        # CRC-8 covers the header bytes BEFORE the crc byte
        if r.pos & 7:
            raise ValueError("FLAC frame header not byte-aligned")
        hdr_end = frame_start + r.byte_pos()
        crc8_stored = r.read(8)
        if _crc8(b[frame_start:hdr_end]) != crc8_stored:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            n_sub = ch_code + 1
            if n_sub != nch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            modes = ["indep"] * n_sub
        elif ch_code == 8:
            n_sub, modes = 2, ["left", "side"]
        elif ch_code == 9:
            n_sub, modes = 2, ["side", "right"]
        elif ch_code == 10:
            n_sub, modes = 2, ["mid", "side"]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if ch_code >= 8 and nch != 2:
            raise ValueError("stereo decorrelation needs 2 channels")

        sub_samples = []
        for ci, mode in enumerate(modes):
            # side channel carries one extra bit per spec
            sbits = 16 + (1 if mode == "side" else 0)
            if r.read(1) != 0:
                raise ValueError("bad FLAC subframe padding bit")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                wasted = 1 + r.read_unary()
            eff = sbits - wasted
            if stype == 0:  # CONSTANT
                v = r.read(eff)
                if v >= (1 << (eff - 1)):
                    v -= 1 << eff
                vals = [v] * blocksize
            elif stype == 1:  # VERBATIM
                vals = []
                for _ in range(blocksize):
                    v = r.read(eff)
                    if v >= (1 << (eff - 1)):
                        v -= 1 << eff
                    vals.append(v)
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                warm = []
                for _ in range(order):
                    v = r.read(eff)
                    if v >= (1 << (eff - 1)):
                        v -= 1 << eff
                    warm.append(v)
                res = _residuals_read(r, blocksize, order)
                vals = list(warm)
                for i in range(order, blocksize):
                    vals.append(res[i - order] + _fixed_predict(order, vals, i))
            elif stype >= 32:  # LPC order 1..32 (round-9: fence closed)
                order = stype - 31
                warm = []
                for _ in range(order):
                    v = r.read(eff)
                    if v >= (1 << (eff - 1)):
                        v -= 1 << eff
                    warm.append(v)
                prec = r.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid FLAC qlp precision 1111")
                shift = r.read(5)
                if shift >= 16:
                    shift -= 32  # signed; negative shifts are illegal
                if shift < 0:
                    raise ValueError("negative FLAC qlp shift")
                coefs = []
                for _ in range(order):
                    c = r.read(prec)
                    if c >= (1 << (prec - 1)):
                        c -= 1 << prec
                    coefs.append(c)
                res = _residuals_read(r, blocksize, order)
                vals = list(warm)
                for i in range(order, blocksize):
                    pred = sum(
                        c * vals[i - k - 1] for k, c in enumerate(coefs)
                    ) >> shift
                    vals.append(res[i - order] + pred)
            else:
                raise ValueError(f"reserved FLAC subframe type {stype}")
            if wasted:
                vals = [v << wasted for v in vals]
            sub_samples.append(vals)

        # undo stereo decorrelation
        if modes == ["indep"] * len(modes):
            outs = sub_samples
        elif modes == ["left", "side"]:
            left, side = sub_samples
            outs = [left, [lv - sv for lv, sv in zip(left, side)]]
        elif modes == ["side", "right"]:
            side, right = sub_samples
            outs = [[sv + rv for sv, rv in zip(side, right)], right]
        else:  # mid/side
            mid, side = sub_samples
            outs = [[], []]
            for mv, sv in zip(mid, side):
                m2 = (mv << 1) | (sv & 1)
                outs[0].append((m2 + sv) >> 1)
                outs[1].append((m2 - sv) >> 1)
        for ci in range(nch):
            chans[ci].extend(outs[ci])

        r.align()
        crc16_stored = r.read(16)
        frame_end = frame_start + r.byte_pos()
        if _crc16(b[frame_start:frame_end - 2]) != crc16_stored:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = frame_end

    if total and any(len(c) != total for c in chans):
        raise ValueError(
            f"FLAC decoded {len(chans[0])} of {total} samples")
    return rate, nch, chans


# ---------------------------------------------------------------------------
# fixture encoder


def _best_fixed_order(vals: list, max_order: int = 4) -> int:
    best, best_cost = 0, None
    for order in range(min(max_order, len(vals)) + 1):
        cost = 0
        for i in range(order, len(vals)):
            cost += abs(vals[i] - _fixed_predict(order, vals, i))
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param_for(res: list) -> int:
    if not res:
        return 0
    mean = sum(v if v >= 0 else -v for v in res) / max(len(res), 1)
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_rice_residuals(w: _BitWriter, res: list, bs: int, order: int,
                          porder: int) -> None:
    # the first partition must still fit the warmup samples (spec:
    # its residual count is blocksize/nparts - order) — short tail
    # frames fall back to fewer partitions
    while porder and bs >> porder < order:
        porder -= 1
    w.write(0, 2)  # method 0: 4-bit rice params
    w.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        n = bs // nparts - (order if p == 0 else 0)
        part = res[idx:idx + n]
        idx += n
        param = min(_rice_param_for(part), 14)
        w.write(param, 4)
        for v in part:
            _rice_write(w, v, param)


def _write_subframe(w: _BitWriter, vals: list, sbits: int,
                    order: int | None, porder: int,
                    lpc=None) -> None:
    w.write(0, 1)  # padding
    if len(set(vals)) == 1:
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(vals[0] & ((1 << sbits) - 1), sbits)
        return
    if lpc is not None and len(vals) > len(lpc[0]):
        coefs, prec, shift = lpc
        order = len(coefs)
        w.write(31 + order, 6)  # LPC
        w.write(0, 1)  # no wasted bits
        for v in vals[:order]:
            w.write(v & ((1 << sbits) - 1), sbits)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        res = [
            vals[i] - (sum(c * vals[i - k - 1]
                           for k, c in enumerate(coefs)) >> shift)
            for i in range(order, len(vals))
        ]
        _write_rice_residuals(w, res, len(vals), order, porder)
        return
    if order is None:
        order = _best_fixed_order(vals)
    order = min(order, len(vals))
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in vals[:order]:
        w.write(v & ((1 << sbits) - 1), sbits)
    res = [vals[i] - _fixed_predict(order, vals, i)
           for i in range(order, len(vals))]
    _write_rice_residuals(w, res, len(vals), order, porder)


def encode_flac(
    rate: int,
    channels: list,
    blocksize: int = 256,
    channel_mode: str = "indep",
    fixed_order: int | None = None,
    partition_order: int = 0,
    lpc: tuple | None = None,
) -> bytes:
    """Real in-subset FLAC stream from 16-bit sample lists (one list
    per channel). ``channel_mode``: 'indep', 'left_side',
    'side_right', 'mid_side' (stereo only). ``fixed_order`` pins the
    FIXED predictor order (None = per-subframe best by |residual|);
    ``partition_order`` picks 2^k Rice partitions (k must divide the
    blocksize evenly). ``lpc`` = (coefs, precision_bits, shift) emits
    LPC subframes with those stream-supplied integer coefficients
    (round-9: any coefficient set round-trips exactly — residuals are
    computed with the same >>shift prediction the decoder inverts)."""
    nch = len(channels)
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("channel length mismatch")
    if channel_mode != "indep" and nch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    if not 1 <= nch <= 8:
        raise ValueError("1..8 channels")
    if any(not -(1 << 15) <= v < (1 << 15) for c in channels for v in c):
        raise ValueError("samples must be int16")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)  # bps-1 = 15 -> 16-bit
    si.write(total, 36)
    body = si.done() + bytes(16)  # zero md5 (unverified by the decoder)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, total, blocksize):
        bs = min(blocksize, total - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # block size: 16-bit field - 1
        w.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = {
            "indep": nch - 1, "left_side": 8, "side_right": 9,
            "mid_side": 10,
        }[channel_mode]
        w.write(ch_code, 4)
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        for byte in _utf8_encode(frame_no):
            w.write(byte, 8)
        w.write(bs - 1, 16)
        hdr = w.done()
        hdr += bytes([_crc8(hdr)])

        body_w = _BitWriter()
        subs = []
        if channel_mode == "indep":
            for c in channels:
                subs.append((c[start:start + bs], 16))
        else:
            left = channels[0][start:start + bs]
            right = channels[1][start:start + bs]
            side = [lv - rv for lv, rv in zip(left, right)]
            if channel_mode == "left_side":
                subs = [(left, 16), (side, 17)]
            elif channel_mode == "side_right":
                subs = [(side, 17), (right, 16)]
            else:
                mid = [(lv + rv) >> 1 for lv, rv in zip(left, right)]
                subs = [(mid, 16), (side, 17)]
        for vals, sbits in subs:
            po = partition_order if bs % (1 << partition_order) == 0 else 0
            _write_subframe(body_w, vals, sbits, fixed_order, po, lpc=lpc)
        frame = hdr + body_w.done()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)
