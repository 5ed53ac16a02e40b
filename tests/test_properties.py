"""Property-based tests (hypothesis): the parser/similarity kernels
hold their invariants on GENERATED inputs, not just pinned fixtures.

Each property runs ONE Spark job per example over a generated batch
(hypothesis drives the batch content; examples kept small because a
Spark round-trip is ~1s).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.functions import salary as SAL
from bigdata_jobmatching_spark.functions import similarity as S
from bigdata_jobmatching_spark.functions import text as X

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_amounts = st.lists(st.integers(min_value=1000, max_value=9_999_999), min_size=8, max_size=24)


@given(amounts=_amounts, fam=st.lists(st.integers(0, 2), min_size=8, max_size=24))
@settings(**_SETTINGS)
def test_salary_parser_matches_arithmetic(spark, amounts, fam):
    # range / single-FCFA / yearly-EUR families must parse back to the
    # planted amounts under the documented conversions (x655, /12)
    rows = []
    for a, f in zip(amounts, fam):
        if f == 0:
            rows.append((f"Salaire: {a} - {a + 50000} FCFA par mois", float(a), float(a + 50000)))
        elif f == 1:
            rows.append((f"{a} FCFA", float(a), float(a)))
        else:
            rows.append((f"environ {a} EUR par an", a * 655.0 / 12.0, a * 655.0 / 12.0))
    df = spark.createDataFrame(rows, "txt string, want_min double, want_max double")
    out = df.select("want_min", "want_max", SAL.parse_salary(F.col("txt")).alias("s")).collect()
    for r in out:
        assert r.s.min_fcfa == r.want_min and r.s.max_fcfa == r.want_max
        assert r.s.min_fcfa <= r.s.avg_fcfa <= r.s.max_fcfa


_texts = st.lists(
    st.text(alphabet="abcdefg h", min_size=0, max_size=60),
    min_size=6, max_size=16,
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_jaccard_identity_symmetry_bounds(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, t string")
    a = df.select(F.col("id").alias("ia"), F.col("t").alias("ta"))
    b = df.select(F.col("id").alias("ib"), F.col("t").alias("tb"))
    pairs = a.crossJoin(b).select(
        "ia", "ib",
        S.jaccard(X.tokens(F.col("ta")), X.tokens(F.col("tb"))).alias("j"),
    ).collect()
    vals = {(r.ia, r.ib): r.j for r in pairs}
    for (i, j), v in vals.items():
        assert 0.0 <= v <= 1.0
        assert v == vals[(j, i)]  # symmetric
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        if toks:
            assert vals[(i, i)] == 1.0  # identity on non-empty docs


@given(ids=st.lists(st.integers(min_value=0, max_value=2**31), min_size=10, max_size=30, unique=True))
@settings(**_SETTINGS)
def test_lcg_split_engine_independent(spark, ids):
    # the train/val carve-out must equal its pure-Python twin exactly
    from bigdata_jobmatching_spark.plans.mixing_queries import _LCG_A, _LCG_C, _LCG_M, _VAL_PCT

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    h = (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M
    out = {
        r.doc_id: r.split
        for r in df.select(
            "doc_id",
            F.when(h < _LCG_M * _VAL_PCT // 100, F.lit("val")).otherwise(F.lit("train")).alias("split"),
        ).collect()
    }
    for i in ids:
        want = "val" if (i * _LCG_A + _LCG_C) % _LCG_M < _LCG_M * _VAL_PCT // 100 else "train"
        assert out[i] == want


@given(texts=st.lists(st.text(alphabet="abcde fg", min_size=0, max_size=40), min_size=4, max_size=10))
@settings(**_SETTINGS)
def test_ngram_shingles_never_crash_and_bound(spark, texts):
    # the round-1 advisor crash class: short/empty docs through the
    # shingling kernels must yield empty arrays, never slice errors
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    out = df.select(
        "id",
        F.size(S.word_ngrams(F.col("t"), 3)).alias("n3"),
        X.rolling_hash_fingerprint(F.col("t")).alias("fp"),
    ).collect()
    for r, (_, t) in zip(out, enumerate(texts)):
        n = len([w for w in t.split() if w])
        assert r.n3 == max(n - 2, 0)
        assert r.fp is not None and len(r.fp) == 32  # md5 hex, even for short docs


_words = st.sampled_from(["senior", "chef", "agent", "dev", "ing"])
_suffixes = st.text(alphabet="abc", min_size=0, max_size=6)


@given(
    pairs=st.lists(st.tuples(_words, _suffixes, _suffixes), min_size=4, max_size=16),
)
@settings(**_SETTINGS)
def test_levenshtein_composite_blocking_is_lossless(spark, pairs):
    # PROPERTY: the composite (first-token, length-bucket) blocking
    # returns EXACTLY the pairs that same-first-token brute force
    # finds within max_distance — the length dimension never loses a
    # qualifying pair (levenshtein >= |len diff|), for any bucket size.
    import itertools

    from bigdata_jobmatching_spark.operators import dedup as D

    rows = [(i, f"{w} {s1}x{s2}") for i, (w, s1, s2) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, title string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in D.levenshtein_pairs(
            df, "id", "title", max_distance=3, length_bucket=4
        ).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expect = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        if ta.split(" ")[0] == tb.split(" ")[0]:
            d = lev(ta, tb)
            if d <= 3:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                expect.add((lo, hi, d))
    assert got == expect


_texts = st.lists(
    st.text(alphabet="abcdef ", min_size=1, max_size=40), min_size=3, max_size=8
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_similarity_kernel_invariants(spark, texts):
    # PROPERTIES on generated text: jaccard is symmetric, bounded in
    # [0,1], and 1.0 on identical non-empty shingle sets; cosine of a
    # vector with itself is 1 (or 0 for the zero vector) and bounded.
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    sh = df.select(
        "id", S.word_ngrams(F.col("text"), 2).alias("sh")
    )
    a = sh.select(F.col("id").alias("ia"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("ib"), F.col("sh").alias("sb"))
    pairs = a.crossJoin(b).withColumn("j", S.jaccard(F.col("sa"), F.col("sb")))
    got = pairs.collect()
    byid = {(r.ia, r.ib): r.j for r in got}
    for r in got:
        assert 0.0 <= r.j <= 1.0
        assert byid[(r.ia, r.ib)] == byid[(r.ib, r.ia)]
        if r.ia == r.ib and r.sa:
            assert r.j == 1.0

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5 - 2) for d in range(8)]) for i in range(4)],
        "id long, v array<double>",
    )
    self_cos = vecs.withColumn("c", S.cosine(F.col("v"), F.col("v"))).collect()
    for r in self_cos:
        assert abs(r.c - 1.0) < 1e-9 or r.c == 0.0


@given(
    kind=st.sampled_from(["wav", "mp4", "mp4v1", "png", "jpeg", "gif", "webp", "tiff", "tiffbe"]),
    cut=st.integers(min_value=0, max_value=400),
    flips=st.lists(
        st.tuples(st.integers(0, 399), st.integers(0, 255)), max_size=8
    ),
)
@settings(max_examples=300, deadline=None)
def test_container_parsers_never_crash(kind, cut, flips):
    """Malformed-bytes fuzz for the pure-Python container walkers:
    random truncations of valid files + random byte flips must parse
    to a structured result or None — never raise, never loop."""
    from bigdata_jobmatching_spark.operators import multimodal as MM

    base = {
        "wav": lambda: MM.make_wav(2, 16000, 3200),
        "mp4": lambda: MM.make_mp4(4500),
        "mp4v1": lambda: MM.make_mp4(4500, version=1),
        "png": lambda: MM.make_png(33, 44),
        "jpeg": lambda: MM.make_jpeg(33, 44),
        "gif": lambda: MM.make_gif(33, 44),
        "webp": lambda: MM.make_webp(33, 44),
        "tiff": lambda: MM.make_tiff(33, 44),
        "tiffbe": lambda: MM.make_tiff(33, 44, "big"),
    }[kind]()
    b = bytearray(base[:min(cut, len(base))])
    for pos, val in flips:
        if b:
            b[pos % len(b)] = val
    data = bytes(b)
    if kind == "wav":
        out = MM.parse_wav_header(data)
        assert out is None or (isinstance(out, tuple) and len(out) == 3)
    elif kind.startswith("mp4"):
        out = MM.parse_mp4_header(data)
        assert out is None or isinstance(out, int)
    else:
        parse = {"png": MM.parse_png_header, "jpeg": MM.parse_jpeg_header,
                 "gif": MM.parse_gif_header, "webp": MM.parse_webp_header,
                 "tiff": MM.parse_tiff_header, "tiffbe": MM.parse_tiff_header}[kind]
        out = parse(data)
        assert out is None or (isinstance(out, tuple) and len(out) == 2)


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 10**9)),
        min_size=1, max_size=40,
    ).map(lambda ps: [(min(a, b), max(a, b) or 1) for a, b in ps])
)
@settings(max_examples=20, deadline=None)
def test_ratio6_matches_exact_fraction_rounding(spark, pairs):
    """ratio6's int64 rescaling must equal exact rational half-up
    rounding to 6 dp (Fraction ground truth), and Spark and DuckDB
    must produce identical doubles for it."""
    from fractions import Fraction

    import duckdb

    from bigdata_jobmatching_spark.plans.catalog import ratio6, ratio6_sql

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.a, r.b): r.r
        for r in df.select("a", "b", ratio6("a", "b").alias("r")).collect()
    }
    con = duckdb.connect()
    for (a, b), r_spark in got.items():
        # ground truth: round-half-up(a/b, 6) as an exact rational
        fr = Fraction(a, b) * 10**6
        expect = float((fr.numerator // fr.denominator
                        + (1 if 2 * (fr.numerator % fr.denominator) >= fr.denominator else 0))
                       ) / 1e6
        assert r_spark == expect, (a, b, r_spark, expect)
        r_duck = con.execute(
            f"SELECT {ratio6_sql(str(a), str(b))}"
        ).fetchone()[0]
        assert r_duck == r_spark, (a, b, r_duck, r_spark)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda t: t[0] != t[1]),
        min_size=1, max_size=25,
    ),
    iters=st.integers(1, 4),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_invariants_random_graphs(spark, edges, iters):
    """Exact-int64 PageRank invariants on arbitrary graphs: every rank
    is at least the teleport floor, total mass never exceeds scale
    (integer division only loses), and a python-side replay of the
    same integer recurrence reproduces every rank exactly."""
    from bigdata_jobmatching_spark.operators.graph import pagerank_exact

    df = spark.createDataFrame(edges, ["m", "n"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_exact(df, iterations=iters).collect()
    }

    # python replay of the identical integer recurrence
    sym: dict[int, list[int]] = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    nodes = sorted(sym)
    n = len(nodes)
    scale = 10**12
    init = scale // n
    tele = (15 * init) // 100
    ranks = {v: init for v in nodes}
    deg = {v: len(sym[v]) for v in nodes}
    for _ in range(iters):
        contrib = {v: ranks[v] // deg[v] for v in nodes}
        inflow = {v: sum(contrib[u] for u in sym[v]) for v in nodes}
        ranks = {v: tele + (85 * inflow[v]) // 100 for v in nodes}

    assert got == ranks
    assert all(r >= tele for r in got.values())
    assert sum(got.values()) <= scale


@given(
    spans=st.lists(
        st.tuples(st.integers(0, 700), st.integers(1, 500)),
        min_size=1, max_size=20,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_tiling_equals_range_join(spark, spans):
    """The month-tiling rewrite must agree with the naive range-join
    count for every month, on arbitrary [order, ship) day spans."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(1995, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
        for i, (s, d) in enumerate(spans)
    ]
    j = spark.createDataFrame(rows, ["o_orderkey", "o_orderdate", "l_shipdate"])

    months = F.when(
        F.expr(
            "CASE WHEN date_trunc('month', o_orderdate) = o_orderdate THEN o_orderdate "
            "ELSE date_trunc('month', o_orderdate) + INTERVAL 1 MONTH END"
        )
        <= F.expr("date_trunc('month', l_shipdate - INTERVAL 1 SECOND)"),
        F.expr(
            "sequence(CASE WHEN date_trunc('month', o_orderdate) = o_orderdate "
            "THEN o_orderdate "
            "ELSE date_trunc('month', o_orderdate) + INTERVAL 1 MONTH END, "
            "date_trunc('month', l_shipdate - INTERVAL 1 SECOND), INTERVAL 1 MONTH)"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<TIMESTAMP>)"))
    tiled = (
        j.select(F.explode(months).alias("m"))
        .groupBy("m").count()
        .collect()
    )
    tiled_counts = {r["m"]: r["count"] for r in tiled}

    grid = [dt.datetime(1995 + y, mo, 1) for y in range(0, 5) for mo in range(1, 13)]
    for g in grid:
        expect = sum(1 for _, od, sd in rows if od <= g < sd)
        assert tiled_counts.get(g, 0) == expect


@given(
    samples=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 10**4)),
        min_size=2, max_size=15, unique_by=lambda t: t[0],
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_twa_matches_python_replay(spark, samples):
    """user_value_twa equals an integer-arithmetic python replay for
    arbitrary (offset-seconds, cents) samples of one user."""
    import datetime as dt

    from bigdata_jobmatching_spark.plans import temporal_queries as T

    samples = sorted(samples)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(seconds=off), "t", cents / 100.0, "{}")
        for i, (off, cents) in enumerate(samples)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    tmp = "/tmp/twa_prop_events"
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = T._twa(spark, tmp).collect()

    segs = [
        (samples[i + 1][0] * 1000 - samples[i][0] * 1000, samples[i][1])
        for i in range(len(samples) - 1)
    ]
    segs = [s for s in segs if True]
    total = sum(d for d, _ in segs)
    if total == 0:
        # all events at the same instant -> zero-duration segments
        # still emit rows; the division guard is den > 0
        return
    wsum = sum(d * c for d, c in segs)
    expect = ((2 * wsum + total) // (2 * total)) / 100.0
    assert len(out) == 1
    assert out[0]["total_dur_ms"] == total
    assert out[0]["twa_value"] == expect


@given(
    sets=st.lists(
        st.lists(st.integers(0, 40), min_size=1, max_size=12),
        min_size=2, max_size=14,
    ),
    th=st.sampled_from([(1, 2), (4, 5), (9, 10)]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_filter_lossless_on_random_sets(spark, sets, th):
    """SSJoin completeness on arbitrary skewed token sets and several
    thresholds: prefix filtering + PPJoin pruning must equal the
    brute-force threshold join exactly."""
    from pyspark.sql import functions as F

    from bigdata_jobmatching_spark.operators import dedup as D

    num, den = th
    rows = [(i, sorted(set(s))) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "id long, ts array<long>")
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.prefix_filter_pairs(df, "id", "ts", num, den).collect()
    }
    brute = set()
    for i, a in rows:
        for j, b in rows:
            if i >= j or not a or not b:
                continue
            inter = len(set(a) & set(b))
            union = len(set(a) | set(b))
            if inter * den >= union * num:
                brute.add((i, j, inter / union))
    assert fast == brute


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"), st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 9), st.booleans()),
                min_size=1, max_size=4,
            )),
            st.tuples(st.just("rollback"), st.integers(0, 100)),
        ),
        min_size=1, max_size=5,
    )
)
def test_versioned_merge_matches_dict_model(spark, tmp_path_factory, ops):
    """Model-based check of the versioned-stage MERGE layer: a random
    sequence of merges (upsert/delete) and rollbacks must track a
    plain dict model exactly, version for version."""
    from bigdata_jobmatching_spark.sources import versioned as V

    root = str(tmp_path_factory.mktemp("vm") / "t")
    base = {1: 100, 2: 200}
    V.write_version(
        spark.createDataFrame(sorted(base.items()), "id long, val long"), root
    )
    model = dict(base)
    history = {1: dict(base)}

    for op in ops:
        if op[0] == "merge":
            rows = op[1]
            # collapse duplicates within one merge batch: LAST wins in
            # the model; give the engine an unambiguous batch instead
            # (one row per key) since merge_version's contract is
            # one-update-per-key (the streaming sink pre-collapses)
            batch = {}
            for k, v, deleted in rows:
                batch[k] = (v, deleted)
            upd = [(k, v, d) for k, (v, d) in sorted(batch.items())]
            V.merge_version(
                spark, root,
                spark.createDataFrame(upd, "id long, val long, deleted boolean"),
                ("id",), delete_col="deleted",
            )
            for k, (v, d) in batch.items():
                if d:
                    model.pop(k, None)
                else:
                    model[k] = v
        else:
            vs = sorted(history)
            target = vs[op[1] % len(vs)]
            V.rollback(root, target)
            model = dict(history[target])
        cur = V.current_version(root)
        history[cur] = dict(model)
        got = {
            r["id"]: r["val"]
            for r in V.read_version(spark, root).collect()
        }
        assert got == model, (got, model, op)


# --- PNG codec round-trip (round-5, pure Python — no Spark needed) --------

@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    ch=st.integers(1, 4),
    ft=st.sampled_from([0, 1, 2, 3, 4, None]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_png_codec_round_trip_property(w, h, ch, ft, seed):
    """decode(encode(px)) == px for arbitrary geometry, channel count,
    scanline filter, and pixel content (LCG-generated — includes 0x00
    and 0xFF runs that stress the modular filter arithmetic)."""
    from bigdata_jobmatching_spark.operators.multimodal import decode_png, encode_png

    n = w * h * ch
    x, out = seed, bytearray()
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x & 0xFF)
    px = bytes(out)
    assert decode_png(encode_png(w, h, px, channels=ch, filter_type=ft)) == (w, h, ch, px)


@given(
    w=st.integers(1, 10), h=st.integers(1, 10), ch=st.integers(1, 4),
    tw=st.integers(1, 10), th=st.integers(1, 10), seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_resample_nearest_matches_reference_loop(w, h, ch, tw, th, seed):
    """The vectorized nearest-neighbor resample equals the obvious
    per-pixel floor-coordinate loop on arbitrary inputs."""
    from bigdata_jobmatching_spark.operators.multimodal import resample_nearest

    n = w * h * ch
    x, out = seed, bytearray()
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x & 0xFF)
    px = bytes(out)
    got = resample_nearest(px, w, h, ch, tw, th)
    ref = bytearray()
    for y in range(th):
        sy = (y * h) // th
        for xq in range(tw):
            sx = (xq * w) // tw
            base = (sy * w + sx) * ch
            ref += px[base:base + ch]
    assert got == bytes(ref)


@given(
    flip_seed=st.integers(0, 2**31),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_decode_never_silently_wrong_under_byte_flip(flip_seed, seed):
    """Corruption safety: flipping any single byte of a valid PNG must
    either raise ValueError (CRC/structure check) or return None
    (broken signature) — NEVER return pixels different from the
    original. The per-chunk CRC verification is what makes this hold
    for flips inside the zlib stream."""
    from bigdata_jobmatching_spark.operators.multimodal import decode_png, encode_png

    w, h, ch = 6, 5, 3
    n = w * h * ch
    x, out = seed, bytearray()
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x & 0xFF)
    px = bytes(out)
    png = bytearray(encode_png(w, h, px, channels=ch, filter_type=None))
    pos = flip_seed % len(png)
    png[pos] ^= 1 + (flip_seed // len(png)) % 255  # guaranteed change
    try:
        got = decode_png(bytes(png))
    except ValueError:
        return  # loud failure: the desired outcome for corruption
    assert got is None, "corrupt PNG must not silently decode"


# --- round-6 codec properties ---------------------------------------------

@given(
    w=st.integers(1, 12), h=st.integers(1, 9),
    n_colors_log=st.integers(1, 8),
    seed=st.integers(0, 2**31),
    lt=st.booleans(), anim=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_round_trip_property(w, h, n_colors_log, seed, lt, anim):
    """encode_gif -> decode_gif is identity for ANY palette size,
    shape, table kind and version over LCG-random indices."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        decode_gif, encode_gif,
    )

    n_colors = 1 << n_colors_log
    if n_colors < 2:
        n_colors = 2
    x = seed
    pal = bytearray()
    for _ in range(3 * n_colors):
        x = (1103515245 * x + 12345) % (1 << 31)
        pal.append(x % 256)
    idx = bytearray()
    for _ in range(w * h):
        x = (1103515245 * x + 12345) % (1 << 31)
        idx.append(x % n_colors)
    g = encode_gif(w, h, bytes(idx), bytes(pal),
                   local_table=lt, animated_89a=anim)
    exp = bytes(c for ix in idx for c in pal[3 * ix:3 * ix + 3])
    assert decode_gif(g) == (w, h, 3, exp)


@given(
    bw=st.integers(1, 4), bh=st.integers(1, 3),
    seed=st.integers(0, 2**31), ri=st.integers(0, 4),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_flat_block_property(bw, bh, seed, ri):
    """The DC-only JPEG pipeline is exact for ANY flat-block layout,
    any restart interval — the property behind the gate fixture."""
    import numpy as np

    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_FLAT8, decode_jpeg, encode_jpeg_gray,
    )

    h, w = bh * 8, bw * 8
    px = np.zeros((h, w), dtype=np.uint8)
    x = seed
    for by in range(bh):
        for bx in range(bw):
            x = (1103515245 * x + 12345) % (1 << 31)
            px[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = x % 256
    j = encode_jpeg_gray(px, QTABLE_FLAT8, restart_interval=ri)
    got = decode_jpeg(j)
    assert got is not None
    gw, gh, ch, raw = got
    assert (gw, gh, ch) == (w, h, 1)
    assert np.array_equal(np.frombuffer(raw, dtype=np.uint8).reshape(gh, gw), px)


@given(
    ch=st.integers(1, 2), n=st.integers(1, 200), seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_wav_pcm_round_trip_property(ch, n, seed):
    import numpy as np

    from bigdata_jobmatching_spark.operators.multimodal import (
        decode_wav_samples, make_wav_pcm,
    )

    x = seed
    vals = np.zeros((n, ch), dtype=np.int16)
    for i in range(n):
        for c in range(ch):
            x = (1103515245 * x + 12345) % (1 << 31)
            vals[i, c] = (x % 65536) - 32768
    w = make_wav_pcm(ch, 8000, vals)
    got = decode_wav_samples(w)
    assert got is not None and got[0] == ch
    assert np.array_equal(got[2], vals)


@given(
    w=st.integers(1, 14),
    h=st.integers(1, 10),
    d=st.sampled_from([1, 2, 4]),
    ft=st.sampled_from([0, 1, 2, 3, 4, None]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_lowbit_png_round_trip_property(w, h, d, ft, seed):
    """Sub-byte PNG (round-8): decode(encode(v)) == scaled v for
    arbitrary geometry (partial trailing bytes included), depth,
    filter, and sample content; scaling is the exact 255/(2^d-1)."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        decode_png, encode_png,
    )

    x, out = seed, bytearray()
    for _ in range(w * h):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x & ((1 << d) - 1))
    v = bytes(out)
    png = encode_png(w, h, v, channels=1, filter_type=ft, bit_depth=d)
    scale = 255 // ((1 << d) - 1)
    want = (w, h, 1, bytes(b * scale for b in v))
    assert decode_png(png) == want
    # round-9: Adam7 composes with sub-byte depths (per-pass strides)
    png_i = encode_png(w, h, v, channels=1, filter_type=ft, bit_depth=d,
                       interlace=True)
    assert decode_png(png_i) == want


@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    n_pal_log=st.integers(1, 8),
    n_trans_off=st.integers(0, 3),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_trns_palette_round_trip_property(w, h, n_pal_log, n_trans_off, seed):
    """tRNS palette PNG (round-8): RGBA expansion with spec's
    beyond-table-opaque rule for arbitrary palette/table sizes."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        decode_png, encode_png,
    )

    n_pal = max(2, 1 << n_pal_log)
    n_trans = max(1, n_pal - n_trans_off)
    x = seed
    def nxt(m):
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 31)
        return x % m
    idx = bytes(nxt(n_pal) for _ in range(w * h))
    pal = bytes(nxt(256) for _ in range(3 * n_pal))
    trans = bytes(nxt(256) for _ in range(n_trans))
    png = encode_png(w, h, idx, channels=1, filter_type=None,
                     palette=pal, trans=trans)
    dw, dh, ch, px = decode_png(png)
    assert (dw, dh, ch) == (w, h, 4)
    for j, i in enumerate(idx):
        assert px[4 * j:4 * j + 3] == pal[3 * i:3 * i + 3]
        assert px[4 * j + 3] == (trans[i] if i < n_trans else 255)


@given(
    alphabet=st.integers(1, 256),
    n=st.integers(0, 30000),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_tiff_lzw_round_trip_property(alphabet, n, seed):
    """TIFF LZW (round-8): decode(encode(b)) == b across alphabet
    sizes (small alphabets force deep dictionaries, width growth
    through 12 bits, and mid-stream Clears) and lengths."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        tiff_lzw_decode, tiff_lzw_encode,
    )

    x, out = seed, bytearray()
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x % alphabet)
    d = bytes(out)
    assert tiff_lzw_decode(tiff_lzw_encode(d), len(d)) == d


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 9),
    ch=st.sampled_from([1, 3]),
    endian=st.sampled_from(["little", "big"]),
    rps=st.sampled_from([None, 2, 3]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_tiff_predictor2_round_trip_property(w, h, ch, endian, rps, seed):
    """TIFF horizontal-differencing predictor (round-9, tag 317=2):
    decode(encode(px, lzw+predictor2)) == px across channel counts,
    byte orders, and strip splits (rows never span strips, so the
    undifference must restart per row, not per strip)."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        decode_tiff, encode_tiff_pixels,
    )

    x, out = seed, bytearray()
    for _ in range(w * h * ch):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((x >> 5) & 0xFF)
    px = bytes(out)
    t = encode_tiff_pixels(w, h, px, channels=ch, endian=endian,
                           lzw=True, predictor2=True, rows_per_strip=rps)
    assert decode_tiff(t) == (w, h, ch, px)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    n_colors_log=st.integers(1, 8),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_gif_interlace_round_trip_property(w, h, n_colors_log, seed):
    """Interlaced GIF (round-8): interlaced and plain encodings of the
    same indices decode identically for arbitrary geometry (heights
    that leave passes empty included)."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        decode_gif, encode_gif,
    )

    n_colors = 1 << max(1, n_colors_log)
    x = seed
    def nxt(m):
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 31)
        return x % m
    idx = bytes(nxt(n_colors) for _ in range(w * h))
    pal = bytes(nxt(256) for _ in range(3 * n_colors))
    assert decode_gif(encode_gif(w, h, idx, pal, interlace=True)) == \
        decode_gif(encode_gif(w, h, idx, pal))


@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 3),
    dc_al=st.integers(1, 2),
    ac_al=st.integers(0, 2),
    split=st.integers(1, 62),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_progressive_jpeg_bit_exact_property(bw, bh, dc_al, ac_al, split, seed):
    """Progressive JPEG (round-8): for arbitrary pixels and scan
    structure, the progressive decode is BIT-IDENTICAL to the baseline
    decode of the same pixels (both encoders quantize identically)."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import jpeg_codec as J

    rng = np.random.RandomState(seed % (2**31))
    px = rng.randint(0, 256, size=(8 * bh, 8 * bw)).astype(np.uint8)
    want = J.decode_jpeg(J.encode_jpeg_gray(px))
    got = J.decode_jpeg(J.encode_jpeg_progressive_gray(
        px, dc_al=dc_al, ac_al=ac_al, band_split=split))
    assert got == want


@given(
    w=st.integers(1, 14),
    h=st.integers(1, 10),
    sg=st.booleans(),
    pb=st.sampled_from([None, 2, 3]),
    cb=st.sampled_from([0, 3, 6]),
    lz=st.booleans(),
    mode=st.integers(0, 13),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=50, deadline=None)
def test_vp8l_round_trip_property(w, h, sg, pb, cb, lz, mode, seed):
    """VP8L (round-8): decode(encode(rgba)) == rgba across the whole
    in-subset feature lattice on arbitrary pixels (LCG-generated, so
    runs/repeats occur and LZ77/cache paths genuinely fire)."""
    from bigdata_jobmatching_spark.operators.vp8l_codec import (
        decode_vp8l, encode_vp8l,
    )

    x, out = seed, bytearray()
    for _ in range(w * h * 4):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((x >> 7) & 0x3F)  # 64-value alphabet -> repeats
    rgba = bytes(out)
    cc = (seed % 256, (seed >> 8) % 256, (seed >> 16) % 256) \
        if seed % 3 == 0 else None
    webp = encode_vp8l(w, h, rgba, subtract_green=sg, predictor_bits=pb,
                       predictor_mode=mode, cache_bits=cb, lz77=lz,
                       cross_color=cc)
    assert decode_vp8l(webp) == (w, h, 4, rgba)
    if not cb and not lz:  # meta codes are literal-only
        webp_m = encode_vp8l(
            w, h, rgba, subtract_green=sg, predictor_bits=pb,
            predictor_mode=mode, cross_color=cc, meta_split=2)
        assert decode_vp8l(webp_m) == (w, h, 4, rgba)


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 8),
    ncol=st.sampled_from([1, 2, 3, 4, 9, 16, 17, 40]),
    cb=st.sampled_from([0, 3]),
    lz=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_vp8l_palette_round_trip_property(w, h, ncol, cb, lz, seed):
    """Color-indexing (round-9): every bundling tier (8/4/2/1 px per
    byte), odd-width tail bytes, delta-coded palettes — with the color
    cache and LZ77 riding on the PACKED index image."""
    from bigdata_jobmatching_spark.operators.vp8l_codec import (
        decode_vp8l, encode_vp8l,
    )

    x = seed
    pal = []
    for _ in range(ncol):
        cols = []
        for _ in range(4):
            x = (1103515245 * x + 12345) % (1 << 31)
            cols.append((x >> 7) & 0xFF)
        pal.append(bytes(cols))
    px = []
    for _ in range(w * h):
        x = (1103515245 * x + 12345) % (1 << 31)
        px.append(pal[(x >> 9) % ncol])
    rgba = b"".join(px)
    webp = encode_vp8l(w, h, rgba, palette=True, cache_bits=cb, lz77=lz)
    assert decode_vp8l(webp) == (w, h, 4, rgba)


@given(
    nch=st.integers(1, 3),
    mode_i=st.integers(0, 3),
    n=st.integers(1, 400),
    bs=st.sampled_from([32, 64, 192, 256]),
    order=st.sampled_from([None, 0, 1, 2, 3, 4]),
    po=st.integers(0, 3),
    step=st.integers(1, 900),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_flac_round_trip_property(nch, mode_i, n, bs, order, po, step,
                                  seed):
    """FLAC (round-9, ninth codec): decode(encode(samples)) == samples
    across channel counts, all four stereo decorrelations, FIXED
    orders (pinned and auto), Rice partition orders, block sizes, and
    tail frames shorter than the predictor order."""
    from bigdata_jobmatching_spark.operators.flac_codec import (
        decode_flac, encode_flac,
    )

    x = seed
    chans = []
    for c in range(nch):
        vals, v = [], 0
        for _ in range(n):
            x = (1103515245 * x + 12345) % (1 << 31)
            v = max(-32768, min(32767, v + (x % (2 * step + 1)) - step))
            vals.append(v)
        chans.append(vals)
    mode = "indep"
    if nch == 2:
        mode = ("indep", "left_side", "side_right", "mid_side")[mode_i]
    s = encode_flac(44100, chans, blocksize=bs, channel_mode=mode,
                    fixed_order=order, partition_order=po)
    assert decode_flac(s) == (44100, nch, chans)
    # LPC subframes (round-9): arbitrary integer coefficient sets
    # round-trip exactly under the same lattice
    lpc = ([26, -14, 4], 6, 4) if seed % 2 else ([1 << 3, -3], 5, 3)
    s2 = encode_flac(44100, chans, blocksize=bs, channel_mode=mode,
                     partition_order=po, lpc=lpc)
    assert decode_flac(s2) == (44100, nch, chans)


@given(data=st.binary(min_size=8, max_size=200))
@settings(max_examples=30, deadline=None)
def test_flac_garbage_is_loud_or_none(data):
    """Arbitrary bytes either miss the magic (None) or raise a typed
    ValueError — never silently-wrong samples."""
    import pytest

    from bigdata_jobmatching_spark.operators.flac_codec import decode_flac

    if data[:4] != b"fLaC":
        assert decode_flac(data) is None
    else:
        with pytest.raises(ValueError):
            decode_flac(data)


@given(flip_seed=st.integers(0, 2**31), seed=st.integers(0, 2**31))
@settings(max_examples=60, deadline=None)
def test_flac_frame_corruption_never_silently_wrong(flip_seed, seed):
    """Corruption safety (round-9): flipping any single byte in the
    FRAME region of a valid FLAC stream must raise ValueError (CRC-8
    header check / CRC-16 frame check / structural guards) — never
    return samples different from the original. Flips in the METADATA
    region may legally alter declared rate/shape (not CRC-protected
    by the format), so the property targets the frames, which carry
    all sample data."""
    from bigdata_jobmatching_spark.operators.flac_codec import (
        decode_flac, encode_flac,
    )

    x, vals, v = seed, [], 0
    for _ in range(300):
        x = (1103515245 * x + 12345) % (1 << 31)
        v = max(-32768, min(32767, v + (x % 401) - 200))
        vals.append(v)
    stream = bytearray(encode_flac(44100, [vals], blocksize=128))
    frames_start = 4 + 4 + 34  # magic + STREAMINFO header + body
    pos = frames_start + flip_seed % (len(stream) - frames_start)
    stream[pos] ^= 1 + (flip_seed // max(len(stream), 1)) % 255
    try:
        got = decode_flac(bytes(stream))
    except ValueError:
        return  # loud failure: the desired outcome
    assert got == (44100, 1, [vals]), \
        "corrupt FLAC frame must not silently decode to altered samples"


@given(
    wb=st.integers(1, 3), hb=st.integers(1, 2),
    ri=st.sampled_from([0, 2]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_jpeg12_flat_block_exactness_property(wb, hb, ri, seed):
    """12-bit JPEG (round-9): flat 8x8 blocks with the flat DC-step-8
    table decode EXACTLY at any block layout / restart interval —
    and the output is genuinely 12-bit (uint16 samples up to 4095)."""
    import numpy as np

    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_FLAT8, decode_jpeg, encode_jpeg12_gray,
    )

    w, h = 8 * wb, 8 * hb
    x = seed
    px = np.zeros((h, w), dtype=np.uint16)
    for by in range(hb):
        for bx in range(wb):
            x = (1103515245 * x + 12345) % (1 << 31)
            px[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = x % 4096
    s = encode_jpeg12_gray(px, QTABLE_FLAT8, restart_interval=ri)
    dw, dh, ch, raw = decode_jpeg(s)
    got = np.frombuffer(raw, dtype="<u2").reshape(dh, dw)
    assert (dw, dh, ch) == (w, h, 1)
    assert (got == px).all()


_vocab = ["tok%d" % i for i in range(12)]
_docs = st.lists(
    st.lists(st.sampled_from(_vocab), min_size=0, max_size=40),
    min_size=3, max_size=8,
)


@given(docs=_docs)
@settings(**_SETTINGS)
def test_winnowed_windows_matches_python_reference(spark, docs):
    """The shift-and-zip winnowing composition (operators/dedup.
    winnowed_windows) selects EXACTLY the fingerprints an independent
    pure-Python winnowing computes: same k-gram md5-60 hashes, same
    per-w-window minima, same per-doc distinct sets — on generated
    token sequences including empty and sub-threshold docs."""
    import hashlib

    from bigdata_jobmatching_spark.operators import dedup as D

    k, w = 8, 4

    def ref(toks):
        if len(toks) < k:
            return set()
        hs = [
            int(hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()[:15], 16)
            for i in range(len(toks) - k + 1)
        ]
        if len(hs) < w:
            return set()
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in D.winnowed_windows(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.h)
    want = {i: ref(t) for i, t in enumerate(docs) if ref(t)}
    assert got == want
