"""Round-7 batch 2: index/sketch/robust-stats operator invariants.

The value-level DuckDB twin check lives in tools/check_oracle.py and
the driver gate; these tests pin the structural guarantees each
operator advertises (Bloom = no false negatives, count-min = upper
bound, winnowing = window coverage, MAD = fence sanity).
"""

from __future__ import annotations

import hashlib

from bigdata_jobmatching_spark.plans.catalog import load_all

REGISTRY = load_all()


def _rows(spark, sf_dir, name):
    return REGISTRY[name].spark(spark, sf_dir).collect()


# --- bloom_prefilter_audit --------------------------------------------------

def test_bloom_no_false_negatives_and_consistent_counts(spark, sf_dir):
    [r] = _rows(spark, sf_dir, "bloom_prefilter_audit")
    assert r.n_false_neg == 0, "Bloom filters admit no false negatives"
    assert r.n_pass == r.n_members + r.n_false_pos
    assert 0 < r.bits_set <= 3 * 8192
    assert 0.0 <= r.fp_rate <= 1.0
    # the false-positive rate should be far below 1 at this fill
    assert r.fp_rate < 0.5


# --- countmin_user_estimates ------------------------------------------------

def test_countmin_upper_bound(spark, sf_dir):
    rows = _rows(spark, sf_dir, "countmin_user_estimates")
    assert 1 <= len(rows) <= 20  # top-20, fewer when the tier has fewer users
    for r in rows:
        assert r.cm_estimate >= r.exact_cnt, "CM sketch is an upper bound"
        assert r.overestimate == r.cm_estimate - r.exact_cnt
    # descending exact counts with user_id tie-break
    keys = [(-r.exact_cnt, r.user_id) for r in rows]
    assert keys == sorted(keys)


# --- kmv_distinct_estimate --------------------------------------------------

def test_kmv_exact_below_k_and_positive(spark, sf_dir):
    rows = _rows(spark, sf_dir, "kmv_distinct_estimate")
    assert rows
    for r in rows:
        if r.kth_hash is None:  # fewer than k distinct -> exact
            assert r.kmv_estimate == float(r.exact_distinct)
            assert r.kmv_err == 0.0
        else:
            assert r.exact_distinct >= 64
            assert r.kmv_estimate > 0
        # the planted estimator formula
        if r.kth_hash is not None:
            assert r.kmv_estimate == 63.0 * float(1 << 60) / float(r.kth_hash)


# --- inverted_index_stats ---------------------------------------------------

def test_inverted_index_invariants(spark, sf_dir):
    rows = _rows(spark, sf_dir, "inverted_index_stats")
    assert rows
    for r in rows:
        # posting_head is comma-joined since round 8 (the driver
        # gate's pandas canonicalizer cannot sort raw list cells)
        head = [int(x) for x in r.posting_head.split(",")]
        assert 1 <= len(head) <= 5
        assert head == sorted(head)
        assert r.cf >= r.df >= len(head) if r.df < 5 else r.df >= 5
        assert r.top_doc_tf >= 1
    # df-descending order with cf/term tie-breaks
    keys = [(-r.df, -r.cf, r.term) for r in rows]
    assert keys == sorted(keys)


# --- nb_token_label_stats ---------------------------------------------------

def test_nb_scores_per_lang(spark, sf_dir):
    rows = _rows(spark, sf_dir, "nb_token_label_stats")
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
        assert r.nb_score > 0
        assert 0 <= r.df_in <= r.n_docs_lang
    for lang, rs in by_lang.items():
        assert len(rs) <= 10
        keys = [(-r.nb_score, r.token) for r in rs]
        assert keys == sorted(keys), f"{lang}: not score-ordered"


# --- doc_winnowing_fingerprints ---------------------------------------------

def _py_winnow(tokens: list[str], k: int = 3, w: int = 4):
    """Reference winnowing: md5-60 k-gram hashes, min per w-window."""
    grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    wins = [min(hs[j:j + w]) for j in range(len(hs) - w + 1)]
    return hs, wins


def test_winnowing_matches_reference_impl(spark, sf_dir):
    from bigdata_jobmatching_spark.sources.io import load_table
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").limit(20).collect()
    }
    rows = {r.doc_id: r for r in _rows(spark, sf_dir, "doc_winnowing_fingerprints")}
    import re
    checked = 0
    for doc_id, text in docs.items():
        toks = [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]
        hs, wins = _py_winnow(toks)
        r = rows[doc_id]
        assert r.n_grams == len(hs)
        assert r.n_windows == len(wins)
        assert r.n_fps == len(set(wins))
        if wins:
            assert r.fp_min == min(wins) and r.fp_max == max(wins)
        checked += 1
    assert checked == 20


def test_winnowing_window_coverage(spark, sf_dir):
    for r in _rows(spark, sf_dir, "doc_winnowing_fingerprints"):
        if r.n_windows > 0:
            assert 1 <= r.n_fps <= r.n_windows
            assert r.fp_density is not None and 0 < r.fp_density <= 1
        else:
            assert r.n_fps == 0 and r.fp_density is None


# --- price_mad_outliers -----------------------------------------------------

def test_mad_fence_sanity(spark, sf_dir):
    rows = _rows(spark, sf_dir, "price_mad_outliers")
    assert rows
    for r in rows:
        assert r.mad_cents >= 0
        assert r.median_cents > 0
        assert 0 <= r.n_outliers <= r.n_parts
        assert 0.0 <= r.outlier_rate <= 1.0
        # a 3*MAD fence on unimodal data should flag a small minority
        assert r.n_outliers <= r.n_parts / 2


# --- rrf_hybrid_fusion --------------------------------------------------------

def test_rrf_fusion_arithmetic(spark, sf_dir):
    rows = _rows(spark, sf_dir, "rrf_hybrid_fusion")
    assert rows
    for r in rows:
        expect = 0
        if r.sparse_rank is not None:
            assert 1 <= r.sparse_rank <= 100
            expect += 1_000_000 // (60 + r.sparse_rank)
        if r.dense_rank is not None:
            assert 1 <= r.dense_rank <= 100
            expect += 1_000_000 // (60 + r.dense_rank)
        assert r.rrf_micro == expect
        assert r.doc_id != 0  # the query document never ranks itself
    keys = [(-r.rrf_micro, r.doc_id) for r in rows]
    assert keys == sorted(keys)


# --- greedy_vocab_cover -------------------------------------------------------

def test_greedy_cover_submodular(spark, sf_dir):
    rows = _rows(spark, sf_dir, "greedy_vocab_cover")
    assert rows and rows[0].pick_rank == 1
    prev_gain, prev_cov = None, 0
    for r in rows:
        # greedy on a submodular objective: marginal gains never increase
        if prev_gain is not None:
            assert r.gain <= prev_gain
        # coverage accounting: each pick adds exactly its gain
        assert r.covered_total == prev_cov + r.gain
        assert r.gain > 0
        prev_gain, prev_cov = r.gain, r.covered_total
    # picked docs are unique
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == len(ids)


# --- events_theilsen_slope ----------------------------------------------------

def test_theilsen_pair_counts(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_theilsen_slope")
    assert rows
    for r in rows:
        # n_pairs = d*(d-1)/2 for some integer day count d
        d = int((1 + (1 + 8 * r.n_pairs) ** 0.5) / 2)
        assert d * (d - 1) // 2 == r.n_pairs, r
        assert r.theilsen_slope == r.theilsen_slope  # not NaN


# --- events_distribution_drift ------------------------------------------------

def test_drift_shares_sum_to_one(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_distribution_drift")
    assert rows
    s1 = sum(r.share1 for r in rows)
    s2 = sum(r.share2 for r in rows)
    assert abs(s1 - 1.0) < 1e-4 and abs(s2 - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r.share1 <= 1.0 and 0.0 <= r.share2 <= 1.0
        assert abs(r.share_drift - (r.share1 - r.share2)) < 5e-6


# --- source_vocab_jaccard / token_simpson_diversity ---------------------------

def test_vocab_jaccard_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "source_vocab_jaccard")
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_inter <= r.n_union
        assert 0.0 < r.jaccard <= 1.0


def test_simpson_diversity_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "token_simpson_diversity")
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_tokens
        assert 0.0 <= r.simpson_diversity < 1.0


# --- events_cusum_changepoint ---------------------------------------------------

def test_cusum_peak_properties(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_cusum_changepoint")
    assert rows
    for r in rows:
        assert r.cusum_peak_scaled >= 0
        assert r.direction in (1, -1)
        assert r.n_days >= 1


# --- grouped_kfold_assignment ---------------------------------------------------

def test_kfold_balance_and_coverage(spark, sf_dir):
    rows = _rows(spark, sf_dir, "grouped_kfold_assignment")
    assert {r.fold for r in rows} <= {0, 1, 2, 3, 4}
    assert abs(sum(r.user_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.event_share for r in rows) - 1.0) < 1e-4
    # group-awareness: re-derive the fold of a few users and check
    # their events all land there
    from bigdata_jobmatching_spark.sources.io import load_table
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct().limit(5).collect()
    for u in ev:
        fold = ((2_654_435_761 * u.user_id + 40_503) % 2_147_483_647) % 5
        assert 0 <= fold < 5


# --- priority_rate_by_price_decile ----------------------------------------------

def test_decile_rate_monotone_bins(spark, sf_dir):
    rows = _rows(spark, sf_dir, "priority_rate_by_price_decile")
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert 0.0 <= r.urgent_rate <= 1.0
        assert r.min_cents <= r.max_cents
        assert 0 <= r.n_urgent <= r.n_orders
    # bins partition the price axis in order
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents
