"""Similarity Column expressions — native, no Python-per-row.

Rebuilds the reference's similarity UDF
(``calculate_similarity_score_udf``, deduplicate.py:73-109: weighted
0.5*Jaccard(title) + 0.3*eq(company) + 0.2*eq(location)) as pure
column arithmetic, and adds the vector/set similarity kernels the
dedup + ANN operators need (cosine, dot, Jaccard over n-gram shingle
sets, SimHash, MinHash signatures).

Vector math uses higher-order functions (``zip_with`` / ``aggregate``)
— JVM-evaluated per row over the array, no UDF serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .binding import let
from .text import shingle_starts, tokens


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array<string> columns (set semantics).

    Native form of the UDF at deduplicate.py:89-96:
    |A ∩ B| / |A ∪ B|, 0.0 when the union is empty.
    """
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def eq_score(a: Column, b: Column) -> Column:
    """1.0 when both non-null and equal, else 0.0 (deduplicate.py:99-105)."""
    return F.when(a.isNotNull() & b.isNotNull() & (a == b), F.lit(1.0)).otherwise(F.lit(0.0))


def weighted_record_similarity(
    title_a: Column, title_b: Column,
    company_a: Column, company_b: Column,
    location_a: Column, location_b: Column,
    w_title: float = 0.5, w_company: float = 0.3, w_location: float = 0.2,
) -> Column:
    """The reference's record-similarity formula (deduplicate.py:73-109),
    weights 0.5/0.3/0.2, on already-normalized token arrays/strings."""
    return (
        F.lit(w_title) * jaccard(title_a, title_b)
        + F.lit(w_company) * eq_score(company_a, company_b)
        + F.lit(w_location) * eq_score(location_a, location_b)
    )


def word_ngrams(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    let-bound: the tokenize chain must evaluate once per row, not once
    per shingle (CollapseProject would inline it into the lambda).
    """
    def body(toks: Column) -> Column:
        idx = shingle_starts(F.size(toks), n)
        return F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))

    return let(tokens(c), body)


def ngram_jaccard(a: Column, b: Column, n: int = 3) -> Column:
    """n-gram Jaccard similarity of two raw-text columns."""
    return jaccard(word_ngrams(a, n), word_ngrams(b, n))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, computed in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two vectors; 0.0 if either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def minhash_signature(token_array: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``) of a
    token/shingle set.

    Hash family: xxhash64(token, seed=i) for i in [0, num_hashes) —
    xxhash64 accepts a seed literal, giving independent permutation
    approximations without Python. Empty sets map to a sentinel
    signature of Long.MaxValue so they never collide with content.
    """
    max_long = F.lit(9223372036854775807)

    def body(toks: Column) -> Column:
        return F.array(*[
            F.coalesce(
                F.array_min(F.transform(toks, lambda t: F.xxhash64(t, F.lit(i)))),
                max_long,
            )
            for i in range(num_hashes)
        ])

    return let(token_array, body)


def minhash_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """LSH band keys: array<string> of '<band_idx>:<hash of band slice>'.

    Docs sharing any band key become join candidates; banding turns
    the O(n²) all-pairs problem into an equi-join on band key, which
    Spark shuffles by key — the scalable path at 100 TB.
    """
    def body(sig: Column) -> Column:
        return F.array(*[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.xxhash64(F.array_join(
                    F.transform(F.slice(sig, b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string")),
                    "_",
                )).cast("string"),
            )
            for b in range(num_bands)
        ])

    return let(signature, body)


def simhash64(token_array: Column) -> Column:
    """64-bit SimHash of a token array as a bigint.

    For each bit position, sum +1/-1 contributions of each token's
    xxhash64 bit; bit set iff the sum is positive. Expressed with
    higher-order functions over a 64-element index array — heavier
    than MinHash but still fully native.
    """
    def body(toks: Column) -> Column:
        # hash each token ONCE, then derive all 64 bit-votes from the
        # bound hash array (64 aggregates over cheap attribute refs).
        hashes = F.transform(toks, lambda t: F.xxhash64(t))

        def from_hashes(hs: Column) -> Column:
            out = F.lit(0).cast("long")
            for bit in range(64):
                contrib = F.transform(
                    hs,
                    lambda h: F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
                )
                total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
                bit_val = F.when(
                    total > 0, F.shiftleft(F.lit(1).cast("long"), bit)
                ).otherwise(F.lit(0).cast("long"))
                out = out.bitwiseOR(bit_val)
            return out

        return let(hashes, from_hashes)

    return let(token_array, body)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes (bigint cols)."""
    return F.bit_count(a.bitwiseXOR(b))


# Oracle-friendly MinHash hash family: token -> integer via the first
# 15 md5 hex digits (engine-independent, unlike xxhash64), then k LCG
# permutations (a*x + b) mod p. p fits 31 bits so a*x stays inside
# int64 — every step is exact in both Spark and DuckDB, making the
# FULL LSH pipeline value-verifiable, not just rows-checkable.
MINHASH_P = 2_147_483_647


def lcg_seeds(k: int) -> tuple[tuple[int, int], ...]:
    return tuple(
        ((i * 2654435761 + 12582917) % MINHASH_P, (i * 40503 + 7) % MINHASH_P)
        for i in range(k)
    )


def md5_token_hash(t: Column) -> Column:
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % MINHASH_P


def md5_minhash_signature(token_array: Column, num_hashes: int = 16) -> Column:
    """Cross-engine-exact MinHash signature (array<bigint>). Empty
    sets map to the sentinel p (outside the mod range) so they never
    collide with content signatures."""
    seeds = lcg_seeds(num_hashes)

    def perm(a: int, b: int):
        return lambda h: (h * a + b) % MINHASH_P

    def body(hv: Column) -> Column:
        return F.array(*[
            F.coalesce(F.array_min(F.transform(hv, perm(a, b))), F.lit(MINHASH_P))
            for a, b in seeds
        ])

    return let(F.transform(token_array, md5_token_hash), body)


def md5_token_hash_raw(t: Column) -> Column:
    """60-bit engine-independent token hash (no modulus)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_md5(token_array: Column, bits: int = 32) -> Column:
    """Cross-engine-exact SimHash over md5-derived token ints: every
    bit vote is integer arithmetic DuckDB reproduces, so signatures
    are value-verifiable (unlike the xxhash64 simhash64)."""
    def body(hs: Column) -> Column:
        out = F.lit(0).cast("long")
        for bit in range(bits):
            contrib = F.transform(
                hs,
                lambda h: F.when(
                    F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            )
            total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
            out = out.bitwiseOR(
                F.when(total > 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
                    F.lit(0).cast("long")
                )
            )
        return out

    return let(F.transform(token_array, md5_token_hash_raw), body)
