"""MLlib MinHashLSH wrapper — the library scale-path SURVEY §4/§7
names for similarity dedup (``MinHashLSH.approxSimilarityJoin``).

Our native banded implementation (operators.dedup.minhash_lsh_pairs)
is the default; this wrapper exists for parity with the MLlib API and
as a cross-check: both find near-duplicate candidate pairs above a
Jaccard threshold. MLlib wants sparse vectors, so tokens are hashed
into a fixed-dimension binary vector (HashingTF with binary=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..sources.io import fan_out


def mllib_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.6,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH approxSimilarityJoin.

    Returns (id_a, id_b, jaccard_distance) with id_a < id_b. Note
    MLlib reports Jaccard DISTANCE (1 - similarity).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        S.word_ngrams(F.col(text_col), shingle_n).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=num_features, binary=True)
    feats = tf.transform(sh)

    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_distance",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_features: int = 1 << 16,
) -> DataFrame:
    """MLlib text-analysis path: Tokenizer -> StopWordsRemover ->
    HashingTF -> IDF (SURVEY §7.2-10). Returns (id, tfidf sparse
    vector) — downstream consumers take norms/similarities. The
    native expression path (functions/text.py) remains the default
    for oracle-checkable stats; this is the MLlib-pipeline parity
    surface."""
    from pyspark.ml.feature import IDF, HashingTF, StopWordsRemover, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    sw = StopWordsRemover(inputCol="__words", outputCol="__terms")
    tf = HashingTF(inputCol="__terms", outputCol="__tf", numFeatures=num_features)
    stage = tf.transform(sw.transform(tok.transform(fan_out(df.select(id_col, text_col)))))
    idf = IDF(inputCol="__tf", outputCol="tfidf").fit(stage)
    return idf.transform(stage).select(id_col, "tfidf")
