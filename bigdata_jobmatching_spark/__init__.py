"""bigdata_jobmatching_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic PySpark (DataFrame / SQL / Catalyst /
Structured Streaming) engine with the query and data-processing
capabilities of the reference system `theman1811/BigData_jobMatching`
(job-market analytics: stream ingest -> parse -> enrich -> dedup ->
star schema -> analytics queries -> offer/CV matching), plus the
large-scale training-data-pipeline operators (dedup families,
similarity search, text analysis, multimodal plumbing) that a 100 TB
deployment needs.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, UTC).
- ``schemas``    : canonical StructTypes for the job-matching domain.
- ``sources``    : readers/writers (parquet lake, JSON ingest, blob store).
- ``functions``  : native Column-expression libraries (text, similarity,
                   ids, salary) — JVM-side, Catalyst-optimizable.
- ``operators``  : composed relational operators (dedup, matching,
                   top-k, similarity search, multimodal).
- ``plans``      : the named analytics query catalog + the batch
                   pipeline driver.
- ``streaming``  : Structured Streaming ingest and windowed aggregates.

Design stance (see SURVEY.md §7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten choose physical strategy;
no RDDs; Python only via Arrow-vectorized pandas UDFs where built-ins
genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
