"""Merge-on-read deletes for the versioned store (Iceberg-v2 delete
files / Delta deletion vectors, at key grain).

Copy-on-write deletes (merge_version) rewrite the whole table to drop
a handful of rows — at 100 TB that is the single most expensive way
to forget something (a GDPR purge rewrites petabytes). Merge-on-read
publishes a version that is LOGICALLY base-minus-keys but PHYSICALLY
just the deleted keys:

- the new version directory holds ``_tombstones/`` (a parquet of the
  deleted keys; the underscore prefix keeps Spark's directory listing
  from ever mistaking it for data) and ``_BASE`` (JSON: the base
  version number + the key columns), plus a ``_SUCCESS`` marker so
  vacuum's completeness rule sees a committed version;
- :func:`read_version_mor` resolves the chain: walk ``_BASE`` links
  down to the nearest MATERIALIZED version, union the tombstone sets
  along the way, and anti-join them off the base scan — one broadcast
  anti-join however many delete waves are stacked;
- :func:`materialize_mor` is the compaction lever: rewrite the
  resolved data as a plain version when the chain gets deep (the
  read-amplification vs write-amplification dial every MOR format
  exposes);
- ``versioned.vacuum`` pins the transitive ``_BASE`` closure of every
  kept version, so a surviving MOR child can never lose its base.

Write-side cost: |deleted keys|, not |table| — the whole point.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import versioned as V

_BASE = "_BASE"
_TOMB = "_tombstones"


def _vdir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:05d}")


def mor_info(root: str, version: int) -> dict | None:
    """The ``_BASE`` record of a MOR version, or None for a
    materialized one."""
    p = os.path.join(_vdir(root, version), _BASE)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def delete_keys_mor(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    key_cols: tuple[str, ...],
) -> int:
    """Publish a merge-on-read delete: the new version carries ONLY
    the tombstone keys (+ the base link), written before the pointer
    swap like every sidecar. Stacks on previous MOR versions."""
    base = V.current_version(root)
    if base is None:
        raise FileNotFoundError(f"no published version under {root}")
    prev = mor_info(root, base)
    if prev is not None and tuple(prev["key_cols"]) != tuple(key_cols):
        raise ValueError(
            f"key_cols {list(key_cols)} != base chain's "
            f"{prev['key_cols']}")
    vs = V.list_versions(root)
    nxt = vs[-1] + 1
    vdir = _vdir(root, nxt)
    os.mkdir(vdir)
    keys.select(*key_cols).distinct().write.parquet(
        os.path.join(vdir, _TOMB))
    with open(os.path.join(vdir, _BASE), "w") as f:
        json.dump({"base": base, "key_cols": list(key_cols)}, f)
    # completeness marker for vacuum (Spark wrote its own only inside
    # the _tombstones subdir)
    with open(os.path.join(vdir, "_SUCCESS"), "w"):
        pass
    V.publish(root, nxt)
    return nxt


def read_version_mor(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Resolve a (possibly MOR) version to its logical rows: base
    scan minus the union of tombstone keys along the ``_BASE``
    chain. A materialized version resolves to a plain read."""
    v = V.current_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    tombs = []
    key_cols: list[str] | None = None
    info = mor_info(root, v)
    while info is not None:
        tombs.append(
            spark.read.parquet(os.path.join(_vdir(root, v), _TOMB)))
        key_cols = info["key_cols"]
        v = info["base"]
        info = mor_info(root, v)
    data = V.read_version(spark, root, v)
    if not tombs:
        return data
    dead = tombs[0]
    for t in tombs[1:]:
        dead = dead.unionByName(t)
    return data.join(
        F.broadcast(dead.distinct()), list(key_cols), "left_anti")


def materialize_mor(spark: SparkSession, root: str) -> int:
    """Compact the MOR chain: rewrite the CURRENT resolved rows as a
    plain materialized version (read-amplification reset; the old
    chain stays readable by version number until vacuumed)."""
    return V.write_version(read_version_mor(spark, root), root)
