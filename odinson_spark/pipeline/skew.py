"""Skew handling for giant repos/files (north-rule requirement).

Source-code corpora are badly skewed: a few repos hold millions of files and
a few files hold megabytes of text. Two mitigations, applied before the
tokenize stage:

* ``salted_repartition`` — keys like ``repo`` are hot; we shuffle on
  (hash(repo, path), salt) so no single task owns a whole giant repo.
* ``size_bucketed`` — cost of the tokenize/match stages is ∝ content length,
  not row count. Range-partitioning by a log-size bucket makes per-task work
  uniform (the analogue of the reference's max-sentence-length guard,
  OdinsonIndexWriter.scala:116-120, applied at file granularity).

Oversized files are split/truncated by the tokenizer's per-sentence cap, so
no single row can blow an executor regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, cols, num_partitions: int, salt_buckets: int = 16, salt_cols=None
) -> DataFrame:
    """Shuffle on (cols, salt) so a hot key spreads over ``salt_buckets``
    tasks. The salt is derived deterministically from row CONTENT (all
    columns by default), never from ``monotonically_increasing_id()`` or a
    random: a nondeterministic shuffle key re-hashes rows differently when a
    stage retries after a fetch failure, which Spark cannot reconcile and may
    duplicate or drop rows."""
    basis = [F.col(c) for c in (salt_cols or df.columns)]
    salt = F.pmod(F.xxhash64(*basis), F.lit(salt_buckets))
    return (
        df.withColumn("_salt", salt)
        .repartition(num_partitions, *(list(cols) + ["_salt"]))
        .drop("_salt")
    )


def size_bucketed(df: DataFrame, content_col: str = "content", num_partitions: int = 0) -> DataFrame:
    """Co-locate similarly-sized rows so tasks have uniform cost; AQE then
    coalesces the small buckets."""
    bucket = F.floor(F.log2(F.greatest(F.length(F.col(content_col)), F.lit(1)) + 1))
    out = df.withColumn("_size_bucket", bucket)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "_size_bucket", F.xxhash64(content_col))
    else:
        out = out.repartitionByRange("_size_bucket", F.xxhash64(content_col))
    return out.drop("_size_bucket")
