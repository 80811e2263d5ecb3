"""Table IO abstraction: Iceberg on a cluster, parquet paths locally.

The pipeline is written against this interface so the same code runs in
both environments. Iceberg is the production target (snapshot-isolated
stage checkpoints, MERGE/DELETE for incremental document updates mirroring
the reference's delete/update of Lucene docs, OdinsonIndex.scala:58-106);
this sandbox has no Iceberg runtime jars, so the parquet backend is what
tests exercise. The Iceberg branch is thin (catalog table names instead of
paths) and uses only public Iceberg-Spark SQL surface.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableIO:
    """``table`` arguments are catalog table names (Iceberg) or directory
    paths (parquet)."""

    def __init__(self, spark: SparkSession, use_iceberg: Optional[bool] = None):
        self.spark = spark
        self.use_iceberg = _has_iceberg(spark) if use_iceberg is None else use_iceberg

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(table)
        return self.spark.read.parquet(table)

    def overwrite(self, df: DataFrame, table: str, partition_by=None):
        if self.use_iceberg:
            w = df.writeTo(table).using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(table)

    def append(self, df: DataFrame, table: str):
        if self.use_iceberg:
            df.writeTo(table).append()
        else:
            df.write.mode("append").parquet(table)

    def delete_doc(self, table: str, doc_id: str):
        """Incremental delete (reference: remove all Lucene docs of an
        Odinson doc, OdinsonIndex.scala:58-106). Iceberg: row-level DELETE
        with the id bound as a named parameter (never interpolated — a
        doc_id containing a quote must not break or inject). Parquet
        backend: rewrite to a temp path, then swap — the job never reads and
        overwrites the same path (relying on cache retention to have
        materialized the input corrupts the table under memory pressure)."""
        if self.use_iceberg:
            self.spark.sql(
                f"DELETE FROM {table} WHERE doc_id = :doc_id",
                args={"doc_id": doc_id},
            )
        else:
            from pyspark.sql import functions as F

            df = self.read(table).filter(F.col("doc_id") != F.lit(doc_id))
            tmp = f"{table.rstrip('/')}.__rewrite-{uuid.uuid4().hex[:8]}__"
            df.write.mode("overwrite").parquet(tmp)
            old = f"{table.rstrip('/')}.__old-{uuid.uuid4().hex[:8]}__"
            os.rename(table, old)
            os.rename(tmp, table)
            shutil.rmtree(old)

    def update_doc(self, table: str, doc_id: str, rows: DataFrame):
        """Incremental update = delete + append (the reference's update path,
        IncrementalOdinsonIndex.scala: delete old Lucene docs, re-add)."""
        self.delete_doc(table, doc_id)
        self.append(rows, table)
