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

import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` — works across schemes (file://,
    hdfs://, s3a://), unlike driver-local os.rename/shutil."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm


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

            settings = self.read_settings(table)  # survive the swap below
            df = self.read(table).filter(F.col("doc_id") != F.lit(doc_id))
            tmp = f"{table.rstrip('/')}.__rewrite-{uuid.uuid4().hex[:8]}__"
            df.write.mode("overwrite").parquet(tmp)
            # swap through the Hadoop FileSystem API so hdfs://, s3a:// and
            # local paths all work. Crash-safety: the __old__ directory is
            # deleted only AFTER the new data is renamed into place; a crash
            # between the two renames leaves __old__ intact for recovery
            # (restore by renaming it back to the table path).
            fs, table_path, jvm = _hadoop_fs(self.spark, table)
            old = f"{table.rstrip('/')}.__old-{uuid.uuid4().hex[:8]}__"
            old_path = jvm.org.apache.hadoop.fs.Path(old)
            tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
            if not fs.rename(table_path, old_path):
                raise IOError(f"could not move {table} aside to {old}")
            if not fs.rename(tmp_path, table_path):
                # roll back so the table path is never left empty
                fs.rename(old_path, table_path)
                raise IOError(f"could not move rewritten data into {table}")
            fs.delete(old_path, True)
            if settings is not None:
                self.write_settings(table, settings)

    def update_doc(self, table: str, doc_id: str, rows: DataFrame):
        """Incremental update = delete + append (the reference's update path,
        IncrementalOdinsonIndex.scala: delete old Lucene docs, re-add)."""
        self.delete_doc(table, doc_id)
        self.append(rows, table)

    # -- index settings -----------------------------------------------------
    # The reference persists IndexSettings (storedFields, displayField) inside
    # the index directory and validates them on reopen
    # (IncrementalOdinsonIndex/IndexSettings; TestIncrementalIndex.scala:38-93).
    # Here the analogue is a JSON sidecar next to the sentence table (written
    # through the Hadoop FileSystem so it works on any scheme) carrying the
    # layer configuration — with token fields config-driven, a reopened table
    # must know its layers.

    SETTINGS_FILE = "_odinson_settings.json"

    def write_settings(self, table: str, settings: dict):
        if settings.get("display_field") is not None and settings.get(
            "stored_fields"
        ) is not None:
            if settings["display_field"] not in settings["stored_fields"]:
                raise ValueError(
                    f"displayField {settings['display_field']!r} must be one of "
                    f"storedFields {settings['stored_fields']!r}"
                )
        import json

        fs, table_path, jvm = _hadoop_fs(self.spark, table)
        out_path = jvm.org.apache.hadoop.fs.Path(
            f"{table.rstrip('/')}/{self.SETTINGS_FILE}"
        )
        stream = fs.create(out_path, True)
        try:
            stream.write(bytearray(json.dumps(settings, sort_keys=True), "utf-8"))
        finally:
            stream.close()

    def read_settings(self, table: str) -> Optional[dict]:
        import json

        fs, _, jvm = _hadoop_fs(self.spark, table)
        in_path = jvm.org.apache.hadoop.fs.Path(
            f"{table.rstrip('/')}/{self.SETTINGS_FILE}"
        )
        if not fs.exists(in_path):
            return None
        stream = fs.open(in_path)
        try:
            # py4j passes byte[] by value, so Java-side readFully can't fill a
            # Python buffer — read to a Java String instead (commons-io ships
            # with Spark)
            text = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
            return json.loads(text)
        finally:
            stream.close()
