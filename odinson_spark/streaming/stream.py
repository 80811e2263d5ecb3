"""Streaming extraction + windowed aggregation + custom stateful dedup.

The reference's nearest analogue is the incremental Lucene index
(lucene/index/IncrementalOdinsonIndex.scala:41-267 — live adds with a
refresh thread). Spark-native equivalent: the same tokenize→match stages run
unchanged on a streaming DataFrame (``mapInPandas`` is streaming-capable);
new documents land as files/Kafka, matches stream out continuously.

Also provides:
* :func:`windowed_event_counts` — watermarked tumbling-window aggregation
  (late data handled by the watermark, state bounded);
* :func:`streaming_dedup` — ``applyInPandasWithState`` custom stateful
  operator: first-seen wins across micro-batches, keyed by content hash
  (GroupState timeout bounds the state size).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..pipeline.extract import apply_prefilter, extract_mentions_df, tokenize_documents


def stream_extract(
    spark,
    input_path: str,
    extractors,
    schema,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """File-source streaming extraction: returns the streaming mentions DF;
    caller attaches the sink (``writeStream``)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    sents = tokenize_documents(stream)
    sents = apply_prefilter(sents, extractors)
    return extract_mentions_df(sents, extractors)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts (handles late arrivals up to the
    watermark; state is dropped beyond it — bounded memory at any scale)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_DEDUP_OUT = StructType(
    [
        StructField("text_hash", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_seen", LongType()),
    ]
)
_DEDUP_STATE = StructType(
    [StructField("first_doc", LongType()), StructField("n_seen", LongType())]
)


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_doc, n_seen = state.get
        emit_first = False
    else:
        first_doc, n_seen = None, 0
        emit_first = True
    for pdf in pdfs:
        for doc in pdf["doc_id"]:
            # arrival order within a micro-batch is arbitrary (partitioned
            # read): break ties by min id so the winner is deterministic
            if first_doc is None or (emit_first and int(doc) < first_doc):
                first_doc = int(doc)
            n_seen += 1
    state.update((first_doc, n_seen))
    state.setTimeoutDuration(24 * 3600 * 1000)
    if emit_first and first_doc is not None:
        yield pd.DataFrame(
            [{"text_hash": key[0], "doc_id": first_doc, "n_seen": n_seen}]
        )


def streaming_dedup(documents: DataFrame) -> DataFrame:
    """Exact streaming dedup: first document per content hash is emitted
    once; later duplicates only bump the state counter. Custom stateful
    operator via applyInPandasWithState."""
    hashed = documents.select(F.md5("text").alias("text_hash"), "doc_id")
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
