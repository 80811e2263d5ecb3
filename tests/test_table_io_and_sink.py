"""Exercise every TableIO method on the parquet backend (the Iceberg branch
shares the same interface but needs runtime jars this sandbox lacks — see
COVERAGE.md), plus the mention JSON sink at all three verbosity levels
(reference: serialization/JsonSerializer.scala:8-55)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from odinson_spark.lang.rules import RuleReader
from odinson_spark.pipeline.oneshot import extract_one_shot
from odinson_spark.sources.document_json import VERBOSITY_COLUMNS, write_mentions_json
from odinson_spark.sources.table_io import TableIO


@pytest.fixture
def tio(spark):
    io = TableIO(spark, use_iceberg=False)
    assert not io.use_iceberg
    return io


def _docs(spark):
    return spark.createDataFrame(
        [("a", "x1"), ("b", "x2"), ("it's", "x3")], "doc_id string, payload string"
    )


def test_table_io_roundtrip(spark, tio, tmp_path):
    p = str(tmp_path / "t")
    tio.overwrite(_docs(spark), p)
    assert tio.read(p).count() == 3
    tio.append(_docs(spark).filter(F.col("doc_id") == "a"), p)
    assert tio.read(p).count() == 4
    tio.overwrite(_docs(spark), p)
    assert tio.read(p).count() == 3


def test_table_io_overwrite_partitioned(spark, tio, tmp_path):
    p = str(tmp_path / "t")
    tio.overwrite(_docs(spark).withColumn("part", F.lit("x")), p, partition_by=["part"])
    got = tio.read(p)
    assert got.count() == 3 and "part" in got.columns


def test_delete_doc_rewrites_without_self_overwrite(spark, tio, tmp_path):
    p = str(tmp_path / "t")
    tio.overwrite(_docs(spark), p)
    tio.delete_doc(p, "b")
    left = sorted(r.doc_id for r in tio.read(p).collect())
    assert left == ["a", "it's"]
    # no temp/old dirs left behind
    siblings = os.listdir(tmp_path)
    assert siblings == ["t"]


def test_delete_doc_quote_in_id_is_safe(spark, tio, tmp_path):
    # a doc_id containing a quote must delete exactly that row (the old
    # f-string SQL would have raised or mangled the predicate)
    p = str(tmp_path / "t")
    tio.overwrite(_docs(spark), p)
    tio.delete_doc(p, "it's")
    assert sorted(r.doc_id for r in tio.read(p).collect()) == ["a", "b"]


def test_update_doc(spark, tio, tmp_path):
    p = str(tmp_path / "t")
    tio.overwrite(_docs(spark), p)
    new_rows = spark.createDataFrame([("b", "x2-new")], "doc_id string, payload string")
    tio.update_doc(p, "b", new_rows)
    got = {r.doc_id: r.payload for r in tio.read(p).collect()}
    assert got["b"] == "x2-new" and len(got) == 3


# --- mention sink -------------------------------------------------------------


def _mentions(spark):
    docs = spark.createDataFrame(
        [(1, "alpha join beta", "en")], "doc_id long, text string, lang string"
    )
    grammar = """
rules:
  - name: pair
    label: Pair
    type: basic
    pattern: |
      (?<left> alpha) join
"""
    extractors, _ = RuleReader().compile_rules(grammar)
    return extract_one_shot(docs, extractors)


@pytest.mark.parametrize("verbosity", ["minimal", "display", "all"])
def test_write_mentions_json_roundtrip(spark, tmp_path, verbosity):
    m = _mentions(spark)
    p = str(tmp_path / verbosity)
    write_mentions_json(m, p, verbosity=verbosity)
    files = [f for f in os.listdir(p) if f.endswith(".json")]
    assert files
    lines = []
    for f in files:
        with open(os.path.join(p, f)) as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    assert len(lines) == m.count() == 1
    row = lines[0]
    # spark.read.json drops null-valued keys per row; require the non-null
    # required fields and forbid anything beyond the verbosity contract
    assert set(row) <= set(VERBOSITY_COLUMNS[verbosity])
    for required in ("doc_id", "sent_id", "found_by", "start", "end"):
        assert required in row
    if verbosity in ("display", "all"):
        assert row["label"] == "Pair" and row["text"] == "alpha join"
    if verbosity == "all":
        assert row["content_sha"] and len(row["content_sha"]) == 64
        assert row["captures"][0]["name"] == "left"
        assert row["captures"][0]["text"] == "alpha"
    # and it reads back through spark
    back = spark.read.json(p)
    assert back.count() == 1
