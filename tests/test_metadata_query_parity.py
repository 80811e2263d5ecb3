"""Port of foundations/TestOdinsonMetadataQuery.scala:17-81 — pattern +
parent-query (metadata filter) conjunction over the tp-briggs / tp-pies
example documents, through the document-JSON source and the search engine."""

import json

import pytest

from odinson_spark.lang.metadata import compile_metadata_query
from odinson_spark.search import SearchEngine
from odinson_spark.sources.document_json import read_document_json


@pytest.fixture(scope="module")
def engine(spark, example_docs, tmp_path_factory):
    path = tmp_path_factory.mktemp("tp") / "docs.jsonl"
    with open(path, "w") as f:
        for key in ("tp-briggs", "tp-pies"):
            f.write(json.dumps(example_docs[key]) + "\n")
    sentences = read_document_json(spark, str(path)).cache()
    yield SearchEngine(sentences, meta_prefix="meta_")
    sentences.unpersist()


def test_pattern_succeeds_parent_query_fails(engine):
    res = engine.search("[lemma=pie]", metadata_filter="character contains 'NotAWord'",
                        compute_total_hits=True)
    assert res.total_hits == 0
    assert res.rows == []


def test_pattern_succeeds_no_parent_query(engine):
    res = engine.search("[lemma=pie]", compute_total_hits=True)
    assert res.total_hits == 1
    assert len(res.rows) == 1


def test_pattern_and_regex_parent_query_succeed(engine):
    res = engine.search("[lemma=pie]", metadata_filter="character contains '/S.*/ Agent'",
                        compute_total_hits=True)
    assert res.total_hits == 1
    assert len(res.rows) == 1


def test_metadata_only_document_query(engine):
    # "match metadata document": the parent query alone selects one document
    docs = (
        engine.sentences.filter(
            compile_metadata_query("character == 'Special Agent Dale Cooper'", "meta_")
        )
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert len(docs) == 1


def test_pattern_and_exact_match_parent_query(engine):
    res = engine.search(
        "[lemma=pie]",
        metadata_filter='character == "Special Agent Dale Cooper"',
        compute_total_hits=True,
    )
    assert res.total_hits == 1
    assert len(res.rows) == 1


def test_pattern_and_two_field_exact_match_parent_query(engine):
    res = engine.search(
        "[lemma=pie]",
        metadata_filter='character == "Special Agent Dale Cooper" && show == "Twin Peaks"',
        compute_total_hits=True,
    )
    assert res.total_hits == 1
    assert len(res.rows) == 1


def test_pattern_and_two_field_parent_query_one_fails(engine):
    res = engine.search(
        "[lemma=pie]",
        metadata_filter='character == "Special Agent Dale Cooper" && show == "Fire Walk With Me"',
        compute_total_hits=True,
    )
    assert res.total_hits == 0
    assert res.rows == []
