"""End-to-end Spark integration: repos → tokenize → prefilter → match → triples."""

import pytest

from odinson_spark.lang.rules import RuleReader
from odinson_spark.pipeline.extract import (
    apply_prefilter,
    extract_mentions_df,
    tokenize_documents,
    tokenize_repos,
    triples_from_mentions,
)
from odinson_spark.schema import REPOS_SCHEMA

REPO_FILES = [
    (
        "acme/libfoo",
        "src/main.py",
        "c" * 40,
        "python",
        "def main():\n    total = compute(alpha, beta)\n    print(total)\n",
    ),
    (
        "acme/libbar",
        "lib.rs",
        "d" * 40,
        "rust",
        "fn add(a, b)\nlet result = add(x, y)\n",
    ),
]


@pytest.fixture(scope="module")
def repos_df(spark):
    return spark.createDataFrame(REPO_FILES, REPOS_SCHEMA)


def test_tokenize_repos(spark, repos_df):
    sents = tokenize_repos(repos_df)
    rows = sents.collect()
    assert all(r.content_sha and len(r.content_sha) == 64 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 2
    main = next(r for r in rows if "main.py" in r.doc_id and r.sent_id == 0)
    assert main.raw[:2] == ["def", "main"]
    assert main.tag[0] == "KEYWORD"
    assert "def" in main.deps_label  # def-edge from keyword to name


def test_extraction_end_to_end(spark, repos_df):
    grammar = """
rules:
  - name: call-args
    label: CallArg
    type: event
    priority: 1
    pattern: |
      trigger = [entity=CALL]
      callee: ^Sym = >arg [tag=IDENT]
"""
    extractors, _ = RuleReader().compile_rules(grammar)
    sents = tokenize_repos(repos_df)
    filtered = apply_prefilter(sents, extractors)
    mentions = extract_mentions_df(filtered, extractors)
    rows = mentions.filter("is_event").collect()
    texts = sorted(r.text for r in rows)
    # one EventMatch per (trigger, arg-combination): add(x,y) and
    # compute(alpha,beta) each yield two single-callee events (reference
    # packaging semantics, MatchSelector.scala:150-175), print(total) one
    assert texts == ["add", "add", "compute", "compute", "print"]
    callees = sorted(c.text for r in rows for c in r.captures)
    assert callees == ["alpha", "beta", "total", "x", "y"]


def test_triples_from_mentions(spark, repos_df):
    grammar = """
rules:
  - name: assign-flow
    label: Assign
    type: event
    priority: 1
    pattern: |
      trigger = [tag=IDENT] (?= [norm="="])
      src: ^Sym = >assign []
"""
    extractors, _ = RuleReader().compile_rules(grammar)
    sents = tokenize_repos(repos_df)
    mentions = extract_mentions_df(apply_prefilter(sents, extractors), extractors)
    triples = triples_from_mentions(mentions)
    rows = triples.collect()
    # each assignment: subj = first capture (src), pred = label
    assert all(r.pred == "Assign" for r in rows)
    assert {(r.subj_text) for r in rows} <= {"compute", "add", "total", "result"}


def test_documents_tokenizer(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox", "en"), (2, "", "en")],
        "doc_id long, text string, lang string",
    )
    sents = tokenize_documents(docs)
    rows = sents.collect()
    assert len(rows) == 1
    assert rows[0].raw == ["the", "quick", "brown", "fox"]
    assert rows[0].deps_label == ["next", "next", "next"]


def test_prefilter_prunes(spark, repos_df):
    grammar = """
rules:
  - name: needle
    type: basic
    pattern: |
      [norm=nonexistent_token_xyz]
"""
    extractors, _ = RuleReader().compile_rules(grammar)
    sents = tokenize_repos(repos_df)
    filtered = apply_prefilter(sents, extractors)
    assert filtered.count() == 0
    # and the plan contains the pushed filter, not a python stage
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "array_contains" in plan
