"""Parity with the reference's processors→Odinson converter
(extra/ConvertProcessorsToOdinson.scala + utils/ProcessorsUtils.scala:50-97):
field mapping, graph-preference order, deterministic id fallback, and the
distributed ingest path end-to-end."""

import json

import pytest

from odinson_spark.sources.processors_json import (
    convert_document,
    convert_sentence,
    read_processors_json,
)


def proc_sentence(**over):
    s = {
        "words": ["John", "eats", "cake"],
        "raw": ["John", "eats", "cake"],
        "tags": ["NNP", "VBZ", "NN"],
        "lemmas": ["john", "eat", "cake"],
        "entities": ["PER", "O", "O"],
        "chunks": ["B-NP", "B-VP", "B-NP"],
        "graphs": {
            "universal-basic": {
                "edges": [
                    {"source": 1, "destination": 0, "relation": "nsubj"},
                    {"source": 1, "destination": 2, "relation": "dobj"},
                ],
                "roots": [1],
            }
        },
    }
    s.update(over)
    return s


def test_sentence_field_mapping():
    sent = convert_sentence(proc_sentence())
    by_name = {f.name: f for f in sent.fields}
    assert sent.num_tokens == 3
    assert by_name["raw"].tokens == ("John", "eats", "cake")
    assert by_name["word"].tokens == ("John", "eats", "cake")
    assert by_name["tag"].tokens == ("NNP", "VBZ", "NN")
    assert by_name["lemma"].tokens == ("john", "eat", "cake")
    assert by_name["entity"].tokens == ("PER", "O", "O")
    assert by_name["chunk"].tokens == ("B-NP", "B-VP", "B-NP")
    assert by_name["dependencies"].edges == ((1, 0, "nsubj"), (1, 2, "dobj"))
    assert by_name["dependencies"].roots == (1,)


def test_optional_fields_omitted():
    s = proc_sentence()
    del s["tags"], s["lemmas"], s["entities"], s["chunks"], s["graphs"]
    sent = convert_sentence(s)
    assert {f.name for f in sent.fields} == {"raw", "word"}


def test_graph_preference_order():
    # hybrid > universal-enhanced > universal-basic (ProcessorsUtils match)
    g = lambda rel: {
        "edges": [{"source": 0, "destination": 1, "relation": rel}],
        "roots": [0],
    }
    s = proc_sentence(
        graphs={
            "universal-basic": g("basic"),
            "universal-enhanced": g("enhanced"),
            "hybrid": g("hybrid"),
        }
    )
    deps = [f for f in convert_sentence(s).fields if f.name == "dependencies"][0]
    assert deps.edges[0][2] == "hybrid"
    del s["graphs"]["hybrid"]
    deps = [f for f in convert_sentence(s).fields if f.name == "dependencies"][0]
    assert deps.edges[0][2] == "enhanced"


def test_document_id_and_determinism():
    d = {"sentences": [proc_sentence()]}
    doc1 = convert_document(json.dumps(d))
    doc2 = convert_document(json.dumps(d))
    assert doc1.id == doc2.id  # deterministic (reference uses a random UUID)
    assert len(doc1.sentences) == 1
    assert doc1.metadata == ()  # reference mkMetadata returns Seq.empty
    named = convert_document({"id": "doc-7", "sentences": []})
    assert named.id == "doc-7"


def test_distributed_ingest_and_query(spark, tmp_path):
    lines = [
        json.dumps({"id": f"d{i}", "sentences": [proc_sentence()]})
        for i in range(6)
    ]
    p = tmp_path / "proc.jsonl"
    p.write_text("\n".join(lines) + "\n")
    sents = read_processors_json(spark, str(p))
    assert sents.count() == 6

    from odinson_spark.search import SearchEngine

    engine = SearchEngine(sents)
    # surface + graph traversal over the converted dependency graph
    res = engine.search("[tag=VBZ] >dobj []", n=100)
    assert len(res.rows) == 6
    assert all(r.text == "cake" for r in res.rows)
