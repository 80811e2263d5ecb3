"""Port of foundations/TestOdinsonDocument.scala:11-196 — the programmatic
Document model: typed fields, compact/pretty JSON round-trips, DateField
handling, addMetadata replace/append semantics."""

import datetime
import json

import pytest

from odinson_spark.document import (
    DateField,
    Document,
    GraphField,
    Sentence,
    StringField,
    TokensField,
    field_from_json,
)

DOC_TEST_JSON = (
    '{"id":"foo","metadata":[],"sentences":[{"numTokens":1,"fields":'
    '[{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["George"]}]}]}'
)


def test_document_handles_json_correctly():
    doc = Document.from_json(DOC_TEST_JSON)
    # compact round-trip is byte-identical to the reference fixture
    # (core/src/test/resources/docs/odinson-doc-test.json)
    assert doc.to_json() == DOC_TEST_JSON
    # pretty output parses back to the same value (uPickle renders empty
    # arrays with an inner newline; everything non-empty matches 4-space
    # indent exactly — see test_tokens_field below)
    assert json.loads(doc.to_pretty_json()) == json.loads(DOC_TEST_JSON)
    assert doc.id == "foo"
    assert doc.sentences[0].num_tokens == 1
    assert doc.sentences[0].fields[0].name == "raw"


def test_tokens_field_round_trip():
    field = (
        '{"$type":"ai.lum.odinson.TokensField","name":"chunk",'
        '"tokens":["B-NP","B-VP","B-NP","I-NP","O"]}'
    )
    field_pretty = """{
    "$type": "ai.lum.odinson.TokensField",
    "name": "chunk",
    "tokens": [
        "B-NP",
        "B-VP",
        "B-NP",
        "I-NP",
        "O"
    ]
}"""
    tf = TokensField.from_json(field)
    assert tf.name == "chunk"
    assert tf.to_json() == field
    assert tf.to_pretty_json() == field_pretty
    assert tf.tokens[0] == "B-NP"
    assert tf.tokens[-1] == "O"


def test_graph_field_round_trip():
    field = (
        '{"$type":"ai.lum.odinson.GraphField","name":"dependencies",'
        '"edges":[[1,0,"nsubj"],[3,2,"amod"]],"roots":[1]}'
    )
    gf = GraphField.from_json(field)
    assert gf.name == "dependencies"
    assert gf.roots[0] == 1
    assert gf.edges[0] == (1, 0, "nsubj")
    assert gf.edges[-1] == (3, 2, "amod")
    assert gf.to_json() == field


def test_sentence_round_trip():
    sentence = (
        '{"numTokens":1,"fields":[{"$type":"ai.lum.odinson.TokensField",'
        '"name":"raw","tokens":["Becky"]},{"$type":"ai.lum.odinson.GraphField",'
        '"name":"dependencies","edges":[[1,0,"nsubj"]],"roots":[1]}]}'
    )
    s = Sentence.from_json(sentence)
    assert s.num_tokens == 1
    assert isinstance(s.fields[-1], GraphField)
    assert s.to_json() == sentence
    pretty = """{
    "numTokens": 1,
    "fields": [
        {
            "$type": "ai.lum.odinson.TokensField",
            "name": "raw",
            "tokens": [
                "Becky"
            ]
        },
        {
            "$type": "ai.lum.odinson.GraphField",
            "name": "dependencies",
            "edges": [
                [
                    1,
                    0,
                    "nsubj"
                ]
            ],
            "roots": [
                1
            ]
        }
    ]
}"""
    assert s.to_pretty_json() == pretty


def test_string_field():
    field = '{"$type":"ai.lum.odinson.StringField","name":"smth","string":"smthString"}'
    sf = StringField.from_json(field)
    assert sf.name == "smth"
    assert sf.string == "smthString"
    assert sf.to_json() == field


def test_date_field_local_date():
    field = '{"$type":"ai.lum.odinson.DateField","name":"smth","date":"1993-03-28"}'
    df = DateField.from_json(field)
    assert df.date == "1993-03-28"
    assert df.name == "smth"
    assert df.local_date.year == 1993
    assert df.local_date.day == 28
    assert df.local_date.month == 3
    df2 = DateField.from_local_date("smth", df.local_date, False)
    assert df2.date == "1993-03-28"
    assert df2.name == "smth"
    assert df2.to_json() == field


def test_date_field_from_datetime():
    dt = datetime.datetime.strptime("28/03/1993", "%d/%m/%Y")
    df = DateField.from_date("smth", dt, False)
    assert df.date == "1993-03-28"
    assert df.local_date.year == 1993
    assert df.local_date.day == 28
    assert df.local_date.month == 3


def test_add_metadata_replace_and_append(example_docs):
    doc = Document.from_json(json.dumps(example_docs["becky-gummy-bears"]))
    assert doc.metadata == ()

    d1 = DateField.from_date("smth", datetime.datetime(1993, 3, 28), False)
    updated = doc.add_metadata([d1], append=False)
    assert len(updated.metadata) == 1
    assert updated.metadata[0].name == "smth"

    d2 = DateField.from_date("smth2", datetime.datetime(2000, 3, 28), False)
    updated = updated.add_metadata([d2], append=False)  # overwrite
    assert len(updated.metadata) == 1
    assert updated.metadata[0].name == "smth2"

    d3 = DateField.from_date("smth3", datetime.datetime(2010, 3, 28), False)
    updated = updated.add_metadata([d3], append=True)  # extend
    assert sorted(f.name for f in updated.metadata) == ["smth2", "smth3"]


def test_document_feeds_the_engine(example_docs):
    """Document.to_dict() plugs into the existing fixture/ingest path."""
    from odinson_spark.lang.compiler import PatternCompiler
    from odinson_spark.match.engine import find_matches
    from odinson_spark.testing import batch_from_doc_json

    doc = Document.from_json(json.dumps(example_docs["becky-gummy-bears-v2"]))
    batch = batch_from_doc_json(doc.to_dict())
    program = PatternCompiler().compile("[lemma=eat]")
    assert len(find_matches(program, batch.context(0))) == 1


def test_store_flag_round_trip():
    f = '{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["a"],"store":true}'
    tf = TokensField.from_json(f)
    assert tf.store is True
    assert tf.to_json() == f
    # store=False is omitted, matching the reference's default-dropping
    assert "store" not in TokensField("raw", ["a"]).to_json()


def test_example_docs_round_trip(example_docs):
    """Every bundled reference fixture survives parse → to_json → parse."""
    for key, d in example_docs.items():
        doc = Document.from_json(json.dumps(d))
        assert json.loads(doc.to_json()) == _drop_defaults(d), key


def _drop_defaults(d):
    """uPickle omits default values; normalize the fixture the same way so
    parse-equality is well-defined (store=false dropped)."""
    if isinstance(d, dict):
        return {
            k: _drop_defaults(v)
            for k, v in d.items()
            if not (k == "store" and v is False)
        }
    if isinstance(d, list):
        return [_drop_defaults(x) for x in d]
    return d
