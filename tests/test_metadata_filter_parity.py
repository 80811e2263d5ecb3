"""Parity: metadata/TestMetadataFilter.scala — the full typed-metadata filter
suite (dates, numbers, keywords, nested author objects, text-field exact vs
contains semantics, regex tokens, unicode) over the reference's 13-document
corpus, run through read_document_json → meta_* columns →
compile_metadata_query → extraction."""

import json

import pytest

from odinson_spark.lang.metadata import compile_metadata_query
from odinson_spark.lang.rules import RuleReader
from odinson_spark.pipeline.extract import apply_prefilter, extract_mentions_df
from odinson_spark.sources.document_json import read_document_json


def _tok(name, tokens):
    return {"$type": "ai.lum.odinson.TokensField", "name": name, "tokens": tokens}


def _num(name, value):
    return {"$type": "ai.lum.odinson.NumberField", "name": name, "value": value}


def _date(name, date):
    return {"$type": "ai.lum.odinson.DateField", "name": name, "date": date}


def _nested(name, **fields):
    return {
        "$type": "ai.lum.odinson.NestedField",
        "name": name,
        "fields": [_tok(k, v) for k, v in fields.items()],
    }


def _doc(i, words, metadata):
    n = len(words)
    return {
        "id": f"doc{i}",
        "metadata": metadata,
        "sentences": [
            {
                "numTokens": n,
                "fields": [
                    _tok("raw", words),
                    _tok("word", words),
                    _tok("tag", ["NNP", "VBD", "JJ", "NNS", "."]),
                    _tok("lemma", [w.lower() for w in words]),
                    {
                        "$type": "ai.lum.odinson.GraphField",
                        "name": "dependencies",
                        "edges": [[1, 0, "nsubj"], [1, 3, "dobj"], [1, 4, "punct"], [3, 2, "amod"]],
                        "roots": [1],
                    },
                ],
            }
        ],
    }


GUMMY = ["Becky", "ate", "gummy", "bears", "."]
YUMMY = ["Becky", "ate", "yummy", "bears", "."]
CHUMMY = ["Becky", "ate", "chummy", "bears", "."]

DOCS = [
    _doc(0, GUMMY, [_num("citations", 3.0), _tok("doctype", ["article"]), _date("pubdate", "2000-05-25")]),
    _doc(1, GUMMY, [_tok("doctype", ["website"]), _date("pubdate", "2005-05-25")]),
    _doc(2, GUMMY, [_tok("doctype", ["article"]), _date("pubdate", "2010-05-25")]),
    _doc(3, GUMMY, [_tok("doctype", ["article"]), _date("pubdate", "2015-05-25")]),
    _doc(4, GUMMY, [_tok("doctype", ["website"]), _date("pubdate", "2015-05-25")]),
    _doc(5, GUMMY, [_num("citations", 5.0), _date("pubdate", "2020-05-25")]),
    _doc(6, YUMMY, [_nested("author", first=["Agnes"], last=["Moorehead"])]),
    _doc(7, YUMMY, [_num("citations", 3.0), _nested("author", first=["Agnes"], last=["Mertz"])]),
    _doc(8, YUMMY, [_num("citations", 3.0), _nested("author", first=["Jose", "Manuel"], last=["Mertz"])]),
    _doc(9, YUMMY, [_num("citations", 3.0), _nested("author", first=["Sinbad"], last=["Valenzuela", "Escárcega"])]),
    _doc(10, CHUMMY, [_num("citations", 3.0), _tok("keywords", ["food", "silly", "outrageous"]), _date("pubdate", "2000-05-25")]),
    _doc(11, CHUMMY, [_num("citations", 3.0), _tok("keywords", ["food", "games"]), _date("pubdate", "2000-05-25")]),
    _doc(12, CHUMMY, [_num("citations", 3.0), _tok("keywords", ["unknown-words", "silly"]), _date("pubdate", "2000-05-25")]),
]


@pytest.fixture(scope="module")
def sents(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("metafilter") / "docs.jsonl"
    with open(p, "w") as f:
        for d in DOCS:
            f.write(json.dumps(d, ensure_ascii=False) + "\n")
    df = read_document_json(spark, str(p))
    df.cache().count()
    return df


def hits(sents, pattern, mfilter=None):
    df = sents
    if mfilter:
        df = df.filter(compile_metadata_query(mfilter, "meta_"))
    grammar = f"rules:\n  - name: q\n    type: basic\n    pattern: |\n      {pattern}\n"
    extractors, _ = RuleReader().compile_rules(grammar)
    m = extract_mentions_df(apply_prefilter(df, extractors), extractors)
    return m.select("doc_id").distinct().count()


def test_no_filter(sents):
    assert hits(sents, "[word=gummy]") == 6


@pytest.mark.parametrize(
    "mfilter,n",
    [
        ("pubdate > date(2006, 01, 01)", 4),
        ("date(2006, 01, 01) > pubdate", 2),
        ("date(2003, 01, 01) < pubdate < date(2006, 01, 01)", 1),
        ("pubdate == date(2015, 05, 25)", 2),
        ("pubdate != date(2015, 05, 25)", 4),
        ("pubdate == date(2015, 'Mar', 25)", 0),
        ("pubdate == date(2015, 'mARcH', 25)", 0),
        ("pubdate == date(2015, 'May', 25)", 2),
        ("pubdate >= date(2015, 'March', 25)", 3),
        ("citations > 3", 1),
        ("citations >= 3", 2),
        ("3 <= citations < 5", 1),
        ("citations == 5", 1),
        ("citations != 5", 5),
        ("doctype == 'article'", 3),
        ("doctype == 'website'", 2),
        ("doctype == 'article' && (date(1999, 01, 01) < pubdate < date(2012, 01, 01))", 2),
        ("doctype == 'article' || doctype == 'website'", 5),
        ("(doctype == 'article' || doctype == 'website') && pubdate < date(2014)", 3),
        ("!(doctype == 'website')", 4),
        ("doctype != 'website'", 4),
        ("pubdate.year > 2010", 3),
        ("pubdate.year == 2020", 1),
        ("2010 < pubdate.year < 2020", 2),
        ("2010 < pubdate.year < 2020 || citations == 3", 3),
    ],
)
def test_gummy_filters(sents, mfilter, n):
    assert hits(sents, "[word=gummy]", mfilter) == n


@pytest.mark.parametrize(
    "mfilter,n",
    [
        ("author{first=='Agnes'}", 2),
        ("author{first=='Agnes' && last=='Moorehead'}", 1),
        ("author{first=='Agnes'} && citations == 3", 1),
        # exact match on text fields: whole token sequence
        ("author{first=='Jose'}", 0),
        ("author{first=='Jose Manuel'}", 1),
        ("author{first=='Jose Manuel Eduardo'}", 0),
        ("author{first != 'Jose Manuel'}", 3),
        # contains: token-boundary phrases
        ("author{first contains 'Jose'}", 1),
        ("author{first contains 'Jose Manuel'}", 1),
        ("author{first contains 'Jose Manuel Eduardo'}", 0),
        ("author{first not contains 'Jose Manuel Eduardo'}", 4),
        ("author{first not contains 'Jose'}", 3),
        ("author{first contains 'Manuel Jose'}", 0),
        ("author{first not contains 'Agnes'}", 2),
        ("author{first not contains 'Manuel'}", 3),
        ("author{first not contains 'Manuel Jose'}", 4),
        ("author{first contains 'jose'}", 1),
        ("author{first contains 'jOsE'}", 1),
        # unicode folding on both sides
        ("author{last contains 'Valenzuela Escárcega'}", 1),
        ("author{last contains 'Valenzuela Escarcega'}", 1),
        # regex tokens
        ("author{first=='/a.*/'}", 2),
        ("author{first=='/A.*/'}", 2),
        ("author{first == 'Jose /Ma.*/'}", 1),
    ],
)
def test_yummy_filters(sents, mfilter, n):
    assert hits(sents, "[word=yummy]", mfilter) == n


@pytest.mark.parametrize(
    "mfilter,n",
    [
        ("keywords contains 'food'", 2),
        ("keywords contains 'food' && keywords contains 'silly'", 1),
        ("keywords contains 'unknown-words' || keywords contains 'silly'", 2),
    ],
)
def test_chummy_filters(sents, mfilter, n):
    assert hits(sents, "[word=chummy]", mfilter) == n
