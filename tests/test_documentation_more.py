"""More docs-as-tests parity, ported from the reference's
TestDocumentationTokenConstraints / TestDocumentationQuantifiers /
TestDocumentationBasicQueries."""

import json

import pytest

from odinson_spark.lang.compiler import PatternCompiler
from odinson_spark.match.engine import filter_trigger_overlaps, find_matches
from odinson_spark.match.matches import EventMatch
from odinson_spark.testing import batch_from_doc_json, sentence_batch_from_texts

GEORGE = json.loads(
    """{"id":"dd","metadata":[],"sentences":[{"numTokens":5,"fields":[{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["George","ate","gummy","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["George","ate","gummy","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NNP","VBD","JJ","NNS","."]},{"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["george","eat","gummy","bear","."]},{"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["ORGANIZATION","O","O","O","O"]},{"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","I-NP","I-NP","I-NP","O"]},{"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[1,0,"nsubj"],[1,3,"dobj"],[1,4,"punct"],[3,2,"amod"]],"roots":[1]}]}]}"""
)

GEORGE_AND_DOG = json.loads(
    """{"id":"g2","metadata":[],"sentences":[{"numTokens":5,"fields":[{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["George","and","dog","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["George","and","dog","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NNP","VBD","JJ","NNS","."]},{"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["george","and","dog","bear","."]},{"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["ORGANIZATION","O","O","O","O"]},{"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","I-NP","I-NP","I-NP","O"]},{"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[1,0,"nsubj"],[1,3,"dobj"],[1,4,"punct"],[3,2,"amod"]],"roots":[1]}]}]}"""
)

PHOSPHO = json.loads(
    """{"id":"ph","metadata":[],"sentences":[{"numTokens":5,"fields":[{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["Foo","phosphorilates","bar","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["Foo","phosphorilates","bar","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NNP","VBD","JJ","NNS","."]},{"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["becky","phosphorilates","gummy","bear","."]},{"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["PROTEIN","O","PROTEIN","O","O"]},{"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","B-VP","B-NP","I-NP","O"]},{"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[1,0,"nsubj"],[1,2,"dobj"],[1,4,"punct"],[2,3,"amod"]],"roots":[1]}]}]}"""
)

PHOSPHO2 = json.loads(
    """{"id":"ph2","metadata":[],"sentences":[{"numTokens":5,"fields":[{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["Foo","phosphorylates","bar","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["Foo","phosphorylates","bar","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NNP","VBD","JJ","NNS","."]},{"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["foo","phosphorylates","bar","bear","."]},{"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["PROTEIN","O","PROTEIN","O","O"]},{"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","B-VP","B-NP","I-NP","O"]},{"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[1,0,"nsubj"],[1,2,"dobj"],[1,4,"punct"],[2,3,"amod"]],"roots":[1]}]}]}"""
)


def run_doc(doc, pattern, overlap_filter=True):
    # the reference's raw `ee.query()` path does NOT apply the
    # trigger-overlap filter (that happens in extractMentions); tests ported
    # from query-level expectations pass overlap_filter=False
    program = PatternCompiler().compile(pattern)
    batch = batch_from_doc_json(doc)
    out = []
    for i in range(batch.n_sentences):
        ms = find_matches(program, batch.context(i))
        if overlap_filter:
            ms = filter_trigger_overlaps(ms)
        out.extend(ms)
    return out


def run_text(text, pattern):
    program = PatternCompiler().compile(pattern)
    batch = sentence_batch_from_texts([text])
    return find_matches(program, batch.context(0))


# --- TestDocumentationTokenConstraints ------------------------------------


def test_example():
    assert len(run_text("The dog barks", "dog")) == 1
    assert len(run_text("The dog barks", "cat")) == 0


def test_token_fields():
    assert len(run_doc(GEORGE, "[tag=/N.*/]")) == 2
    assert len(run_doc(GEORGE, "[tag=/V.*/]")) == 1


def test_constraint_operators():
    assert len(run_doc(GEORGE, "[tag=/N.*/ & (entity=ORGANIZATION | tag=NNP)]")) == 1
    assert len(run_doc(GEORGE, "[tag=/N.*/ & (entity=FOO | tag=BAR)]")) == 0


def test_wildcards():
    assert len(run_doc(GEORGE, "[]")) == 5


def test_chunk_quantifier():
    ms = run_doc(GEORGE, "[chunk=B-NP] [chunk=I-NP]*")
    assert len(ms) == 1
    assert (ms[0].start, ms[0].end) == (0, 4)


# --- TestDocumentationQuantifiers -------------------------------------------


def test_outgoing_optional_arg():
    ms = [m for m in run_doc(PHOSPHO2, "trigger = [lemma=bar]\nobject: ^NP = >amod?",
                             overlap_filter=False)
          if isinstance(m, EventMatch)]
    assert len(ms) == 2
    spans = sorted((c.match.start, c.match.end) for m in ms for c in m.captures)
    assert spans == [(2, 3), (3, 4)]
    ms1 = [m for m in run_doc(PHOSPHO2, "trigger = [lemma=bar]\nobject: ^NP = >amod",
                              overlap_filter=False)
           if isinstance(m, EventMatch)]
    assert len(ms1) == 1
    assert sorted((c.match.start, c.match.end) for c in ms1[0].captures) == [(3, 4)]


def test_wildcard_ranged_hops():
    ms = [m for m in run_doc(PHOSPHO2, "trigger = [lemma=phosphorylates]\nobject: ^NP = >>{2,3}")
          if isinstance(m, EventMatch)]
    assert len(ms) == 1
    assert (ms[0].trigger.start, ms[0].trigger.end) == (1, 2)
    assert [(c.match.start, c.match.end) for c in ms[0].captures] == [(3, 4)]


def test_capture_with_traversal():
    ms = run_doc(PHOSPHO2, "(?<foo> [lemma=bar]) >amod []")
    assert len(ms) == 1
    assert (ms[0].start, ms[0].end) == (3, 4)
    caps = ms[0].named_captures()
    assert len(caps) == 1 and caps[0].name == "foo"
    assert (caps[0].match.start, caps[0].match.end) == (2, 3)


# --- TestDocumentationBasicQueries --------------------------------------------


def test_surface_pattern():
    ms = run_doc(GEORGE_AND_DOG, "[tag=/N.*/] and [lemma=dog]")
    assert len(ms) == 1
    assert (ms[0].start, ms[0].end) == (0, 3)


def test_named_capture_basic():
    ms = run_doc(GEORGE_AND_DOG, "(?<animal> [tag=/N.*/]) and [lemma=dog]")
    caps = ms[0].named_captures()
    assert len(caps) == 1 and caps[0].name == "animal"
    assert (caps[0].match.start, caps[0].match.end) == (0, 1)


def test_named_captures_with_syntax():
    ms = run_doc(
        PHOSPHO,
        "(?<controller> [entity=PROTEIN]) <nsubj phosphorilates >dobj (?<theme> [entity=PROTEIN])",
    )
    assert len(ms) == 1
    caps = ms[0].named_captures()
    assert [c.name for c in caps] == ["controller", "theme"]
    assert (caps[0].match.start, caps[0].match.end) == (0, 1)
    assert (caps[1].match.start, caps[1].match.end) == (2, 3)


# --- TestDocumentationStrings ---------------------------------------------------

STRINGS_DOC = json.loads(
    """{"id":"sd","metadata":[],"sentences":[{"numTokens":5,"fields":[{"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["George","and","dog","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["George","and","dog","bears","."]},{"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NNP","VBD","JJ","NNS","."]},{"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["george","and","dog","bear","."]},{"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["foo:bar","O","O","O","O"]},{"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","I-NP","I-NP","I-NP","O"]},{"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[1,0,"nsubj"],[1,3,"dobj"],[1,4,"punct"],[3,2,"nmod_foo"]],"roots":[1]}]}]}"""
)


def test_string_with_dash_no_quotes():
    assert len(run_doc(STRINGS_DOC, "[chunk=B-NP]")) == 1


def test_string_with_colon_no_quotes():
    # extended identifiers allow ':' and '-' (Literals.scala extendedIdentifier)
    assert len(run_doc(STRINGS_DOC, "[entity=foo:bar]")) == 1


def test_quoted_string_token():
    ms = run_text("lala lala 3:10 to Yuma", '"3:10" to Yuma')
    assert len(ms) == 1


def test_regex_edge_label():
    ms = run_doc(STRINGS_DOC, "(?<foo> [word=bears]) >/nmod_.*/ []")
    assert len(ms) == 1
    assert (ms[0].start, ms[0].end) == (2, 3)
    caps = ms[0].named_captures()
    assert caps[0].name == "foo"
    assert (caps[0].match.start, caps[0].match.end) == (3, 4)
