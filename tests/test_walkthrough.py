"""The reference documentation's end-to-end walkthrough (ported from
core/src/test/scala/ai/lum/odinson/documentation/TestDocumentationWalkthrough.scala):
a two-priority grammar where a typed event argument (`pet: Pet`) must
resolve against priority-1 mentions through the state."""

import json
import pathlib

import pytest

from odinson_spark.lang.rules import RuleReader
from odinson_spark.match.extractor import BatchExtractor
from odinson_spark.testing import batch_from_doc_json

WALKTHROUGH_DOC = json.loads(r"""
{"id":"walkthrough","metadata":[],"sentences":[
 {"numTokens":4,"fields":[
  {"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["Sally","loves","dogs","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["Sally","loves","dogs","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NNP","VBZ","NNS","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["Sally","love","dog","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["PERSON","O","O","O"]},
  {"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","B-VP","B-NP","O"]},
  {"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[1,0,"nsubj"],[1,2,"dobj"],[1,3,"punct"]],"roots":[1]}]},
 {"numTokens":9,"fields":[
  {"$type":"ai.lum.odinson.TokensField","name":"raw","tokens":["Yesterday",",","Sally","adopted","a","cat","named","Ajax","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"word","tokens":["Yesterday",",","Sally","adopted","a","cat","named","Ajax","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"tag","tokens":["NN",",","NNP","VBD","DT","NN","VBN","NNP","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"lemma","tokens":["yesterday",",","Sally","adopt","a","cat","name","Ajax","."]},
  {"$type":"ai.lum.odinson.TokensField","name":"entity","tokens":["DATE","O","PERSON","O","O","O","O","ORGANIZATION","O"]},
  {"$type":"ai.lum.odinson.TokensField","name":"chunk","tokens":["B-NP","O","B-NP","B-VP","B-NP","I-NP","B-VP","B-NP","O"]},
  {"$type":"ai.lum.odinson.GraphField","name":"dependencies","edges":[[3,2,"nsubj"],[3,5,"dobj"],[3,8,"punct"],[3,0,"nmod:tmod"],[3,1,"punct"],[5,4,"det"],[5,6,"acl"],[6,7,"xcomp"]],"roots":[3]}]}
]}
""")

RULES = """
rules:
  - name: pets_type
    type: basic
    label: Pet
    priority: 1
    pattern: |
       [lemma=/cat|dog|bunny|fish/]

  - name: pets_adoption
    type: event
    label: Adoption
    priority: 2
    pattern: |
      trigger = [lemma=adopt]
      adopter = >nsubj []
      pet: Pet = >dobj []
"""


def test_walkthrough(example_docs):
    extractors, _ = RuleReader().compile_rules(RULES)
    batch = batch_from_doc_json(WALKTHROUGH_DOC)
    ex = BatchExtractor(extractors)
    mentions = ex.extract_mentions(batch, ["d", "d"], [0, 1])
    toks = batch.raw_layers["raw"]

    def surface(m):
        return " ".join(toks[m.sent_id][m.start : m.end])

    texts = [surface(m) for m in mentions]
    assert texts.count("dogs") == 1   # Pet in sentence 0
    assert texts.count("cat") >= 1    # Pet in sentence 1 (+ promoted arg view)
    adoptions = [m for m in mentions if m.label == "Adoption"]
    assert len(adoptions) == 1
    ev = adoptions[0]
    assert surface(ev) == "adopted"
    assert [surface(a) for a in ev.arguments["adopter"]] == ["Sally"]
    assert [surface(a) for a in ev.arguments["pet"]] == ["cat"]
