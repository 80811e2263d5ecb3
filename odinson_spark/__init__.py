"""odinson_spark — a from-scratch PySpark-native rule-extraction / KG-construction engine.

Re-expresses the query and data-processing capabilities of the reference
engine (lum-ai/odinson, a Scala/Lucene information-extraction system) as an
idiomatic Spark pipeline:

* rule parsing/compilation happens on the driver (pure Python, ``lang/``),
* compiled rules are broadcast and executed per sentence inside Arrow-batched
  ``mapInPandas`` stages (``match/``, ``pipeline/``),
* everything relational (metadata filters, dedup, linking, canonicalization,
  materialization) is plain DataFrame code that Catalyst can optimize.

Nothing here links against or translates the reference implementation; the
reference is cited in docstrings (``path:line`` into /root/reference) purely
to document behavioral parity.
"""

__version__ = "0.1.0"
