"""Unicode normalization — MUST be identical on the index side (tokenizer)
and the query side (compiler), or exact-term matching silently breaks.

Parity target: the reference applies ``normalizeUnicode`` (NFKC) to every
indexed/queried term and ``normalizeUnicodeAggressively`` (NFKC + casefold +
diacritic stripping) to the synthetic default ``norm`` field
(/root/reference/core/src/main/scala/ai/lum/odinson/lucene/index/OdinsonIndexWriter.scala:174-182,
compiler/QueryCompiler.scala:414-421).
"""

from __future__ import annotations

import unicodedata

WHITESPACE_PLACEHOLDER = "�"  # reference replaces whitespace-only tokens


def normalize_unicode(s: str) -> str:
    """NFKC normalization (reference: ai.lum.common normalizeUnicode)."""
    return unicodedata.normalize("NFKC", s)


def normalize_unicode_aggressively(s: str) -> str:
    """NFKC + casefold + diacritics stripped."""
    s = unicodedata.normalize("NFKC", s).casefold()
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return unicodedata.normalize("NFKC", s)


def sanitize_token(tok: str) -> str:
    """Whitespace-only tokens are replaced with a placeholder so positional
    alignment survives (reference OdinsonIndexWriter.scala:312-325)."""
    if tok and tok.strip() == "":
        return WHITESPACE_PLACEHOLDER
    return tok
