"""Text normalization — the cleanup pass upstream of every dedup tier.

Real crawls mix byte-identical *meanings* with byte-different
*encodings*: ``é`` arrives both composed (U+00E9) and decomposed
(``e`` + U+0301), and stray C0/C1 control bytes survive extraction.
Left unnormalized they silently split exact-dup groups (the digest
tiers hash bytes) and shift shingle sets. Every production pipeline
normalizes first; these are the two standard steps:

* :func:`strip_control_chars` — remove C0 controls (except ``\\t \\n
  \\r``, which are document structure) and DEL. Pure Catalyst
  ``regexp_replace`` with the class written in the RE2-compatible
  subset, so the DuckDB oracle reuses it literally (query
  ``control_stripped_planted``).
* :func:`unicode_normalize` — NFC (default) / NFD / NFKC / NFKD via
  ``unicodedata``. There is no Catalyst builtin for Unicode
  normalization, so this is a declared vectorized-Python tier op
  (Arrow-batched ``pandas_udf`` — the allowed transport,
  plans/inspect.py bans only row-at-a-time BatchEvalPython) with a
  C-level ``unicodedata.is_normalized`` fast path: on real web text
  the overwhelming majority of rows are already NFC and never pay for
  a rewrite. DuckDB ships ``nfc_normalize``, so the NFC form is
  value-checked cross-engine (query ``nfc_normalized_planted``, which
  PLANTS decomposed sequences — the ASCII testdata alone would make
  the check vacuous).

Ordering note: normalize BEFORE the digest/shingle tiers and before
the north-rule byte-identity gate is *recorded* — the invariant is
"the text you dedup is the text extraction yields"; if the pipeline
normalizes, the stored text must be the normalized form, exactly like
any other extraction step (functions/extract.py).

Reference tie: the reference hashes file bytes verbatim
(/root/reference/internal/hasher/hasher.go:22-42) because a
filesystem has no encoding ambiguity; a web corpus does, and this is
the stage that removes it before the same digest discipline applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: C0 controls except tab/newline/carriage-return, plus DEL — written
#: in the RE2-compatible subset so the DuckDB oracle reuses it verbatim
CONTROL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

#: normalization forms unicodedata accepts
_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_control_chars(text: Column | str) -> Column:
    """``text`` minus C0 control chars (tab/newline/CR kept) and DEL —
    pure Catalyst, zero Python, scan-pushdown-composable."""
    return F.regexp_replace(_col(text), CONTROL_CLASS, "")


def unicode_normalize(text: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalized ``text`` (NULL passes through).

    Arrow-batched ``pandas_udf``; per batch the C-level
    ``unicodedata.is_normalized`` check short-circuits the (dominant)
    already-normal rows, so only genuinely denormalized values pay for
    ``unicodedata.normalize``.
    """
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    import pandas as pd  # noqa: F401  (udf transport)
    import unicodedata

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's inference can't resolve the local import;
    # hint-less defaults to the SCALAR eval type (same as bloom.py)
    @F.pandas_udf(T.StringType())
    def norm(s):
        def one(v):
            if v is None or unicodedata.is_normalized(form, v):
                return v
            return unicodedata.normalize(form, v)

        return s.map(one)

    return norm(_col(text))
