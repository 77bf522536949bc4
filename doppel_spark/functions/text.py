"""Text-analysis columns for training-data pipelines — pure Catalyst.

Everything here is built-in ``pyspark.sql.functions`` composition (no
Python), deliberately expressible in ANSI SQL so every op has a DuckDB
oracle: token counting, language ID (stopword-hit heuristic), quality
scoring (length / punctuation / stopword / repetition signals).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from doppel_spark.corpus import LANG_STOPWORDS


def tokens(text: Column | str) -> Column:
    """Whitespace tokens; empty text → empty array (not [''])."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long").alias("n_tokens")


#: letters/digits runs count as one token; each other non-space char is
#: its own token — RE2-compatible so the DuckDB oracle can reuse it.
SUBTOKEN_PATTERN = r"[\p{L}\p{N}]+|[^\p{L}\p{N}\s]"


def word_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: word chunks + digit runs + punctuation marks
    each count as a token (regex extraction, JVM-side)."""
    t = F.col(text) if isinstance(text, str) else text
    return (
        F.size(F.regexp_extract_all(t, F.lit(SUBTOKEN_PATTERN), F.lit(0)))
        .cast("long").alias("n_subtokens")
    )


def stopword_hits(text: Column | str, lang: str) -> Column:
    """# tokens that are stopwords of ``lang`` (array intersection size)."""
    toks = tokens(text)
    stops = [F.lit(w) for w in LANG_STOPWORDS[lang]]
    return F.size(F.filter(toks, lambda x: x.isin(*[s for s in stops]))).cast("long")


def lang_id(text: Column | str) -> Column:
    """Predicted language = argmax over per-language stopword hit counts.

    Deterministic tie-break: language order as listed (first max wins),
    'und' when no stopword hits at all.
    """
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    for lang in LANG_STOPWORDS:
        hits = stopword_hits(text, lang)
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang.alias("lang_pred")


def script_profile(text: Column | str) -> list[Column]:
    """Unicode-script letter ratios — the mixed-script cleaning signal.

    Returns ``[n_letters, latin_micros, cyrillic_micros, han_micros]``:
    total letter count (``\\p{L}``) and each script's integer-micros
    share of it (0 when the text has no letters). Mixed-script text is
    a classic spam/keyword-stuffing tell, and a script histogram is the
    zero-model complement to stopword language-ID for scripts the
    stopword lists don't cover.

    Pure Catalyst ``regexp_replace`` counting. The property NAMES
    differ per engine (Java ``\\p{IsLatin}`` here, RE2 ``\\p{Latin}``
    in the DuckDB oracle) but both bind the same Unicode script data
    for the planted checks — the contract query hash-matches values so
    a table divergence would be CAUGHT, not silently blessed.
    """
    t = _col_of(text)

    def n_of(cls: str) -> Column:
        return F.length(t) - F.length(F.regexp_replace(t, cls, ""))

    letters = n_of(r"\p{L}")

    def micros(cls: str, name: str) -> Column:
        return (F.when(letters == 0, F.lit(0))
                .otherwise(F.floor(n_of(cls) * F.lit(1_000_000) / letters))
                .cast("long").alias(name))

    return [
        letters.cast("long").alias("n_letters"),
        micros(r"\p{IsLatin}", "latin_micros"),
        micros(r"\p{IsCyrillic}", "cyrillic_micros"),
        micros(r"\p{IsHan}", "han_micros"),
    ]


def _col_of(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def punct_ratio(text: Column | str) -> Column:
    """Fraction of chars in a fixed punctuation class (0 for empty)."""
    t = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(t, r"[.,!?;:]", "")
    return (
        F.when(F.length(t) == 0, F.lit(0.0))
        .otherwise((F.length(t) - F.length(stripped)).cast("double") / F.length(t))
        .alias("punct_ratio")
    )


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords of ANY known language."""
    toks = tokens(text)
    all_stops = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    hits = F.size(F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in all_stops])))
    return (
        F.when(F.size(toks) == 0, F.lit(0.0))
        .otherwise(hits.cast("double") / F.size(toks))
        .alias("stopword_ratio")
    )


def distinct_token_ratio(text: Column | str) -> Column:
    """Repetition signal: |distinct tokens| / |tokens| (1.0 for empty)."""
    toks = tokens(text)
    return (
        F.when(F.size(toks) == 0, F.lit(1.0))
        .otherwise(F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
        .alias("distinct_token_ratio")
    )


def quality_score(text: Column | str, min_tokens: int = 20,
                  max_tokens: int = 100_000) -> Column:
    """Heuristic [0,1] quality score for filter thresholds.

    0.4·length-window + 0.3·stopword presence + 0.2·non-repetition +
    0.1·low punctuation. Deliberately simple, monotone, and
    SQL-expressible — the point is the *pipeline op* (scorable,
    thresholdable, pushdown-able), not linguistic sophistication.
    """
    n = F.size(tokens(text))
    len_ok = F.when((n >= min_tokens) & (n <= max_tokens), 1.0).otherwise(0.0)
    stop_sig = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    rep_sig = distinct_token_ratio(text)
    punct_sig = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    return (
        F.round(0.4 * len_ok + 0.3 * stop_sig + 0.2 * rep_sig + 0.1 * punct_sig, 6)
        .alias("quality_score")
    )


def quality_score_micros(text: Column | str, min_tokens: int = 20,
                         max_tokens: int = 100_000) -> Column:
    """``floor(quality × 10⁶)`` as a long — float-free form for exact
    cross-engine comparison (float hashing is representation-sensitive;
    identical IEEE expression trees floor to identical integers)."""
    n = F.size(tokens(text))
    len_ok = F.when((n >= min_tokens) & (n <= max_tokens), 1.0).otherwise(0.0)
    stop_sig = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    rep_sig = distinct_token_ratio(text)
    punct_sig = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    raw = 0.4 * len_ok + 0.3 * stop_sig + 0.2 * rep_sig + 0.1 * punct_sig
    return F.floor(raw * 1_000_000).cast("long").alias("quality_micros")
