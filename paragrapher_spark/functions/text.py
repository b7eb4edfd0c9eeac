"""Text-analysis functions for training-data pipelines.

All JVM-side column expressions except the rolling-hash fingerprint
(pandas UDF — per-character polynomial hashing has no efficient Column
form). Each returns a Column (composable) or a DataFrame query.

- token/char statistics and a composite quality score (length, punctuation
  density, stopword ratio, repetition) — the usual pre-training filters;
- n-gram/stopword language ID over a small built-in lexicon (en/de/es/fr +
  han-script detection for zh);
- rolling-hash document fingerprint (Rabin-Karp style, mod 2^61-1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny, deterministic stopword lexicons — enough signal for a heuristic
# language classifier on latin-script text
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed — the tokenization every stat
    here shares (and the one mirrored in DuckDB oracles)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    t = tokens(text)
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast(
            "double"
        )
        / F.size(t).cast("double"),
    ).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are .,;:!? — computed by length
    difference after removal (no regex escaping pitfalls across engines)."""
    stripped = F.translate(text, ".,;:!?", "")
    return F.when(
        F.length(text) > 0,
        (F.length(text) - F.length(stripped)).cast("double")
        / F.length(text).cast("double"),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    t = tokens(F.lower(text))
    hits = F.size(
        F.filter(t, lambda x: x.isin(*[F.lit(w) for w in STOPWORDS[lang]]))
    )
    return F.when(
        F.size(t) > 0, hits.cast("double") / F.size(t).cast("double")
    ).otherwise(F.lit(0.0))


def repetition_ratio(text: Column) -> Column:
    """1 - distinct_tokens/tokens: high values flag boilerplate/spam."""
    t = tokens(text)
    return F.when(
        F.size(t) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(t)).cast("double") / F.size(t).cast("double"),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length documents and
    low punctuation/repetition. Deterministic arithmetic only, so the same
    expression is reproducible in ANSI SQL for the oracle."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    return F.round(
        len_score * (F.lit(1.0) - punct_ratio(text)) * (F.lit(1.0) - repetition_ratio(text)),
        6,
    )


def detect_language(text: Column) -> Column:
    """Heuristic language ID: han-character density → zh; otherwise the
    latin-script language with the highest stopword hit count (ties:
    lexicographically smallest code; 'und' when nothing hits)."""
    han = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    t = tokens(F.lower(text))

    def hit_count(ws: list[str]) -> Column:
        return F.size(F.filter(t, lambda x: x.isin(*[F.lit(w) for w in ws])))

    scores = [(lang, hit_count(ws)) for lang, ws in sorted(STOPWORDS.items())]
    best = F.lit("und")
    best_score = F.lit(0)
    # fold left in reverse-lexicographic order => min-code tie-break
    for lang, score in reversed(scores):
        cond = score >= F.greatest(best_score, F.lit(1))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return F.when(han * 2 >= F.length(text), F.lit("zh")).otherwise(best)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc with the full stat set — the pipeline's filter input."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).cast("long").alias("n_tokens"),
        char_count(t).cast("long").alias("n_chars"),
        F.round(avg_token_len(t), 6).alias("avg_token_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(repetition_ratio(t), 6).alias("repetition_ratio"),
        quality_score(t).alias("quality_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint: long) Rabin-Karp rolling hash over bytes,
    base 257 mod 2^61-1 — an order-SENSITIVE content id (the reference's
    order-sensitive converter checksum, `test/test3_converter_WG400.c:303`).
    Arrow-batched pandas UDF; numpy Horner loop per batch."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mod = (1 << 61) - 1
        out_rows: list[int]
        for pdf in it:
            out_rows = []
            for text in pdf[text_col].astype(str):
                h = 0
                for byte in text.encode("utf-8"):
                    h = (h * 257 + byte) % mod
                out_rows.append(h)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "fingerprint": pd.Series(out_rows, dtype="int64")}
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"{id_col} long, fingerprint long"
    )
