"""Gopher rule-filter battery and C4-style span dedup.

Both operators' metrics are exact integer ratios rounded to 6 places, so
every assertion here is an equality against a hand-computed value — no
tolerance bands (the repo's oracle convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from paragrapher_spark.functions.text import gopher_rules
from paragrapher_spark.operators.dedup import span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# gopher_rules


def test_gopher_metrics_hand_computed(spark):
    # 6 words; "the" and "of" distinct stop hits; one '#' symbol word;
    # top bigram "the of" occurs once.
    docs = _docs(spark, [(1, "the of the of aa #")])
    r = gopher_rules(docs, min_words=3, min_stop_hits=2).collect()[0]
    assert r.n_words == 6
    # token lengths 3+2+3+2+2+1 = 13
    assert r.mean_word_len == round(13 / 6, 6)
    assert r.symbol_ratio == round(1 / 6, 6)
    # '#' has no alphabetic char -> 5/6 alpha words
    assert r.frac_alpha_words == round(5 / 6, 6)
    assert r.n_stop_hits == 2
    # bigrams: "the of" x2, "of the" x1, "of aa" x1, "aa #" x1
    # top = "the of" (count 2, 6 chars incl. space), doc length 18 chars
    assert r.frac_top_bigram == round(2 * 6 / 18, 6)


def test_gopher_pass_conjunction(spark):
    # 60 words, mean word length (3+3+4+4+4)/5 = 3.6, all stopwords
    good = " ".join(["the", "and", "that", "have", "with"] * 12)
    docs = _docs(
        spark,
        [
            (1, good),
            (2, "too few words"),  # fails min_words
            (3, " ".join(["zz"] * 60)),  # fails stopword rule
        ],
    )
    got = {
        r.id: r.gopher_pass
        for r in gopher_rules(docs, max_top_bigram_frac=1.0).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_gopher_empty_doc(spark):
    r = gopher_rules(_docs(spark, [(1, "")])).collect()[0]
    assert (r.n_words, r.mean_word_len, r.frac_top_bigram) == (0, 0.0, 0.0)
    assert not r.gopher_pass


def test_gopher_top_bigram_tiebreak_lexicographic(spark):
    # "b c" and "a b" both occur once; lexicographic min "a b" wins,
    # so the fraction uses length("a b") = 3 over 5 chars.
    r = gopher_rules(_docs(spark, [(1, "a b c")])).collect()[0]
    assert r.frac_top_bigram == round(3 / 5, 6)


# ---------------------------------------------------------------------------
# span_dedup


def test_span_dedup_removes_later_occurrences(spark):
    # W=2 spans: doc1 -> ["a b", "c d"], doc2 -> ["a b", "x y"]:
    # "a b" kept only in doc1 (first by (doc_id, idx)).
    docs = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    got = {
        r.id: (r.clean_text, r.n_spans, r.n_removed)
        for r in span_dedup(docs, span_tokens=2).collect()
    }
    assert got == {1: ("a b c d", 2, 0), 2: ("x y", 2, 1)}


def test_span_dedup_within_doc_repetition(spark):
    # the SECOND "a b" span inside the same doc is also a later occurrence
    docs = _docs(spark, [(1, "a b a b c")])
    r = span_dedup(docs, span_tokens=2).collect()[0]
    assert (r.clean_text, r.n_spans, r.n_removed) == ("a b c", 3, 1)


def test_span_dedup_all_spans_removed(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b")])
    got = {r.id: (r.clean_text, r.n_removed) for r in
           span_dedup(docs, span_tokens=2).collect()}
    assert got == {1: ("a b", 0), 2: ("", 1)}


def test_span_dedup_keeps_order_and_ragged_tail(spark):
    # 5 tokens, W=2 -> spans ["a b","c d","e"]; nothing duplicated
    r = span_dedup(_docs(spark, [(1, "a b c d e")]), span_tokens=2).collect()[0]
    assert (r.clean_text, r.n_spans, r.n_removed) == ("a b c d e", 3, 0)


def test_span_dedup_empty_doc_single_empty_span(spark):
    # empty docs produce one '' span each; dedup keeps the first only —
    # pinned so the oracle's greatest(ceil, 1) twin cannot drift
    docs = _docs(spark, [(1, ""), (2, "")])
    got = {r.id: (r.clean_text, r.n_spans, r.n_removed) for r in
           span_dedup(docs, span_tokens=4).collect()}
    assert got == {1: ("", 1, 0), 2: ("", 1, 1)}


# ---------------------------------------------------------------------------
# bpe_token_count


def test_bpe_token_count_hand_cases(spark):
    from paragrapher_spark.functions.text import bpe_token_count, bpe_tokens

    docs = _docs(
        spark,
        [(1, "don't stop"), (2, "hello,  world!! 42x"), (3, ""), (4, "a#b ... c")],
    )
    rows = {
        r.doc_id: (r.n, r.toks)
        for r in docs.select(
            "doc_id",
            bpe_token_count(F.col("text")).alias("n"),
            bpe_tokens(F.col("text")).alias("toks"),
        ).collect()
    }
    # contraction split, punctuation runs, digit runs, whitespace runs —
    # the GPT-2 pre-tokenizer shapes (lookahead-free dialect)
    assert rows[1] == (3, ["don", "'t", " stop"])
    assert rows[2] == (7, ["hello", ",", "  ", "world", "!!", " 42", "x"])
    assert rows[3] == (0, [])
    assert rows[4] == (5, ["a", "#", "b", " ...", " c"])
