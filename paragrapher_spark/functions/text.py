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

from collections.abc import Iterator, Sequence

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


_MERSENNE61 = (1 << 61) - 1
_MASK53 = (1 << 53) - 1


_FP_CHUNK = 7  # bytes per Horner chunk; 257^7 < 2^57 fits uint64 exactly
_FP_R = pow(257, _FP_CHUNK, _MERSENNE61)  # chunk radix mod p
_FP_INV257 = pow(257, _MERSENNE61 - 2, _MERSENNE61)  # p prime => inverse


def _fingerprint_batch(byte_rows: list[bytes]) -> "object":
    """Vectorized Rabin-Karp Horner fold, base 257 mod p = 2^61-1, over a
    batch of byte strings: identical values to the scalar
    ``h = (h*257 + byte) % p`` loop, with the per-byte work batched two
    ways:

    - bytes are folded 7 at a time: each 7-byte chunk's value
      ``c = ((b0*257 + b1)*257 + ...)`` (< 257^7 < 2^57) is computed for
      ALL rows and ALL chunk positions in one strided numpy pass; the
      Horner recurrence then dissolves entirely —
      ``h = sum_j c_j * (257^7)^(K-1-j) (mod p)`` is ONE batched modular
      product of the whole rows x K chunk matrix against a precomputed
      power vector (a specialized mulmod: because c < 2^57 its high
      31-bit half is < 2^26, so no intermediate Mersenne reduction is
      needed until the final fold), followed by a log2(K)-step pairwise
      modular sum. No per-column sequential loop remains;
    - every row in a group is zero-padded to the group's max length and
      the pad is cancelled afterwards by multiplying with the
      precomputed modular inverse 257^-pad (p is prime), so the column
      loop needs no per-row masking.

    Modular products never need 128-bit ints: operands split into 31-bit
    halves and 2^61 ≡ 1 (Mersenne) folds each partial product back below
    2^62 (``_mulmod61``).

    Rows are processed in length-sorted groups capped at ~2^24 matrix
    cells so one pathological long document cannot blow the padded-batch
    memory (or padding waste) to |batch| x max_len.
    """
    import numpy as np

    p = np.uint64(_MERSENNE61)
    u31 = np.uint64(31)
    u30 = np.uint64(30)
    u61 = np.uint64(61)
    m30 = np.uint64((1 << 30) - 1)
    m31 = np.uint64((1 << 31) - 1)

    def red(x):  # partial Mersenne reduce: x < 2^63 -> < 2^62
        return (x & p) + (x >> u61)

    def canon(x):  # full reduce to [0, p)
        x = red(red(x))
        return np.where(x == p, np.uint64(0), x)

    def mulmod(a, b):
        """(a*b) mod p for a, b < 2^61, elementwise, uint64-only."""
        a1, a0 = a >> u31, a & m31
        b1, b0 = b >> u31, b & m31
        hi = red(a1 * b1 * np.uint64(2))  # *2^62 == *2 (mod p)
        cross = red(a1 * b0 + a0 * b1)  # < 2^62 -> < 2^61+
        c1, c0 = cross >> u30, cross & m30
        mid = red(c1 + (c0 << u31))  # cross * 2^31 (mod p)
        return red(hi + mid + red(a0 * b0))

    n = len(byte_rows)
    out = np.zeros(n, dtype=np.uint64)
    order = sorted(range(n), key=lambda r: len(byte_rows[r]))
    cells_cap = 1 << 24

    def run_group(rows: list[int]) -> None:
        if not rows:
            return
        lens = np.array([len(byte_rows[r]) for r in rows], dtype=np.int64)
        lmax = int(lens.max())
        if lmax == 0:
            return
        w = _FP_CHUNK
        lpad = -(-lmax // w) * w
        nr = len(rows)
        # one concatenated buffer, then per-row slice-assign (measured
        # faster than both per-row frombuffer and a fancy-index scatter)
        joined = np.frombuffer(
            b"".join(byte_rows[r] for r in rows), dtype=np.uint8
        )
        mat = np.zeros((nr, lpad), dtype=np.uint8)
        off = 0
        for k, ln in enumerate(lens.tolist()):
            mat[k, :ln] = joined[off : off + ln]
            off += ln
        # chunk values for all rows x chunk positions: strided slices
        # (no rows x lpad uint64 tensor is ever materialized), in-place
        c = mat[:, 0::w].astype(np.uint64)
        for j in range(1, w):
            c *= np.uint64(257)
            c += mat[:, j::w]  # < 257^7 < 2^57
        # h = sum_j c[:, j] * r7^(K-1-j)  (mod p): one batched modular
        # product against the power vector. Specialized mulmod — a = c
        # < 2^57 so a1 = a>>31 < 2^26 and every partial stays < 2^63
        # with NO intermediate reduction:
        #   a*b = a1*b1*2^62 + (a1*b0 + a0*b1)*2^31 + a0*b0
        #   2^62 ≡ 2 (mod p);  x*2^31 ≡ (x & m30)<<31 | x>>30 terms
        K = lpad // w
        pw = np.empty(K, dtype=np.uint64)
        acc = 1
        for j in range(K - 1, -1, -1):
            pw[j] = acc
            acc = (acc * _FP_R) % _MERSENNE61
        b1, b0 = pw >> u31, pw & m31
        b1_2 = b1 * np.uint64(2)
        # in-place pass sequence, three allocations total; every partial
        # fits: hi < 2^57, mid < 2^61 + 2^32, lo < 2^62, and the sum
        # hi + mid + lo < 2^63 needs only ONE Mersenne reduction
        a1 = c >> u31  # < 2^26  (c < 2^57)
        c &= m31  # c is now a0 < 2^31
        cross = a1 * b0[None, :]  # < 2^57
        a1 *= b1_2[None, :]  # a1 is now hi < 2^57
        t2 = c * b1[None, :]  # < 2^61
        cross += t2  # < 2^62
        c *= b0[None, :]  # c is now lo = a0*b0 < 2^62
        np.bitwise_and(cross, m30, out=t2)
        t2 <<= u31
        cross >>= u30
        t2 += cross  # mid < 2^61 + 2^32
        c += a1
        c += t2  # hi + mid + lo < 2^63
        np.bitwise_and(c, p, out=t2)
        c >>= u61
        c += t2
        terms = c  # < 2^61 + 4
        # pairwise modular sum: log2(K) wide passes, operands < 2^62
        while terms.shape[1] > 1:
            k2 = terms.shape[1] // 2
            t = red(terms[:, 0 : 2 * k2 : 2] + terms[:, 1 : 2 * k2 : 2])
            if terms.shape[1] & 1:
                t = np.concatenate([t, terms[:, -1:]], axis=1)
            terms = t
        h = canon(terms[:, 0])
        # cancel the zero padding: h *= 257^-(lpad - len)  (mod p)
        pads = lpad - lens
        inv = np.array(
            [pow(_FP_INV257, int(k), _MERSENNE61) for k in np.unique(pads)],
            dtype=np.uint64,
        )[np.searchsorted(np.unique(pads), pads)]
        out[rows] = canon(mulmod(h, inv))

    group: list[int] = []
    for r in order:
        if group and (len(group) + 1) * len(byte_rows[r]) > cells_cap:
            run_group(group)
            group = []
        group.append(r)
    run_group(group)
    return out.astype(np.int64)


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint: long) Rabin-Karp rolling hash over utf-8 bytes,
    base 257 mod 2^61-1 — an order-SENSITIVE content id (the reference's
    order-sensitive converter checksum, `test/test3_converter_WG400.c:303`).
    Arrow-batched pandas UDF; the per-byte Horner step is vectorized
    across the batch (``_fingerprint_batch``) — no Python-int inner loop
    in the hot path."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [t.encode("utf-8") for t in pdf[text_col].astype(str)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fingerprint": pd.Series(_fingerprint_batch(rows), dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"{id_col} long, fingerprint long"
    )


def top_terms(
    docs: DataFrame,
    k: int = 5,
    min_df: int = 1,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, term, tf, df, rank): the ``k`` most distinctive whitespace
    terms per document — integer-exact keyword extraction.

    Ranking is (tf DESC, df ASC, term ASC): frequent in THIS doc, rare in
    the corpus, deterministic string tie-break — the log-free TF-IDF
    ordering (for fixed tf, tf*idf(df) is monotone decreasing in df, so
    ranking by (tf, -df) agrees with per-tf TF-IDF order while staying in
    exact integers — no libm ln() to diverge between engines). Terms with
    df > ``max_df`` are dropped as corpus boilerplate (the stop-gram cap,
    same guard as ngram_jaccard's max_df) and df < ``min_df`` as noise.

    Scale shape (100 TB): two hash aggregations (tf, then df — both
    map-side combinable) + one broadcast-friendly equi-join on term + the
    bounded top-k: row_number over (id) then rank <= k, which Spark plans
    as WindowGroupLimit BELOW and above the shuffle — each task buffers at
    most k rows per doc (the knn_bruteforce discipline). No UDF, no
    driver-side data.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if max_df is not None:
        dft = dft.where(F.col("df") <= max_df)
    if min_df > 1:
        dft = dft.where(F.col("df") >= min_df)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("id")
        .orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    )
    return (
        tf.join(dft, on="term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            "df",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score_fp, n_hit): the ``k`` best documents for the query
    ``terms`` under BM25-shaped scoring (Robertson & Spärck Jones
    probabilistic ranking; k1 = 6/5, b = 3/4) kept in EXACT integer
    fixed point so the ranking sits under the exact-hash gate.

    Per (doc, query term): the BM25 saturation part
    ``tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))`` multiplied through by
    20*avgdl becomes the all-integer ratio
    ``tf*44*A / (20*A*tf + 6*A + 18*dl)`` (A = integer avgdl = total
    tokens div N). The term weight is the log-free RSJ odds ratio
    ``(N - df + 0.5)/(df + 0.5) = (2N-2df+1)/(2df+1)`` — textbook BM25
    logs it; dropping the ln keeps every step an exact integer (the
    top_terms discipline: no libm between engines) at the cost of
    weighting rare terms more aggressively than the logged form; for
    single-term queries the ranking is identical. The per-term score is
    ONE integer division at ``scale`` fixed point; the doc score is the
    exact long sum over query terms; ties break on doc id.

    Scale shape (100 TB): one tokenize pass; dl and tf are map-side
    combinable aggs (tf pre-filtered to the query terms — the filter
    pushes below the shuffle, so the agg carries |terms| x #docs rows at
    most); df and the corpus totals are tiny one-row/`|terms|`-row
    broadcasts; the final top-k is TakeOrderedAndProject (bounded per
    task). Overflow headroom: scale * 2N * tf * 44 * A must stay under
    2^63 — at scale 1e6 that holds to ~1e5 docs x 1e4-token docs; shrink
    ``scale`` for bigger corpora (documented, loud long arithmetic — an
    overflow raises under ANSI mode rather than wrapping).
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).select("n_docs", F.expr("total_dl div n_docs").alias("avgdl"))
    tf = (
        toks.where(F.col("term").isin(list(terms)))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(dft), on="term")
        .join(dl, on="id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "id",
            F.expr(
                f"(CAST({int(scale)} AS BIGINT) * (2*n_docs - 2*df + 1) * tf * 44 * avgdl)"
                f" div ((2*df + 1) * (20*avgdl*tf + 6*avgdl + 18*dl))"
            ).alias("term_fp"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum("term_fp").cast("long").alias("score_fp"),
            F.count(F.lit(1)).cast("long").alias("n_hit"),
        )
        .orderBy(F.desc("score_fp"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score_fp", "n_hit")
    )


def cooccurrence_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Skip-gram co-occurrence counts over the corpus — the word2vec /
    GloVe / PPMI preprocessing stage (Mikolov et al. 2013; Pennington et
    al. 2014): every ordered token pair (a, b) where ``b`` occurs within
    ``window`` positions AFTER ``a`` in the same document, with its exact
    global count. Pairs below ``min_count`` are dropped (the standard
    vocabulary floor). Counts are exact longs; no floats anywhere, so the
    result is engine-reproducible bit-for-bit.

    Scale shape (100 TB): positions come from one ``posexplode`` (map
    stage); the window is realized as an EQUI-join — each token row is
    fanned out to ``window`` (doc, pos+o) probe keys against the token
    table itself, so Spark plans a plain shuffled hash/merge join on the
    uniform composite key (doc_id, pos), never a range join or a per-doc
    cartesian. Shuffle volume is window * |tokens| rows, linear in corpus
    size; the final count agg is map-side combinable. No UDF, no
    collect().
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = docs.select(
        F.col(id_col).alias("d"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    offs = docs.sparkSession.range(1, window + 1).select(
        F.col("id").cast("int").alias("off")
    )
    left = toks.crossJoin(F.broadcast(offs)).select(
        "d", (F.col("pos") + F.col("off")).alias("pos"), F.col("tok").alias("a")
    )
    pairs = left.join(
        toks.select("d", "pos", F.col("tok").alias("b")), on=["d", "pos"]
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= min_count)
    )


# PII rules: (name, RE2-and-Java-compatible pattern, replacement tag).
# Patterns avoid lookarounds and stay in the regex dialect intersection so
# the Spark scrub and the DuckDB oracle replay byte-identically.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9]+@[a-z0-9.]+\.[a-z]+", "<EMAIL>"),
    ("number", r"\b[0-9]{6,}\b", "<NUM>"),
]


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing (the redaction pass of CCNet/Dolma-style pipelines):
    count and replace email-like and long-numeric-id spans. Returns
    (id_col, n_email, n_number, scrubbed). Rules apply in PII_RULES order
    (emails first, so an address's digits are gone before the numeric
    rule runs); counts are measured on the ORIGINAL text. Pure JVM column
    expressions — a map-only stage, no shuffle, no Python in the path."""
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    scrubbed = text
    for _, pat, repl in PII_RULES:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def lm_bigram_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10**9,
) -> DataFrame:
    """Bigram language-model quality score per document, in fixed point —
    the CCNet/Gopher-style "LM fluency" filter signal (CCNet buckets docs
    by LM score before training; this is the same shape with the corpus
    itself as the LM, a perplexity proxy with NO float in the pipeline).

    Model: corpus-wide MLE P(w2|w1) = c(w1 w2) / c(w1 ·) where c(w1 ·)
    is the count of bigrams starting with w1. Per doc the score is the
    mean of its bigrams' probabilities, carried as integers:
    p_fp = (c12 * scale) DIV c1 per bigram (exact), summed exactly;
    ``lm_score`` = lm_fp_sum / (n_bigrams * scale) is ONE IEEE division
    of two exact longs, so a DuckDB twin replays every row. Repeated
    n-grams count with multiplicity (it is a language model, not a set).

    Docs under 2 tokens have n_bigrams = 0 and a NULL score (they carry
    no bigram evidence — callers route them to a length filter instead).

    Overflow is checked exactly, not estimated: max(c12) * scale must
    stay under 2^62 or this raises loudly (at web scale drop ``scale``
    to 10**6 — the score keeps 6 digits).

    Scale shape: tokenize + bigram expansion in whole-stage codegen
    (transform over the token array, one explode); two
    map-side-combinable count aggs; two equi-joins of doc bigrams
    against the (much smaller) count tables — broadcastable when the
    vocab fits; one final per-doc agg. No per-row Python anywhere.
    """
    toks = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    bg = docs.select(
        F.col(id_col).alias("id"), F.explode(bigrams).alias("b")
    ).select("id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    max_c12 = c12.agg(F.max("c12")).collect()[0][0] or 0
    if max_c12 * scale >= 2**62:
        raise ValueError(
            f"lm_bigram_scores fixed point would overflow: max bigram count "
            f"{max_c12} * scale {scale} >= 2^62 — lower scale="
        )
    scored = (
        bg.join(c12, on=["w1", "w2"])
        .join(c1, on="w1")
        .withColumn("p_fp", F.expr(f"(c12 * CAST({scale} AS BIGINT)) DIV c1"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("p_fp").cast("long").alias("lm_fp_sum"),
        )
    )
    all_docs = docs.select(F.col(id_col).alias("id"))
    return all_docs.join(scored, on="id", how="left").select(
        "id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("lm_fp_sum"), F.lit(0)).cast("long").alias("lm_fp_sum"),
        (
            F.col("lm_fp_sum").cast("double")
            / (F.col("n_bigrams") * F.lit(scale)).cast("double")
        ).alias("lm_score"),
    )


# Gopher rule-filter defaults (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1) — the
# published rule battery most curation pipelines (MassiveText, Dolma,
# RefinedWeb) start from. Thresholds are parameters; these are the paper's.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_top_bigram_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 App. A):
    per-doc metrics for each published rule plus the conjunctive verdict.

    Rules (names follow the paper):
    - word count in [min_words, max_words];
    - mean word length in [min_mean_word_len, max_mean_word_len];
    - symbol-to-word ratio ('#' chars + '...' occurrences, per word)
      <= max_symbol_ratio;
    - fraction of words containing an alphabetic character >= min_alpha_frac;
    - at least min_stop_hits DISTINCT Gopher stopwords present;
    - fraction of characters inside the most frequent word 2-gram
      (count * gram length / doc length, ties -> lexicographically
      smallest gram) <= max_top_bigram_frac.

    Scale shape: every scalar rule is a single whole-stage-codegen
    projection (zero shuffles). Only the top-bigram rule is relational —
    one explode + one map-side-combinable (id, gram) count + one
    per-doc-partitioned window (rank 1) + one left join back on id; the
    explode volume is exactly the token volume, never pairwise. All
    ratios round(6) on exact integer ratios so a DuckDB twin gates every
    row (same convention as dup_gram_stats).
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    n_hash = F.length(t) - F.length(F.translate(t, "#", ""))
    n_ellipsis = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(tokens(F.lower(t))),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    sum_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    scalars = docs.select(
        F.col(id_col).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        n.cast("long").alias("n_words"),
        F.when(n > 0, F.round(sum_len / n, 6)).otherwise(F.lit(0.0)).alias(
            "mean_word_len"
        ),
        F.when(n > 0, F.round((n_hash + n_ellipsis) / n, 6))
        .otherwise(F.lit(0.0))
        .alias("symbol_ratio"),
        F.when(n > 0, F.round(n_alpha / n, 6)).otherwise(F.lit(0.0)).alias(
            "frac_alpha_words"
        ),
        n_stop.cast("long").alias("n_stop_hits"),
    )

    # top word-2-gram: relational path (explode -> count -> rank-1 window)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(F.col(id_col).alias("id"), F.explode(bigrams).alias("gram"))
    cnt = bg.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c"))
    # rank-1 as min(struct(-count, gram)): lexicographic struct order gives
    # max count with min-gram tie-break, as a partially-aggregable agg —
    # map-side combine, no per-doc WindowExec sort
    top = cnt.groupBy("id").agg(
        F.min(
            F.struct((-F.col("c")).alias("negc"), F.col("gram").alias("gram"))
        ).alias("m")
    ).select(
        "id",
        (-F.col("m.negc")).alias("top_c"),
        F.col("m.gram").alias("top_gram"),
    )
    out = scalars.join(top, on="id", how="left").select(
        "id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "frac_alpha_words",
        "n_stop_hits",
        F.when(
            F.col("top_c").isNotNull() & (F.col("n_chars") > 0),
            F.round(F.col("top_c") * F.length("top_gram") / F.col("n_chars"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("frac_top_bigram"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("frac_alpha_words") >= min_alpha_frac)
        & (F.col("n_stop_hits") >= min_stop_hits)
        & (F.col("frac_top_bigram") <= max_top_bigram_frac),
    )


# GPT-2-style pre-tokenizer pattern (Radford et al. 2019 — the published
# regex splitting contractions / letter runs / digit runs / punctuation
# runs / whitespace), constrained to the RE2∩Java dialect so Spark and the
# DuckDB oracle replay the SAME token stream byte-for-byte: no lookahead
# ((?!\S) dropped — trailing-space attachment differs from GPT-2 only on
# runs of spaces before a token), ASCII classes instead of \p{L}/\p{N}
# (the unicode classes agree between engines but the fixture corpus is
# ASCII and ASCII keeps the oracle obviously dialect-safe).
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_tokens(text: Column) -> Column:
    """The BPE-ish pre-token stream itself (whole-match extraction)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    """Training-token budget estimate: how many BPE-ish pre-tokens a doc
    contributes (each pre-token maps to >=1 BPE merges, so this is the
    standard cheap lower-bound proxy for tokenizer cost). Pure JVM regex —
    one codegen projection, no shuffle, no Python."""
    return F.size(bpe_tokens(text))


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, df, postings): the materialized inverted index — one row
    per term with its document frequency and the ascending posting list
    (distinct doc ids as a comma-joined string: a string survives every
    engine's value-compare intact, and a downstream join explodes it
    back with split/explode). The batch-built index is what serves
    bm25_topk-style retrieval without rescanning the corpus.

    Scale shape (100 TB): one tokenize pass, one distinct, ONE
    aggregation with sort_array(collect_set(...)) — map-side combinable
    set semantics; per-term state is the posting list itself, which IS
    the output (no blow-up beyond it). Terms below ``min_df`` drop as
    hapax noise. A production posting list would be delta+gamma coded —
    exactly what operators/layout.adjacency_gap_bits prices, because an
    inverted index IS a bipartite adjacency."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).distinct()
    idx = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.array_join(
            F.array_sort(F.collect_set(F.col("id").cast("long"))), ","
        ).alias("postings"),
    )
    if min_df > 1:
        idx = idx.where(F.col("df") >= min_df)
    return idx


def bpe_merge_pairs(
    docs: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """The first BPE TRAINING step (Sennrich, Haddow, Birch, "Neural
    machine translation of rare words with subword units", ACL 2016):
    count adjacent symbol-pair frequencies within pre-tokens across the
    corpus and rank merge candidates. Symbols start as single characters;
    pre-token boundaries come from BPE_TOKEN_PATTERN (single-sourced with
    bpe_token_count, so Spark and the oracle walk the same token stream).

    Returns the top-``top_k`` rows (left, right, n) by the TOTAL order
    (n DESC, left, right) — exact counts, deterministic cutoff set.

    Scale shape (100 TB): tokenize → ONE group to the distinct-token
    level FIRST (the classic BPE-training optimization: the pair scan
    runs over the vocabulary weighted by token frequency, not the raw
    token stream — orders of magnitude fewer rows), then per distinct
    token an in-row position explode + substring (pure JVM), one
    map-side-combinable weighted sum, and a TakeOrderedAndProject top-k.
    Tokens shorter than 2 chars are filtered BEFORE the position explode
    (Spark's sequence(1, 0) would count descending — documented guard).
    """
    toks = docs.select(
        F.explode(bpe_tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pairs = (
        vocab.where(F.length("tok") >= 2)
        .select(
            "tok",
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
        )
        .select(
            F.expr("substring(tok, i, 1)").alias("left"),
            F.expr("substring(tok, i + 1, 1)").alias("right"),
            "cnt",
        )
        .groupBy("left", "right")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    return pairs.orderBy(F.desc("n"), "left", "right").limit(top_k)
