"""Integer-exact TF/DF keyword extraction vs a brute-force python oracle.

The ranking (tf DESC, df ASC, term ASC) is a strict total order per doc
(term is unique within a doc), so the top-k is uniquely defined — the
oracle replays it exactly, including the df caps and the bounded-plan pin.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from paragrapher_spark.functions.text import top_terms


def _oracle(rows, k, min_df=1, max_df=None):
    tf: dict[int, Counter] = defaultdict(Counter)
    for doc_id, text in rows:
        tf[doc_id].update(t for t in text.split(" ") if t)
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    out = {}
    for doc_id, c in tf.items():
        cand = [
            (t, n, df[t])
            for t, n in c.items()
            if df[t] >= min_df and (max_df is None or df[t] <= max_df)
        ]
        cand.sort(key=lambda x: (-x[1], x[2], x[0]))
        out[doc_id] = [
            (t, n, d, r + 1) for r, (t, n, d) in enumerate(cand[:k])
        ]
    return out


ROWS = [
    (1, "apple banana apple cherry apple"),
    (2, "banana banana cherry date"),
    (3, "cherry date elder fig fig"),
    (4, "apple  apple banana"),  # double space -> empty token dropped
    (5, "unique singleton"),
    (6, ""),  # no tokens -> no output rows
]


def _collect(df):
    got = defaultdict(list)
    for r in df.collect():
        got[r.doc_id].append((r.term, r.tf, r.df, r.rank))
    return {k: sorted(v, key=lambda x: x[3]) for k, v in got.items()}


def test_top_terms_matches_oracle(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = _collect(top_terms(docs, k=3))
    want = {k: v for k, v in _oracle(ROWS, k=3).items() if v}
    assert got == want
    assert 6 not in got  # empty doc yields nothing


def test_top_terms_df_caps(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    # max_df=1 keeps only corpus-unique terms; min_df=2 drops them
    got = _collect(top_terms(docs, k=5, max_df=1))
    want = {k: v for k, v in _oracle(ROWS, k=5, max_df=1).items() if v}
    assert got == want
    assert all(d == 1 for v in got.values() for (_, _, d, _) in v)
    got2 = _collect(top_terms(docs, k=5, min_df=2))
    want2 = {k: v for k, v in _oracle(ROWS, k=5, min_df=2).items() if v}
    assert got2 == want2


def test_top_terms_rank_is_deterministic_total_order(spark):
    # all-tied tf: rank must fall back to df then lexicographic term
    rows = [(1, "b a c"), (2, "a b"), (3, "c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(top_terms(docs, k=3))
    assert got == {k: v for k, v in _oracle(rows, k=3).items() if v}
    # doc 1: every tf=1; df: a=2, b=2, c=2 -> pure lexicographic
    assert [t for (t, *_rest) in got[1]] == ["a", "b", "c"]


def test_top_terms_plan_is_bounded(spark):
    """rank <= k over the per-doc window must compile to WindowGroupLimit
    (partial below the shuffle AND final above it) — no task buffers more
    than k rows per document."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        top_terms(docs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") >= 2, plan


# ---------------------------------------------------------------------------
# BM25 fixed-point retrieval
# ---------------------------------------------------------------------------


def _bm25_replay(docs, terms, k=10, scale=1_000_000):
    """Independent python replay of the integer fixed-point BM25:
    same rationals (k1=6/5, b=3/4 -> tf*44*A / (20*A*tf+6*A+18*dl)),
    same log-free RSJ idf, same floor divisions."""
    toksd = {i: [t for t in text.split(" ") if t] for i, text in docs}
    dl = {i: len(ts) for i, ts in toksd.items()}
    n = len(dl)
    avgdl = sum(dl.values()) // n
    tf = {}
    for i, ts in toksd.items():
        for t in ts:
            if t in terms:
                tf[(i, t)] = tf.get((i, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores = {}
    hits = {}
    for (i, t), f in tf.items():
        num = scale * (2 * n - 2 * df[t] + 1) * f * 44 * avgdl
        den = (2 * df[t] + 1) * (20 * avgdl * f + 6 * avgdl + 18 * dl[i])
        scores[i] = scores.get(i, 0) + num // den
        hits[i] = hits.get(i, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, s, hits[i]) for i, s in ranked]


def test_bm25_matches_python_replay(spark):
    from paragrapher_spark.functions.text import bm25_topk

    docs = [
        (0, "spark hash join hash hash filler words here and more"),
        (1, "vector vector vector spark tiny"),
        (2, "nothing relevant at all in this one document body"),
        (3, "hash"),
        (4, "spark spark spark spark spark long document " + "pad " * 50),
        (5, "vector hash spark all three terms present once each pad pad"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.doc_id, r.score_fp, r.n_hit)
        for r in bm25_topk(df, ["spark", "vector", "hash"], k=4).collect()
    ]
    want = _bm25_replay(docs, {"spark", "vector", "hash"}, k=4)
    assert got == want
    # every returned doc matched at least one query term
    assert all(h >= 1 for _, _, h in got)


def test_bm25_single_term_orders_like_textbook(spark):
    """With one query term the log-free idf is a constant factor, so the
    ranking must equal textbook BM25's: higher tf wins at equal dl,
    shorter doc wins at equal tf (b>0 length normalization)."""
    from paragrapher_spark.functions.text import bm25_topk

    docs = [
        (0, "x x x y y y y y"),        # tf=3, dl=8
        (1, "x x y y y y y y"),        # tf=2, dl=8
        (2, "x x x y y"),              # tf=3, dl=5 (shorter, same tf as 0)
        (3, "y y y y y y y y"),        # no hit
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [r.doc_id for r in bm25_topk(df, ["x"], k=5).collect()]
    assert got == [2, 0, 1]  # shorter beats longer at tf=3; tf=3 beats tf=2


def test_inverted_index_postings(spark):
    from paragrapher_spark.functions.text import inverted_index

    docs = [
        (10, "x y"),
        (2, "x"),
        (1, "x x x"),   # duplicate occurrences collapse in postings
        (3, "z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.term: (r.df, r.postings) for r in inverted_index(df).collect()
    }
    # numeric posting order, not lexicographic ("1,2,10" not "1,10,2")
    assert got == {"x": (3, "1,2,10"), "y": (1, "10"), "z": (1, "3")}
    got2 = {r.term for r in inverted_index(df, min_df=2).collect()}
    assert got2 == {"x"}


def test_bpe_merge_pairs_hand_counts(spark):
    from paragrapher_spark.functions.text import bpe_merge_pairs

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab")], "doc_id long, text string"
    )
    # pre-tokens: 'aaab' x1, ' aaab' x1, 'ab' x1
    # pairs: aaab -> aa,aa,ab ; ' aaab' -> ' a',aa,aa,ab ; ab -> ab
    got = {(r.left, r.right): r.n for r in bpe_merge_pairs(docs).collect()}
    assert got == {("a", "a"): 4, ("a", "b"): 3, (" ", "a"): 1}


def test_bpe_merge_pairs_single_char_tokens_excluded(spark):
    from paragrapher_spark.functions.text import bpe_merge_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # tokens 'a', ' b', ' c' -> only length-2 tokens contribute one pair each
    got = {(r.left, r.right): r.n for r in bpe_merge_pairs(docs).collect()}
    assert got == {(" ", "b"): 1, (" ", "c"): 1}
