"""Winnowing (operators/dedup.py) vs a pure-python MOSS reference."""

from __future__ import annotations

import hashlib

from paragrapher_spark.operators.dedup import winnow_clone_pairs, winnow_fingerprints

K, W = 4, 3


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Reference winnowing: (pos, hash) selected set, rightmost-min rule."""
    hs = [_h(text[i : i + k]) for i in range(len(text) - k + 1)]
    out = set()
    for s in range(len(hs) - w + 1):
        window = hs[s : s + w]
        mh = min(window)
        # rightmost occurrence of the min
        off = max(i for i, v in enumerate(window) if v == mh)
        out.add((s + off + 1, mh))  # 1-based gram position
    return out


def test_winnow_fingerprints_match_python_reference(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "abcabcabcabcabc",
        3: "xyz" * 7,
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got: dict[int, set] = {i: set() for i in texts}
    for r in winnow_fingerprints(docs, k=K, w=W).collect():
        got[r.id].add((r.pos, r.h))
    for i, t in texts.items():
        assert got[i] == _py_winnow(t), f"doc {i}"


def test_winnow_guarantee_shared_substring_detected(spark):
    # docs share a substring of length k+w-1=6 -> must share >= 1 fingerprint
    docs = spark.createDataFrame(
        [(1, "UUUUU_SHARED_VVVVV"), (2, "ppppp_SHARED_qqqqq")],
        "doc_id long, text string",
    )
    pairs, metrics = winnow_clone_pairs(docs, k=K, w=W, min_shared=1, max_df=None)
    rows = pairs.collect()
    assert len(rows) == 1 and rows[0].n_shared >= 1
    assert metrics["n_dropped_hashes"] == 0


def test_winnow_boilerplate_cap_is_loud(spark):
    # every doc is identical: each fingerprint hash hits df=4 > max_df=2,
    # so all hashes drop (counted) and no pairs remain
    docs = spark.createDataFrame(
        [(i, "samesamesame") for i in range(4)], "doc_id long, text string"
    )
    pairs, metrics = winnow_clone_pairs(docs, k=K, w=W, min_shared=1, max_df=2)
    assert pairs.count() == 0
    assert metrics["n_dropped_hashes"] > 0


def test_winnow_short_docs_have_no_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcd")], "doc_id long, text string"
    )
    # doc 2 has one gram (len 4 = k) but no complete window (needs k+w-1=6)
    assert winnow_fingerprints(docs, k=K, w=W).count() == 0
