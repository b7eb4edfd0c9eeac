"""Deterministic sequence packing vs an exact python replay.

The whole assignment (bucket, running total, pack id) is a pure integer
function of the rows, so the oracle reproduces every value — plus the
structural invariants packing relies on: exhaustive assignment,
contiguity of packs in the bucket order, and the next-fit bound (every
pack except a bucket's last is full up to at most one straddling doc).
"""

from __future__ import annotations

import hashlib

import pytest

from paragrapher_spark.operators.packing import pack_documents, pack_stats

BUDGET = 50
N_BUCKETS = 4


def _bucket(doc_id: int) -> int:
    h = int(
        hashlib.md5(f"pack:42:{doc_id}".encode()).hexdigest()[:15], 16
    )
    return h % N_BUCKETS


def _replay(rows):
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in rows:
        n = len([t for t in text.split(" ") if t])
        by_bucket.setdefault(_bucket(doc_id), []).append((doc_id, n))
    out = {}
    for b, docs in by_bucket.items():
        acc = 0
        for doc_id, n in sorted(docs):
            out[doc_id] = (b, n, acc, acc // BUDGET)
            acc += n
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range((i * 7) % 23 + 1))) for i in range(200)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_packing_replays_exactly(docs):
    rows, df = docs
    packed = pack_documents(df, BUDGET, n_buckets=N_BUCKETS)
    got = {
        r.doc_id: (r.bucket, r.n_tokens, r.tokens_before, r.pack_id)
        for r in packed.collect()
    }
    assert got == _replay(rows)
    assert len(got) == 200  # exhaustive


def test_packing_invariants(docs):
    rows, df = docs
    packed = pack_documents(df, BUDGET, n_buckets=N_BUCKETS).collect()
    by_bp: dict[tuple[int, int], list] = {}
    for r in packed:
        by_bp.setdefault((r.bucket, r.pack_id), []).append(r)
    for (b, p), members in by_bp.items():
        tokens = sum(r.n_tokens for r in members)
        start = min(r.tokens_before for r in members)
        # pack k spans running totals [k*B, (k+1)*B): it can only exceed
        # the budget via its LAST doc straddling the boundary
        assert start >= p * BUDGET
        over = start + tokens - (p + 1) * BUDGET
        last = max(members, key=lambda r: r.tokens_before)
        assert over < last.n_tokens or tokens <= BUDGET
    # packs within a bucket are contiguous in doc_id order
    for b in {r.bucket for r in packed}:
        in_b = sorted((r.doc_id, r.pack_id) for r in packed if r.bucket == b)
        pids = [p for _, p in in_b]
        assert pids == sorted(pids)  # non-decreasing along the order


def test_pack_stats_fill(docs):
    _, df = docs
    packed = pack_documents(df, BUDGET, n_buckets=N_BUCKETS)
    stats = {
        (r.bucket, r.pack_id): (r.docs, r.tokens, r.fill)
        for r in pack_stats(packed, BUDGET).collect()
    }
    raw = packed.collect()
    for (b, p), (n_docs, tokens, fill) in stats.items():
        members = [r for r in raw if (r.bucket, r.pack_id) == (b, p)]
        assert n_docs == len(members)
        assert tokens == sum(r.n_tokens for r in members)
        assert fill == float(tokens) / float(BUDGET)


def test_packing_validation(docs):
    _, df = docs
    with pytest.raises(ValueError, match="budget_tokens"):
        pack_documents(df, 0)
    with pytest.raises(ValueError, match="n_buckets"):
        pack_documents(df, 10, n_buckets=0)
