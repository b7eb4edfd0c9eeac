"""Deterministic hash sampling vs exact python replays.

Every keep/split decision is replayed in python from the same md5 prefix
formula, so the tests pin decisions bit-for-bit — plus the statistical
sanity (binomial 5-sigma) and the structural properties the pipeline
relies on: nested samples, disjoint-exhaustive splits, and stability of
existing decisions when the corpus grows.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from paragrapher_spark.operators.sampling import (
    HASH_SPACE,
    assign_splits,
    sample_hash,
    split_by_hash,
    stratified_sample,
    threshold_for,
)


def _h(key: str, tag: str, seed: int = 42) -> int:
    return int(
        hashlib.md5(f"{tag}:{seed}:{key}".encode()).hexdigest()[:15], 16
    )


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_sample_hash_replays_exactly(docs):
    got = {r.doc_id for r in sample_hash(docs, 0.3, ["doc_id"]).collect()}
    thr = threshold_for(0.3)
    want = {i for i in range(400) if _h(str(i), "sample") < thr}
    assert got == want
    assert got == {
        r.doc_id for r in sample_hash(docs, 0.3, ["doc_id"]).collect()
    }  # rerun-deterministic


def test_sample_hash_nested_and_binomial(docs):
    small = {r.doc_id for r in sample_hash(docs, 0.2, ["doc_id"]).collect()}
    big = {r.doc_id for r in sample_hash(docs, 0.6, ["doc_id"]).collect()}
    assert small <= big  # growing the rate keeps every sampled row
    for frac, kept in ((0.2, small), (0.6, big)):
        sigma = math.sqrt(400 * frac * (1 - frac))
        assert abs(len(kept) - 400 * frac) < 5 * sigma


def test_sample_hash_fraction_edges(docs):
    assert sample_hash(docs, 0.0, ["doc_id"]).count() == 0
    assert sample_hash(docs, 1.0, ["doc_id"]).count() == 400
    with pytest.raises(ValueError, match="fraction"):
        sample_hash(docs, 1.5, ["doc_id"])


def test_stratified_replays_exactly(docs):
    fr = {"en": 0.8, "de": 0.25}
    got = {
        r.doc_id
        for r in stratified_sample(
            docs, "lang", fr, ["doc_id"], default_fraction=0.05
        ).collect()
    }
    want = set()
    for i in range(400):
        lang = ["en", "de", "fr"][i % 3]
        thr = threshold_for(fr.get(lang, 0.05))
        if _h(str(i), "strat") < thr:
            want.add(i)
    assert got == want
    # every listed stratum actually sampled at its own rate: en >> de
    langs = {i: ["en", "de", "fr"][i % 3] for i in range(400)}
    n_en = sum(1 for i in got if langs[i] == "en")
    n_de = sum(1 for i in got if langs[i] == "de")
    assert n_en > n_de


def test_splits_disjoint_exhaustive_and_replayed(docs):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    tagged = assign_splits(docs, weights, ["doc_id"])
    got = {r.doc_id: r.split for r in tagged.collect()}
    assert len(got) == 400  # exhaustive
    b_train = threshold_for(0.8)
    b_val = threshold_for(0.9)
    for i in range(400):
        h = _h(str(i), "split")
        want = "train" if h < b_train else "val" if h < b_val else "test"
        assert got[i] == want, i
    parts = split_by_hash(docs, weights, ["doc_id"])
    ids = {name: {r.doc_id for r in df.collect()} for name, df in parts.items()}
    assert ids["train"] | ids["val"] | ids["test"] == set(range(400))
    assert not (ids["train"] & ids["val"] | ids["train"] & ids["test"]
                | ids["val"] & ids["test"])


def test_splits_stable_under_corpus_growth(docs):
    weights = {"train": 0.75, "test": 0.25}
    first = docs.where(F.col("doc_id") < 150)
    small = {
        r.doc_id: r.split
        for r in assign_splits(first, weights, ["doc_id"]).collect()
    }
    full = {
        r.doc_id: r.split
        for r in assign_splits(docs, weights, ["doc_id"]).collect()
    }
    assert all(full[i] == s for i, s in small.items())


def test_splits_weight_validation(docs):
    with pytest.raises(ValueError, match="at least one"):
        assign_splits(docs, {}, ["doc_id"])
    with pytest.raises(ValueError, match="non-negative"):
        assign_splits(docs, {"a": -1.0, "b": 2.0}, ["doc_id"])


def test_threshold_is_exact_integer():
    assert threshold_for(0.0) == 0
    assert threshold_for(1.0) == HASH_SPACE
    assert threshold_for(0.5) == HASH_SPACE // 2
