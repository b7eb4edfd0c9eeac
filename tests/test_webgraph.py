"""BVGraph codec (`sources/webgraph.py`) — spec-faithful bit codes,
chunked distributed write, random-access distributed read (the
reference's input format, `src/webgraph.c:84-390`)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from paragrapher_spark.graph import Graph
from paragrapher_spark.sources.webgraph import (
    BitReader,
    BitWriter,
    read_properties,
    read_webgraph,
    transcode_webgraph,
    write_webgraph,
)


def test_instantaneous_codes_roundtrip_and_known_words():
    w = BitWriter()
    for n in range(300):
        w.write_gamma(n)
        w.write_delta(n)
        w.write_zeta(n, 3)
    r = BitReader(w.getvalue())
    for n in range(300):
        assert r.read_gamma() == n
        assert r.read_delta() == n
        assert r.read_zeta(3) == n
    # known γ codewords (Elias): 0→1, 1→010, 2→011, 3→00100
    for n, expect in [(0, "1"), (1, "010"), (2, "011"), (3, "00100")]:
        t = BitWriter()
        t.write_gamma(n)
        got = "".join(f"{b:08b}" for b in t.getvalue())[: t.bit_length]
        assert got == expect
    # ζ_1 is exactly γ (Boldi–Vigna ζ-codes property) — pins the
    # truncated-binary bucket arithmetic
    for n in range(300):
        a, b = BitWriter(), BitWriter()
        a.write_zeta(n, 1)
        b.write_gamma(n)
        assert a.getvalue() == b.getvalue() and a.bit_length == b.bit_length


def test_list_cost_matches_real_encoder_bits():
    """The candidate scorer (_list_cost) must equal the bits the real
    encoder emits for the SAME (ref, ref_list) — it is what picks the
    reference, so drift would silently change compression choices."""
    from paragrapher_spark.sources.webgraph import (
        _encode_list,
        _list_cost,
    )

    rng = random.Random(17)
    for trial in range(300):
        x = rng.randint(0, 5000)
        succ = sorted(
            set(rng.randint(0, 6000) for _ in range(rng.randint(0, 30)))
        )
        ref = rng.randint(0, 5)
        ref_list = (
            sorted(set(rng.randint(0, 6000) for _ in range(rng.randint(0, 25))))
            if ref
            else []
        )
        mi = rng.choice([None, 2, 4])
        zk = rng.choice([1, 2, 3])
        window = rng.choice([0, 7])
        if window == 0:
            ref, ref_list = 0, []
        w = BitWriter()
        _encode_list(w, x, succ, ref, ref_list, mi, zk, window)
        cost = _list_cost(x, succ, ref, ref_list, mi, zk, window)
        assert cost == w.bit_length, (
            trial, x, succ, ref, ref_list, mi, zk, window,
        )


def _synthetic_graph(spark, n=600, seed=11):
    """Skewed graph with copy-friendly similar lists, interval-heavy
    lists, degree-0 vertices, and a zero-degree tail."""
    random.seed(seed)
    rows = []
    prev: list[int] = []
    for v in range(n - 50):  # last 50 vertices isolated
        if random.random() < 0.8:
            s = set(random.randint(0, n - 1) for _ in range(random.randint(1, 25)))
            if random.random() < 0.5:
                s |= set(prev[:10])  # similar to predecessor → references
            if random.random() < 0.3:
                st = random.randint(0, n - 20)
                s |= set(range(st, st + random.randint(4, 14)))  # intervals
            prev = sorted(s)
            rows.extend((v, d) for d in prev)
    edges = spark.createDataFrame(rows, "src long, dst long").withColumn(
        "weight", F.lit(1).cast("long")
    )
    verts = spark.range(n).select(
        "id",
        F.lit(None).cast("string").alias("repo"),
        F.lit(None).cast("string").alias("path"),
    )
    return Graph(
        vertices=verts, edges=edges, num_vertices=n, num_edges=len(rows)
    )


def test_webgraph_roundtrip_distributed(spark, tmp_path):
    g = _synthetic_graph(spark)
    base = str(tmp_path / "synth")
    write_webgraph(g, base, num_partitions=6)
    props = read_properties(base)
    assert int(props["nodes"]) == g.num_vertices
    assert int(props["arcs"]) == g.num_edges
    # many small read partitions force reference chains to resolve across
    # slice back-off regions (window*maxref context)
    back = read_webgraph(spark, base, num_partitions=11)
    assert back.num_vertices == g.num_vertices
    assert back.num_edges == g.num_edges
    assert (
        back.edges.select("src", "dst")
        .exceptAll(g.edges.select("src", "dst"))
        .count()
        == 0
    )
    assert back.edges.count() == g.num_edges


def test_webgraph_roundtrip_no_window_no_intervals(spark, tmp_path):
    g = _synthetic_graph(spark, n=300, seed=5)
    base = str(tmp_path / "nowin")
    write_webgraph(
        g, base, window=0, max_ref=0, min_interval=None, num_partitions=3
    )
    back = read_webgraph(spark, base, num_partitions=5)
    assert back.edges.count() == g.num_edges
    assert (
        back.edges.select("src", "dst")
        .exceptAll(g.edges.select("src", "dst"))
        .count()
        == 0
    )


def test_webgraph_compresses(spark, tmp_path):
    import os

    g = _synthetic_graph(spark)
    base = str(tmp_path / "cmp")
    write_webgraph(g, base, num_partitions=4)
    raw_bytes = g.num_edges * 8  # u32 src + u32 dst COO floor
    assert os.path.getsize(base + ".graph") < raw_bytes / 2


def test_webgraph_transcode_to_parquet_csr(spark, tmp_path):
    g = _synthetic_graph(spark, n=250, seed=3)
    base = str(tmp_path / "tc")
    write_webgraph(g, base, num_partitions=3)
    out = transcode_webgraph(spark, base, str(tmp_path / "csr"), num_partitions=4)
    # graph_meta-equivalent counts come from .properties via the sidecar
    assert out.num_vertices == g.num_vertices
    assert out.num_edges == g.num_edges
    got = out.edges.groupBy("src").count()
    want = g.edges.groupBy("src").count()
    assert got.exceptAll(want).count() == 0


def test_webgraph_nondefault_flags_fail_loudly(spark, tmp_path):
    g = _synthetic_graph(spark, n=100, seed=9)
    base = str(tmp_path / "flags")
    write_webgraph(g, base, num_partitions=2)
    with open(base + ".properties", "a") as fh:
        fh.write("compressionflags=OUTDEGREES_DELTA\n")
    with pytest.raises(NotImplementedError, match="compressionflags"):
        read_webgraph(spark, base)


def test_webgraph_arc_labels_roundtrip(spark, tmp_path):
    # WG404: arc labels ride .labels/.labeloffsets (the reference reads
    # the same file pair, src/webgraph.c:115-122,297-334); weights come
    # back as the edge weight column
    g = _synthetic_graph(spark, n=300, seed=21)
    weighted = Graph(
        vertices=g.vertices,
        edges=g.edges.withColumn(
            "weight", (F.col("src") + F.col("dst")) % 9 + 1
        ),
        num_vertices=g.num_vertices,
        num_edges=g.num_edges,
    )
    base = str(tmp_path / "lab")
    write_webgraph(weighted, base, num_partitions=4, with_labels=True)
    back = read_webgraph(spark, base, num_partitions=6)
    assert (
        back.edges.select("src", "dst", "weight")
        .exceptAll(weighted.edges.select("src", "dst", "weight"))
        .count()
        == 0
    )
    assert back.edges.count() == weighted.num_edges


def test_webgraph_offsets_bootstrap(spark, tmp_path):
    # missing .offsets is rebuilt by a sequential pass (the reference
    # shells to the jar's offline offsets step, src/webgraph.c:559-599)
    import os

    g = _synthetic_graph(spark, n=200, seed=13)
    base = str(tmp_path / "boot")
    write_webgraph(g, base, num_partitions=3)
    with open(base + ".offsets", "rb") as fh:
        original = fh.read()
    os.remove(base + ".offsets")
    back = read_webgraph(spark, base, num_partitions=4)
    assert back.edges.count() == g.num_edges
    with open(base + ".offsets", "rb") as fh:
        rebuilt = fh.read()
    assert rebuilt == original  # bit-identical bootstrap
