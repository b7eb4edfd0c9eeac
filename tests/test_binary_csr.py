"""Binary CSR interchange (`sources/binary.py`) — byte-exact layout parity
with the reference's test3 (.g3) and test4 (bin) emitters, roundtrips, and
loud-failure contracts."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from paragrapher_spark.graph import Graph, graph_from_edges
from paragrapher_spark.sources.binary import (
    read_binary_csr,
    write_binary_csr,
)


def _ref_writer_bytes(fmt: str, n: int, adj: dict[int, list[int]]) -> bytes:
    """Tiny single-threaded oracle writer: the layouts documented in
    `test/test4_bin_converter_WG400.c:151-175` (bin) and
    `test/test3_converter_WG400.c:10-26` (g3), packed naively."""
    m = sum(len(v) for v in adj.values())
    if fmt == "bin":
        out = struct.pack("<QQ", n, m)
    else:
        out = struct.pack("<8Q", 3, 1, n, m, 4, 8, 0, 0)
    off = 0
    for v in range(n):
        out += struct.pack("<Q", off)
        off += len(adj.get(v, []))
    out += struct.pack("<Q", m)
    for v in range(n):
        for d in sorted(adj.get(v, [])):
            out += struct.pack("<I", d)
    return out


def _k5_graph(spark) -> tuple[Graph, dict[int, list[int]]]:
    # K5 plus an isolated vertex 5 (degree-0 offsets row must still exist)
    adj = {v: [u for u in range(5) if u != v] for v in range(5)}
    edges = spark.createDataFrame(
        [(s, d, 1) for s, ds in adj.items() for d in ds],
        "src long, dst long, weight long",
    )
    verts = spark.range(6).select(
        "id",
        F.lit(None).cast("string").alias("repo"),
        F.lit(None).cast("string").alias("path"),
    )
    return Graph(vertices=verts, edges=edges, num_vertices=6, num_edges=20), adj


@pytest.mark.parametrize("fmt", ["bin", "g3"])
def test_byte_identity_vs_reference_layout(spark, tmp_path, fmt):
    g, adj = _k5_graph(spark)
    path = str(tmp_path / f"k5.{fmt}")
    write_binary_csr(g, path, fmt=fmt, num_partitions=3)
    with open(path, "rb") as fh:
        got = fh.read()
    assert got == _ref_writer_bytes(fmt, 6, adj)


@pytest.mark.parametrize("fmt", ["bin", "g3"])
def test_roundtrip_random_graph(spark, tmp_path, fmt):
    # deterministic pseudo-random graph with skewed degrees + isolated ids
    edges = (
        spark.range(2000)
        .select(
            (F.col("id") % 97).alias("src"),
            ((F.col("id") * 31 + 7) % 120).alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1).cast("long"))
    )
    g = graph_from_edges(edges)
    # widen the vertex space so trailing ids have degree 0
    n = 130
    g = Graph(
        vertices=spark.range(n).select(
            "id",
            F.lit(None).cast("string").alias("repo"),
            F.lit(None).cast("string").alias("path"),
        ),
        edges=g.edges,
        num_vertices=n,
        num_edges=g.num_edges,
    )
    path = str(tmp_path / f"rt.{fmt}")
    write_binary_csr(g, path, fmt=fmt, num_partitions=5)
    back = read_binary_csr(spark, path, fmt=fmt, num_partitions=4)
    assert back.num_vertices == n and back.num_edges == g.num_edges
    assert (
        back.edges.select("src", "dst")
        .exceptAll(g.edges.select("src", "dst"))
        .count()
        == 0
    )
    assert back.edges.count() == g.num_edges


def test_reader_balances_by_edges_not_vertices(spark, tmp_path):
    # one giant adjacency (hub 0 -> 1..1000) + a tail of tiny ones: the
    # partition plan targets equal EDGE counts, so the hub's slice does
    # not also swallow the whole tail
    edges = spark.range(1, 1001).select(
        F.lit(0).cast("long").alias("src"),
        F.col("id").alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
    g = graph_from_edges(edges)
    path = str(tmp_path / "hub.bin")
    write_binary_csr(g, path, num_partitions=4)
    back = read_binary_csr(spark, path, num_partitions=4)
    assert back.edges.count() == 1000
    assert back.edges.where(F.col("src") != 0).count() == 0


def test_sparse_ids_fail_loudly(spark, tmp_path):
    # vertex id space with a gap (no id=1): positional offsets are
    # meaningless, must raise rather than silently misplace rows
    g = Graph(
        vertices=spark.createDataFrame(
            [(0,), (2,)], "id long"
        ).select("id", F.lit(None).cast("string").alias("repo"),
                 F.lit(None).cast("string").alias("path")),
        edges=spark.createDataFrame(
            [(0, 2, 1)], "src long, dst long, weight long"
        ),
        num_vertices=3,
        num_edges=1,
    )
    with pytest.raises(Exception, match="dense|covered"):
        write_binary_csr(g, str(tmp_path / "bad.bin"))


def test_truncated_file_fails_loudly(spark, tmp_path):
    g, _ = _k5_graph(spark)
    path = str(tmp_path / "trunc.bin")
    write_binary_csr(g, path)
    with open(path, "rb") as fh:
        raw = fh.read()
    with open(path, "wb") as fh:
        fh.write(raw[:-8])
    with pytest.raises(ValueError, match="truncated"):
        read_binary_csr(spark, path)


# ---------------------------------------------------------------------------
# property-based roundtrip: arbitrary dense-id digraphs through binary CSR
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover — baked into this environment
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(max_examples=4, deadline=None, database=None, derandomize=True)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=19),
                st.integers(min_value=0, max_value=19),
            ),
            min_size=0,
            max_size=60,
        ),
        n_extra=st.integers(min_value=0, max_value=5),
        fmt=st.sampled_from(["bin", "g3"]),
        wparts=st.integers(min_value=1, max_value=4),
        rparts=st.integers(min_value=1, max_value=5),
    )
    def test_binary_csr_roundtrip_random(
        spark, tmp_path_factory, edges, n_extra, fmt, wparts, rparts
    ):
        """Derandomized sweep over arbitrary small digraphs — self-loops,
        duplicate arcs (deduped), empty rows, zero-degree tails, edgeless
        graphs — through the positioned-write binary CSR in both layouts
        and mismatched write/read partitioning."""
        e = sorted({(s, d) for s, d in edges})
        n = max([max(s, d) for s, d in e], default=-1) + 1 + n_extra
        if n == 0:
            n = 1
        edf = spark.createDataFrame(
            e or [(0, 0)], "src long, dst long"
        ).withColumn("weight", F.lit(1).cast("long"))
        if not e:
            edf = edf.where(F.lit(False))
        g = Graph(
            vertices=spark.range(n).select(
                "id",
                F.lit(None).cast("string").alias("repo"),
                F.lit(None).cast("string").alias("path"),
            ),
            edges=edf,
            num_vertices=n,
            num_edges=len(e),
        )
        path = str(tmp_path_factory.mktemp("bcsr") / f"g.{fmt}")
        write_binary_csr(g, path, fmt=fmt, num_partitions=wparts)
        back = read_binary_csr(spark, path, fmt=fmt, num_partitions=rparts)
        assert back.num_vertices == n
        assert back.num_edges == len(e)
        got = sorted(
            tuple(r) for r in back.edges.select("src", "dst").collect()
        )
        assert got == e
