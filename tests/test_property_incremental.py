"""Property-based sweeps for the incremental-maintenance family.

The r4 additions (warm-start WCC merge, deletion-aware WCC, delta-edge
triangle maintenance) promise BIT-IDENTICAL agreement with a cold run on
the post-delta edge set. The fixture tests pin hand-picked shapes; these
derandomized hypothesis sweeps assert the identity over arbitrary small
graphs and arbitrary delta splits — duplicate edges, self-loops,
components that merge, split, or vanish.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover — baked into this environment
    _HAVE_HYPOTHESIS = False

pytestmark = pytest.mark.skipif(
    not _HAVE_HYPOTHESIS, reason="hypothesis not installed"
)

_EDGE = st.tuples(
    st.integers(min_value=0, max_value=13), st.integers(min_value=0, max_value=13)
)


def _labels(res) -> list[tuple[int, int]]:
    return sorted((r.id, r.component) for r in res.components.collect())


if _HAVE_HYPOTHESIS:

    @settings(max_examples=5, deadline=None, database=None, derandomize=True)
    @given(
        edges=st.lists(_EDGE, min_size=1, max_size=30),
        mask=st.integers(min_value=0, max_value=2**30 - 1),
    )
    def test_incremental_wcc_equals_cold(spark, edges, mask):
        """append path: cold(old) star forest + delta == cold(old+delta),
        for every split of the edge list chosen by the mask bits."""
        from paragrapher_spark.kernels.components import (
            connected_components,
            incremental_components,
        )

        e = [(s, d) for s, d in edges if s != d]
        old = [p for i, p in enumerate(e) if not (mask >> (i % 30)) & 1]
        delta = [p for i, p in enumerate(e) if (mask >> (i % 30)) & 1]
        if not old or not delta:
            return
        old_df = spark.createDataFrame(old, "src long, dst long")
        delta_df = spark.createDataFrame(delta, "src long, dst long")
        prev = connected_components(old_df)
        warm = incremental_components(prev.components, delta_df)
        cold = connected_components(old_df.unionByName(delta_df))
        assert _labels(warm) == _labels(cold)

    @settings(max_examples=5, deadline=None, database=None, derandomize=True)
    @given(
        edges=st.lists(_EDGE, min_size=2, max_size=30),
        mask=st.integers(min_value=0, max_value=2**30 - 1),
    )
    def test_decremental_wcc_equals_cold(spark, edges, mask):
        """deletion path: labels after removing the masked edges must
        equal a cold run over the remaining edges, with the vertex
        universe kept (isolated vertices stay as singletons)."""
        from paragrapher_spark.kernels.components import (
            connected_components,
            decremental_components,
        )
        from pyspark.sql import functions as F

        e = list({(s, d) for s, d in edges if s != d})
        removed = [p for i, p in enumerate(e) if (mask >> (i % 30)) & 1]
        remaining = [p for i, p in enumerate(e) if not (mask >> (i % 30)) & 1]
        if not removed or not remaining:
            return
        full_df = spark.createDataFrame(e, "src long, dst long")
        rem_df = spark.createDataFrame(remaining, "src long, dst long")
        del_df = spark.createDataFrame(removed, "src long, dst long")
        prev = connected_components(full_df)
        warm = decremental_components(prev.components, rem_df, del_df)
        verts = (
            full_df.select(F.col("src").alias("id"))
            .unionByName(full_df.select(F.col("dst").alias("id")))
            .distinct()
        )
        cold = connected_components(rem_df, vertices=verts)
        assert _labels(warm) == _labels(cold)

    @settings(max_examples=5, deadline=None, database=None, derandomize=True)
    @given(
        edges=st.lists(_EDGE, min_size=2, max_size=26),
        mask=st.integers(min_value=0, max_value=2**26 - 1),
    )
    def test_delta_triangles_identity_random(spark, edges, mask):
        """prev_count + delta_triangles(full, delta, old_edges=old) ==
        cold(full) for arbitrary splits, including splits whose delta
        re-asserts old edges (the enforcement path drops them)."""
        from paragrapher_spark.kernels.triangles import (
            delta_triangles,
            triangle_count,
        )

        e = [(s, d) for s, d in edges if s != d]
        old = [p for i, p in enumerate(e) if not (mask >> (i % 26)) & 1]
        delta = [p for i, p in enumerate(e) if (mask >> (i % 26)) & 1]
        if not old or not delta:
            return
        old_df = spark.createDataFrame(old, "src long, dst long")
        delta_df = spark.createDataFrame(delta, "src long, dst long")
        full_df = old_df.unionByName(delta_df)
        prev = triangle_count(old_df).collect()[0].triangles
        dt = delta_triangles(full_df, delta_df, old_edges=old_df).collect()[0]
        cold = triangle_count(full_df).collect()[0].triangles
        assert prev + dt.new_triangles == cold
