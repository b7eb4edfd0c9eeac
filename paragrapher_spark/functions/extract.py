"""Vectorized import/dependency extraction from source ``content``.

JVM-side ``regexp_extract_all`` over the content column (no per-row
Python — input_hint contract). Two language rules, matching the corpus
generator (sources/corpus.py) and FIXTURES.md §1:

- python: ``from <repo> import <dotted.module>`` →
  key ``<repo>/<module with . -> />.py``
- c:      ``#include "<repo>/<path>"`` → key ``<repo>/<path>``

The output is one row per *import site* keyed by the canonical vertex key
``repo/path`` — the Spark-native replacement for the reference's
decompress-and-callback edge delivery (`src/WG400AP.java:139-196`): here
the "decompression" is a regex over a columnar string batch inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lang -> (pattern, how to build the target key from the match)
IMPORT_PATTERNS: dict[str, str] = {
    "python": r"(?m)^from\s+(\S+)\s+import\s+(\S+)$",
    "c": r"(?m)^#include\s+\"([^\"]+)\"$",
}

# function-granularity patterns (sources/corpus.synth_callgraph_corpus_sql
# fixture shape): group 1 = defined name, group 2 = one-line body; CALL
# matches each call site inside a body
CALLGRAPH_PATTERNS: dict[str, str] = {
    "python": r"(?m)^def (fn_\d+_\d+)\(\): (.*)$",
    "c": r"(?m)^void (fn_\d+_\d+)\(void\) \{ (.*) \}$",
    "call": r"(fn_\d+_\d+)\(\)",
}


def vertex_key(repo: Column, path: Column) -> Column:
    return F.concat(repo, F.lit("/"), path)


def extract_import_keys(corpus: DataFrame) -> DataFrame:
    """corpus(repo,path,lang,content,...) -> (src_key, dst_key) import sites.

    One output row per import statement (duplicates preserved — they become
    edge weights downstream).
    """
    py = (
        corpus.where(F.col("lang") == "python")
        .select(
            vertex_key(F.col("repo"), F.col("path")).alias("src_key"),
            F.explode(
                F.regexp_extract_all(
                    F.col("content"), F.lit(IMPORT_PATTERNS["python"]), F.lit(0)
                )
            ).alias("stmt"),
        )
        .select(
            "src_key",
            F.concat(
                F.regexp_extract(F.col("stmt"), IMPORT_PATTERNS["python"], 1),
                F.lit("/"),
                F.replace(
                    F.regexp_extract(F.col("stmt"), IMPORT_PATTERNS["python"], 2),
                    F.lit("."),
                    F.lit("/"),
                ),
                F.lit(".py"),
            ).alias("dst_key"),
        )
    )
    c = (
        corpus.where(F.col("lang") == "c")
        .select(
            vertex_key(F.col("repo"), F.col("path")).alias("src_key"),
            F.explode(
                F.regexp_extract_all(
                    F.col("content"), F.lit(IMPORT_PATTERNS["c"]), F.lit(1)
                )
            ).alias("dst_key"),
        )
    )
    return py.unionByName(c)


def extract_functions(corpus: DataFrame) -> DataFrame:
    """corpus -> (repo, path, fname): every function DEFINITION, one row
    each (including functions that make no calls — the call graph's
    isolated vertices). JVM-side regexp_extract_all over the content
    column, same vectorized-extraction contract as extract_import_keys
    (the reference delivers vertices the same way it delivers edges,
    `src/WG400AP.java:139-196` — here both are regex passes over a
    columnar string batch)."""
    parts = []
    for lang in ("python", "c"):
        parts.append(
            corpus.where(F.col("lang") == lang).select(
                "repo",
                "path",
                F.explode(
                    F.regexp_extract_all(
                        F.col("content"),
                        F.lit(CALLGRAPH_PATTERNS[lang]),
                        F.lit(1),
                    )
                ).alias("fname"),
            )
        )
    return parts[0].unionByName(parts[1])


def extract_call_sites(corpus: DataFrame) -> DataFrame:
    """corpus -> (repo, path, caller, callee): one row per CALL SITE.

    Two-level vectorized parse, all inside whole-stage codegen: the
    definition regex yields (caller, body) per function, then the call
    regex explodes each body into its call sites. Duplicate (caller,
    callee) pairs are preserved — they become edge weights downstream,
    exactly like repeated import statements in extract_import_keys.
    """
    parts = []
    for lang in ("python", "c"):
        pat = CALLGRAPH_PATTERNS[lang]
        stmts = corpus.where(F.col("lang") == lang).select(
            "repo",
            "path",
            F.explode(
                F.regexp_extract_all(F.col("content"), F.lit(pat), F.lit(0))
            ).alias("stmt"),
        )
        parts.append(
            stmts.select(
                "repo",
                "path",
                F.regexp_extract(F.col("stmt"), pat, 1).alias("caller"),
                F.explode(
                    F.regexp_extract_all(
                        F.regexp_extract(F.col("stmt"), pat, 2),
                        F.lit(CALLGRAPH_PATTERNS["call"]),
                        F.lit(1),
                    )
                ).alias("callee"),
            )
        )
    return parts[0].unionByName(parts[1])
