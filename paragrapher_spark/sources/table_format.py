"""Snapshot-versioned table format — the Iceberg contract from scratch.

The north rule's input is "an Iceberg table of source-code repositories".
This sandbox has no Iceberg runtime jar, and SURVEY §2 maps the engine's
storage to plain parquet — but the parts of the Iceberg contract the
engine actually leans on are implementable from scratch over parquet plus
JSON manifests, and this module does exactly that (same public design as
the Iceberg spec, re-expressed minimally):

- **snapshots**: every commit writes an immutable manifest
  ``_manifests/v{N}.json`` listing the table's data files with row counts
  and per-column min/max stats; readers never list directories (the
  listing problem Iceberg exists to kill at 100 TB — a directory listing
  of millions of objects is O(files) metadata RPCs, a manifest read is
  O(1)).
- **atomic commits**: the current version lives in one ``_current``
  pointer file swapped with ``os.replace`` (atomic on POSIX); a commit
  re-reads the pointer and FAILS LOUDLY if another writer advanced it
  (optimistic concurrency, the Iceberg commit protocol).
- **time travel**: ``read_table(path, version=N)`` reproduces any
  snapshot exactly — appends never rewrite old files, so old manifests
  stay valid (what makes incremental reprocessing + corpus_diff replays
  auditable).
- **scan pruning**: ``read_table(..., filters=[(col, lo, hi)])`` skips
  whole files by manifest min/max before Spark ever opens them — the
  manifest-level twin of the parquet row-group pruning `write_zordered`
  arranges (compose them: z-order the data, prune files by manifest, then
  row groups by footer).

What is deliberately NOT here: schema evolution, hidden partitioning,
row-level deletes — the engine's corpus tables are append/overwrite-only
(SURVEY §2.5), so those would be dead code.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_POINTER = "_current"


class CommitConflict(RuntimeError):
    """Another writer advanced the table between read and commit."""


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version}.json")


def _read_pointer(path: str) -> int:
    ptr = os.path.join(path, _POINTER)
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def _swap_pointer(path: str, expect: int, new: int) -> None:
    """Atomic optimistic pointer swap: re-check, write temp, os.replace."""
    cur = _read_pointer(path)
    if cur != expect:
        raise CommitConflict(
            f"table {path!r}: expected version {expect} but found {cur} — "
            "another writer committed; re-read and retry"
        )
    tmp = os.path.join(path, f"{_POINTER}.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(new))
    os.replace(tmp, os.path.join(path, _POINTER))


def _stat_files(df_reader, files: list[str], stat_cols: list[str]):
    """Per-file row counts and min/max stats in ONE Spark pass over the
    new files (grouped by input_file_name — no driver-side row data)."""
    if not files:
        return []
    df = df_reader(files)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    rows = df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    out = []
    for r in rows:
        ent = {
            "path": r["__f"].removeprefix("file:"),
            "rows": r["__rows"],
            "stats": {
                c: [r[f"__min_{c}"], r[f"__max_{c}"]] for c in stat_cols
            },
        }
        out.append(ent)
    return out


def _commit(
    path: str,
    base_version: int,
    file_entries: list[dict],
    operation: str,
) -> int:
    new_version = base_version + 1
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    manifest = {
        "version": new_version,
        "operation": operation,
        "committed_at": time.time(),
        "files": file_entries,
    }
    mpath = _manifest_path(path, new_version)
    tmp = mpath + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, mpath)
    _swap_pointer(path, base_version, new_version)
    return new_version


def _write_data_files(
    df: DataFrame, path: str, num_files: int | None
) -> list[str]:
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    sub = os.path.join(path, "data", uuid.uuid4().hex)
    df.repartition(n).write.mode("overwrite").parquet(sub)
    return [
        os.path.join(sub, f)
        for f in sorted(os.listdir(sub))
        if f.endswith(".parquet")
    ]


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    stat_cols: list[str] | None = None,
    num_files: int | None = None,
) -> int:
    """Commit ``df`` to the snapshot table at ``path`` and return the new
    version. ``mode='append'`` adds files to the current snapshot's set;
    ``'overwrite'`` starts a fresh file set (old files stay on disk so
    old snapshots remain readable — expiry is a separate, explicit act).
    ``stat_cols`` picks the columns whose min/max go into the manifest
    for file pruning (default: none — stats cost one aggregation over
    the new files only)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    base = _read_pointer(path)
    new_files = _write_data_files(df, path, num_files)
    entries = _stat_files(
        lambda fs: spark.read.parquet(*fs), new_files, stat_cols or []
    )
    if mode == "append" and base > 0:
        with open(_manifest_path(path, base)) as f:
            entries = json.load(f)["files"] + entries
    return _commit(path, base, entries, mode)


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    filters: list[tuple] | None = None,
) -> DataFrame:
    """Read a snapshot (default: current). ``filters`` is a list of
    ``(col, lo, hi)`` closed ranges applied at the MANIFEST level: a file
    whose recorded [min, max] misses the range is never handed to Spark
    (and the same predicate should still be applied relationally for
    row-level filtering — manifest pruning is a superset guarantee, like
    every stats-based skip). Raises loudly for a missing version or a
    filter column without manifest stats."""
    v = version if version is not None else _read_pointer(path)
    mpath = _manifest_path(path, v)
    if v <= 0 or not os.path.exists(mpath):
        raise ValueError(f"table {path!r} has no snapshot v{v}")
    with open(mpath) as f:
        manifest = json.load(f)
    files = manifest["files"]
    for col, lo, hi in filters or []:
        kept = []
        for ent in files:
            if col not in ent["stats"]:
                raise ValueError(
                    f"no manifest stats for {col!r} (stat_cols at write "
                    "time decides what can prune)"
                )
            mn, mx = ent["stats"][col]
            if mn is None or mx is None or (mx >= lo and mn <= hi):
                kept.append(ent)
        files = kept
    if not files:
        # preserve schema for empty scans via an empty frame on v's first file set
        all_files = [e["path"] for e in manifest["files"]]
        return spark.read.parquet(*all_files).limit(0)
    return spark.read.parquet(*[e["path"] for e in files])


def table_history(path: str) -> list[dict]:
    """[{version, operation, n_files, n_rows}] oldest→newest."""
    out = []
    v = 1
    while os.path.exists(_manifest_path(path, v)):
        with open(_manifest_path(path, v)) as f:
            m = json.load(f)
        out.append(
            {
                "version": m["version"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
                "n_rows": sum(e["rows"] for e in m["files"]),
            }
        )
        v += 1
    return out


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Garbage-collect snapshots older than the newest ``keep_last``:
    their manifests are deleted and any data file referenced by NO kept
    manifest is removed from disk. Returns {'expired_versions': [...],
    'deleted_files': n, 'kept_files': n} — the explicit, loud form of
    retention (time travel works exactly as far back as you chose to
    pay for). The current pointer never moves; expiring the current
    version is refused."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    current = _read_pointer(path)
    versions = []
    v = 1
    while os.path.exists(_manifest_path(path, v)):
        versions.append(v)
        v += 1
    keep = set(versions[-keep_last:])
    keep.add(current)
    expired = [v for v in versions if v not in keep]
    kept_files: set[str] = set()
    for v in keep:
        with open(_manifest_path(path, v)) as f:
            kept_files.update(e["path"] for e in json.load(f)["files"])
    doomed: set[str] = set()
    for v in expired:
        with open(_manifest_path(path, v)) as f:
            doomed.update(
                e["path"]
                for e in json.load(f)["files"]
                if e["path"] not in kept_files
            )
    for p in sorted(doomed):
        if os.path.exists(p):
            os.remove(p)
    for v in expired:
        os.remove(_manifest_path(path, v))
    return {
        "expired_versions": expired,
        "deleted_files": len(doomed),
        "kept_files": len(kept_files),
    }


def compact_table(
    spark: SparkSession,
    path: str,
    target_files: int,
    stat_cols: list[str] | None = None,
) -> int:
    """Rewrite the CURRENT snapshot's file set into ``target_files``
    files and commit the result as a new snapshot (operation
    'compact') — the small-files maintenance pass every long-lived
    append table needs (a 100 TB table fed by thousands of incremental
    appends decays into millions of KB-files; scan cost is per-file
    open + per-file manifest entry, so compaction is a scan-cost
    investment exactly like write_zordered). Old snapshots stay
    readable until expire_snapshots; the commit is optimistic like any
    other (a concurrent append raises CommitConflict and nothing is
    lost — the rewrite directory just becomes garbage for expiry)."""
    base = _read_pointer(path)
    df = read_table(spark, path)
    new_files = _write_data_files(df, path, target_files)
    entries = _stat_files(
        lambda fs: spark.read.parquet(*fs), new_files, stat_cols or []
    )
    return _commit(path, base, entries, "compact")


def merge_table(
    source: DataFrame,
    path: str,
    key_cols: list[str],
    stat_cols: list[str] | None = None,
    num_files: int | None = None,
) -> dict:
    """Copy-on-write MERGE (upsert) — the Iceberg ``MERGE INTO`` shape:
    source rows REPLACE current rows sharing their key, unmatched source
    rows are inserted, and only the data files that actually contain a
    matched key are rewritten. Untouched files carry their manifest
    entries (and their min/max stats) into the new snapshot verbatim —
    at 100 TB a daily upsert touching 0.1% of keys rewrites ~0.1% of the
    bytes, which is the entire point of file-granular copy-on-write.

    Loud contracts: the table must have a current snapshot; the source
    must be key-unique (a duplicate key would make "which row wins"
    nondeterministic — the Iceberg 'multiple source rows match' error);
    the commit fails with CommitConflict if a concurrent writer advanced
    the pointer. Old snapshots stay readable (time travel across a merge
    shows the pre-merge rows).

    Returns {'version', 'rewritten_files', 'carried_files',
    'matched_rows'}.
    """
    spark = source.sparkSession
    base = _read_pointer(path)
    if base <= 0:
        raise ValueError(f"merge target {path!r} has no snapshot to merge into")
    dup = (
        source.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"merge source has duplicate keys on {key_cols} — upsert "
            "winner would be nondeterministic"
        )

    with open(_manifest_path(path, base)) as f:
        entries = json.load(f)["files"]

    def _canon(p: str) -> str:
        # input_file_name reports a URI (file:///x); manifest entries may
        # be plain (/x) or scheme-stripped-URI (///x) paths — compare on
        # the scheme-stripped, slash-collapsed form
        tail = p.split("://", 1)[-1]
        if p.startswith("file:") and "://" not in p:
            tail = p[len("file:"):]
        return "/" + tail.lstrip("/")

    current = read_table(spark, path)
    keys = source.select(*key_cols)
    # inner join against the (typically tiny) source key set — AQE picks
    # broadcast when it fits; at 100 TB the key set of a daily delta is
    # exactly the broadcast-sized side
    touched_rows = current.withColumn("_f", F.input_file_name()).join(
        keys, on=key_cols, how="inner"
    )
    touched = {
        _canon(r["_f"])
        for r in touched_rows.select("_f").distinct().collect()
    }
    matched_rows = touched_rows.count()
    carried = [e for e in entries if _canon(e["path"]) not in touched]
    touched_files = [e["path"] for e in entries if _canon(e["path"]) in touched]

    survivors = None
    if touched_files:
        survivors = spark.read.parquet(*touched_files).join(
            keys, on=key_cols, how="left_anti"
        )
    new_data = (
        source if survivors is None
        else survivors.select(*source.columns).unionByName(source)
    )
    new_files = _write_data_files(new_data, path, num_files)
    new_entries = _stat_files(
        lambda fs: spark.read.parquet(*fs), new_files, stat_cols or []
    )
    version = _commit(path, base, carried + new_entries, "merge")
    return {
        "version": version,
        "rewritten_files": len(touched_files),
        "carried_files": len(carried),
        "matched_rows": matched_rows,
    }
