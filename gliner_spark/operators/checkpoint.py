"""Per-partition checkpointing with lineage + metrics, and resume.

North-rule requirement (BASELINE.json:north_rule: "resumable from
checkpoint with per-partition lineage + metrics"). The reference has no
persistence at all; this is target-side design (SURVEY.md §2.3).

Mechanism: every stage writes its output parquet partitioned by a stable
``part_key`` (e.g. ``substr(xxhash64(url), …)`` bucket or lang), and
appends one manifest row per partition to a checkpoint table:
(stage, part_key, status, n_rows, lineage, ts). A re-run left-anti-joins
its input against the DONE manifest rows for the stage and processes only
missing partitions — idempotent because each partition's output path is
deterministic and overwritten atomically (dynamic partition overwrite).

At cluster scale this is the standard Iceberg/Hive pattern; parquet is
used here because the sandbox has no Iceberg runtime, but the writer goes
through one function (``_write``) so swapping the format is one line.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "part_key"
DONE = "done"


def with_part_key(
    df: DataFrame, key_col: str, n_buckets: int = 64, method: str = "hash"
) -> DataFrame:
    """Deterministic bucket key: stable across runs and cluster sizes
    (content-derived, not partition id — partition ids are not stable
    under different parallelism, content buckets are).

    method="hash" (default): ``pmod(xxhash64(key), n)`` — works for any
    key type and spreads adversarial key distributions.
    method="mod": ``pmod(key, n)`` for numeric keys — same stability,
    and reproducible by any ANSI-SQL engine (``key % n``), which lets a
    checkpointed stage's manifest carry an EXACT external oracle."""
    if method == "mod":
        key = F.pmod(F.col(key_col).cast("long"), F.lit(n_buckets))
    else:
        key = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    return df.withColumn(PART_COL, key.cast("string"))


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_checkpoints")


def _posix_root(root: str) -> str | None:
    """The POSIX path for a plain or ``file://`` root, None for
    genuinely remote schemes — the fsio dispatch rule, not a second
    copy of it. Used where local-only maintenance (compaction
    recovery) must engage for every root the POSIX ops can reach — a
    ``file://`` root that crashed mid-compaction would otherwise read
    back as an EMPTY manifest (silent full recompute instead of
    resume, r5 ADVICE)."""
    from .fsio import PosixFs, backend_for

    if backend_for(root) != "posix":
        return None
    return PosixFs().normalize(root)


def read_manifest(spark: SparkSession, root: str, stage: str) -> DataFrame:
    path = _manifest_path(root)
    local = _posix_root(root)
    if local is not None:  # heal an interrupted compaction
        _recover_manifest(_manifest_path(local))
    else:
        from urllib.parse import urlparse

        from .fsio import _ATOMIC_RENAME_SCHEMES, fs_for

        if urlparse(root).scheme in _ATOMIC_RENAME_SCHEMES:
            # hdfs-like roots get the same recovery through the Hadoop
            # client; object stores never ran the rename-based
            # compaction, so there is nothing to heal there
            fs, r = fs_for(spark, root, "hadoop")
            _recover_manifest_fs(fs, _manifest_path(r))
    try:
        m = spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame(
            [], "stage string, part_key string, status string, n_rows long, "
                "lineage string, ts timestamp"
        )
    return m.where(F.col("stage") == stage)


def completed_partitions(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return (
        read_manifest(spark, root, stage)
        .where(F.col("status") == DONE)
        .select(PART_COL)
        .distinct()
    )


def checkpoint_write(
    df: DataFrame,
    root: str,
    stage: str,
    lineage: dict | None = None,
    expected_part_keys: Sequence[str] | DataFrame | None = None,
) -> DataFrame:
    """Write ``df`` (must carry part_key) partition-by-partition with a
    manifest; skips partitions already DONE (resume). Returns the full
    stage output (reading back what exists on disk).

    ``todo`` is persisted across the two actions (parquet write +
    manifest count) so the upstream stage — for mentions, a full NER
    ``mapInPandas`` pass — executes ONCE, not twice.

    ``expected_part_keys`` (iterable of keys, or a 1-column DataFrame of
    part_key): input partitions that produced ZERO output rows are
    invisible in ``df``; passing the expected key universe records them
    as DONE with n_rows=0 so resume does not reprocess them forever.
    """
    spark = df.sparkSession
    out_path = os.path.join(root, stage)

    done = completed_partitions(spark, root, stage)
    todo = df.join(F.broadcast(done), PART_COL, "left_anti").persist()
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        todo.write.mode("overwrite").partitionBy(PART_COL).parquet(out_path)

        # manifest rows: per-partition row counts = the metrics the north
        # rule asks to track (triples per partition etc.)
        counts = todo.groupBy(PART_COL).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        if expected_part_keys is not None:
            if isinstance(expected_part_keys, DataFrame):
                exp = expected_part_keys.select(
                    F.col(expected_part_keys.columns[0])
                    .cast("string")
                    .alias(PART_COL)
                ).distinct()
            else:
                exp = spark.createDataFrame(
                    [(str(k),) for k in expected_part_keys],
                    f"{PART_COL} string",
                ).distinct()
            empty = (
                exp.join(F.broadcast(done), PART_COL, "left_anti")
                .join(counts.select(PART_COL), PART_COL, "left_anti")
                .select(PART_COL, F.lit(0).cast("long").alias("n_rows"))
            )
            counts = counts.unionByName(empty)
        manifest = counts.select(
            F.lit(stage).alias("stage"),
            F.col(PART_COL),
            F.lit(DONE).alias("status"),
            F.col("n_rows"),
            F.lit(json.dumps(lineage or {}, sort_keys=True)).alias("lineage"),
            F.current_timestamp().alias("ts"),
        )
        manifest.write.mode("append").parquet(_manifest_path(root))
    finally:
        todo.unpersist()
    return spark.read.parquet(out_path)


def _recover_manifest(path: str) -> None:
    from .fsio import PosixFs

    _recover_manifest_fs(PosixFs(), path)


def _recover_manifest_fs(fs, path: str) -> None:
    """Heal the crash windows of ``compact_manifest``'s two-rename swap
    (called on entry by every manifest-touching op), expressed over the
    fsio backend so file:// and hdfs:// roots heal identically to plain
    paths. States:
    - manifest present + ``.compact`` leftover → stale tmp, drop it;
    - manifest present + ``.old`` leftover → crash after the second
      rename, finish by dropping the trash;
    - manifest MISSING + complete ``.compact`` → crash between the two
      renames; the tmp was fully committed (``_SUCCESS``) before any
      rename, so promoting it FINISHES the compaction;
    - manifest missing + ``.old`` only (or incomplete tmp) → roll back
      to the pre-compaction manifest."""
    tmp, trash = path + ".compact", path + ".old"
    if fs.exists(path):
        fs.delete(tmp)
        fs.delete(trash)
        return
    if fs.exists(tmp) and fs.exists(fs.join(tmp, "_SUCCESS")):
        fs.rename(tmp, path)
        fs.delete(trash)
        return
    if fs.exists(trash):
        fs.delete(tmp)
        fs.rename(trash, path)


def _local_manifest_path(root: str, op: str) -> str:
    """POSIX manifest path for ops that stay local-only (os.walk
    gauges). Fails fast instead of renaming a literal './hdfs:/...'
    local path (r4 ADVICE)."""
    from gliner_spark.operators.sinks import _local_path

    return _manifest_path(_local_path(root, op))


def _maintenance_fs(spark, root: str, op: str, backend: str | None):
    """(fs, manifest_path) for the compaction family. The swap is two
    RENAMES, so the backend must rename atomically: POSIX and
    hdfs-like schemes qualify; object stores (s3a/gs/abfs — rename is
    copy+delete) fail fast with the Iceberg pointer, because a crash
    mid-copy there leaves a state the recovery walk cannot
    distinguish from a committed one."""
    from urllib.parse import urlparse

    from .fsio import _ATOMIC_RENAME_SCHEMES, backend_for, fs_for

    b = backend or backend_for(root)
    if b != "posix":
        scheme = urlparse(root).scheme
        if scheme and scheme not in _ATOMIC_RENAME_SCHEMES:
            raise ValueError(
                f"{op} needs an atomic rename; {scheme}:// renames are "
                "copy+delete. For object-store manifests use the "
                "catalog path (write_table fmt='iceberg'|'delta') — a "
                "table-format snapshot commit is the equivalent."
            )
    fs, r = fs_for(spark, root, b)
    return fs, _manifest_path(r)


def compact_manifest(spark: SparkSession, root: str,
                     backend: str | None = None) -> int:
    """Rewrite the append-only manifest to a single parquet file.

    ``checkpoint_write`` appends one small parquet per call; a
    long-lived incremental root accumulates unbounded small files.
    This opt-in maintenance op collapses them, keeping the LATEST row
    per (stage, part_key, status) — replays of an idempotent write can
    append duplicate DONE rows, and the newest carries the freshest
    lineage/ts while n_rows is identical by idempotence. DONE semantics
    are unchanged: ``completed_partitions`` sees exactly the same key
    set before and after (pytest-pinned across a resume boundary).

    Single-maintainer op: run it from the process that owns the root
    with no concurrent ``checkpoint_write`` on the same root — the swap
    is two renames, not one atomic commit (the same caveat as Hive
    compaction without a lock service; the Iceberg catalog path gets
    this atomically via snapshot commit). A crash between the renames
    is healed by ``_recover_manifest`` on the next manifest op (the
    committed tmp is promoted, else ``.old`` rolls back). Runs on any
    filesystem with atomic rename — POSIX paths, ``file://`` and
    ``hdfs://`` roots (via the fsio Hadoop backend, r5 verdict #5);
    object stores fail fast with the Iceberg pointer (see
    ``_maintenance_fs``). Returns rows retained."""
    from pyspark.sql import Window

    fs, path = _maintenance_fs(spark, root, "compact_manifest", backend)
    _recover_manifest_fs(fs, path)
    try:
        m = spark.read.parquet(path)
    except Exception:
        return 0
    w = (
        Window.partitionBy("stage", PART_COL, "status")
        .orderBy(F.col("ts").desc())
    )
    # materialize off the source files before overwriting them
    compacted = (
        m.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint()
    )
    n = compacted.count()
    tmp = path + ".compact"
    compacted.coalesce(1).write.mode("overwrite").parquet(tmp)
    trash = path + ".old"
    fs.delete(trash)
    fs.rename(path, trash)
    fs.rename(tmp, path)
    fs.delete(trash)
    return n


def manifest_file_count(root: str) -> int:
    """Data files currently under the manifest dir (compaction gauge).
    Local roots only (os.walk) — see ``_local_manifest_path``."""
    path = _local_manifest_path(root, "manifest_file_count")
    _recover_manifest(path)
    if not os.path.isdir(path):
        return 0
    return sum(
        1 for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def stage_metrics(spark: SparkSession, root: str) -> DataFrame:
    """All manifest rows — per-stage, per-partition counts and lineage."""
    try:
        return spark.read.parquet(_manifest_path(root))
    except Exception:
        return spark.createDataFrame(
            [], "stage string, part_key string, status string, n_rows long, "
                "lineage string, ts timestamp"
        )
