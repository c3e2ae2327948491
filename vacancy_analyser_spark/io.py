"""Readers and writers (SURVEY.md §2.1 sources/sinks, Spark-first).

Reference parity notes:
- CSV snapshots embed newlines inside quoted cells (get_vacancies.py:169) →
  ``multiLine`` + explicit schema, never inference (feeder_postgres.py:119-131
  hand-parses; Spark's reader subsumes the empty→NULL / bool / timestamp
  coercions via options + casts).
- Parquet sink splits at 50,000 rows/file (feeder_hadoop.py:19-20,87) —
  same option name in Spark.
- JDBC source (feeder_hadoop.py:79-86) — thin wrapper; partitioned read
  options exposed so a 100 TB table does not arrive through one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TESTDATA_SCHEMAS
from .session import MAX_RECORDS_PER_FILE


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


#: Comparison ops accepted by ``load_table(ts_filters=...)``.
_TS_OPS = {
    ">=": lambda c, v: c >= v,
    ">": lambda c, v: c > v,
    "<=": lambda c, v: c <= v,
    "<": lambda c, v: c < v,
}


def _utc_nanos(iso: str) -> int:
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1_000


#: Parquet footer schemas keyed by table path — inferred once per process,
#: then handed to every later read so a repeated query build skips the
#: per-read schema-inference job (~50-90 ms and one cluster round-trip
#: each; a metastore's job at scale — guide §1.5/§6: the relational
#: headline queries were spending 5-7 footer jobs per timed run on
#: re-reading schemas of immutable tables). Safe for the same reason
#: dedup._REGIME_PROBE_CACHE is: a table under an sf_dir is immutable
#: for the life of a process, and every session reads with
#: nanosAsLong=true so nanos columns infer identically. Schema metadata
#: only — never rows, so no result can leak across bench runs.
_SCHEMA_CACHE: dict = {}

#: Mirror of spark.sql.files.openCostInBytes' default: the file-splitting
#: floor that makes a scan of B bytes yield at most ~B/4MB tasks.
_OPEN_COST_BYTES = 4 * 1024 * 1024


def spread_small_scan(df: DataFrame, spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Round-robin a SMALL table's rows across the cluster's cores before
    per-row-heavy compute (tokenize, per-token hashing, codec work).

    Scans parallelize at ~openCostInBytes (4 MB) file-split granularity
    and never beyond the parquet row-group count, so a table smaller than
    ``cores × 4 MB`` reaches the expensive projection on a handful of
    tasks — at bench scale literally one, serializing the whole tokenize
    stage (guide §2.5: input skew from one small/unsplittable file →
    repartition immediately after the read). The gate is derived from the
    INPUT SIZE, not a constant: at cluster scale the table outgrows the
    threshold and this is a no-op, so no extra exchange ever touches a
    large scan. Non-local paths (hdfs://, s3a://) skip the probe — those
    deployments split scans across executors anyway."""
    return spread_small_path(df, spark, table_path(sf_dir, name))


def spread_small_path(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    """spread_small_scan for a frame read from an explicit path (a durable
    corpus / state directory rather than a named testdata table) — same
    input-derived gate, same no-op-at-scale contract.

    A directory containing SUBDIRECTORIES (a partitioned layout) is
    treated as over-threshold and returned unchanged: the one-level size
    probe sees ~0 bytes for such a layout, and acting on that reading
    would bolt a full round-robin exchange onto a table of ANY size —
    the exact extra shuffle this gate exists to prevent (r12 verdict).
    Partitioned layouts split their scans across many files anyway, so
    the single-small-file serialization the spread fixes cannot occur
    there; skipping is both the safe and the correct reading."""
    try:
        import os

        if os.path.isfile(path):
            n_bytes = os.path.getsize(path)
        else:
            n_bytes = 0
            for e in os.scandir(path):
                if e.is_dir():
                    return df
                n_bytes += e.stat().st_size
    except OSError:
        return df
    cores = spark.sparkContext.defaultParallelism
    if n_bytes >= cores * _OPEN_COST_BYTES:
        return df
    return df.repartition(cores)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_filters: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Read one harness testdata table.

    Plain ``spark.read.parquet`` — the parquet footer carries the schema, so
    Catalyst gets column pruning + filter pushdown for free. TESTDATA_SCHEMAS
    is used by tests to assert the files still match our expectations.

    Nanosecond-timestamp columns arrive as LongType (see the nanosAsLong
    conf in session.py) and are converted here to microsecond timestamps
    with integer division — float division would lose precision above 2^53.

    ``ts_filters`` — ``[(column, op, iso_utc_literal), ...]`` with op in
    {>=, >, <=, <} — exists because the nanos→timestamp conversion wraps the
    column in an expression, so a query-level ``ts >= T`` filter cannot be
    pushed into the parquet scan (the executed plan showed only
    ``PushedFilters: [IsNotNull(ts)]``). The mapping is strictly monotonic,
    so a constant time predicate translates exactly to the raw int64 nanos
    domain; applying it here, *before* the conversion, restores row-group
    min/max skipping and (on a date-partitioned lake) partition pruning —
    the difference between scanning a day and scanning 100 TB. Filters on
    columns that arrive as native timestamps are applied unchanged.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Runtime-settable SQL conf: the harness driver hands us its own vanilla
    # session, which would otherwise reject TIMESTAMP(NANOS) parquet files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    cached_schema = _SCHEMA_CACHE.get(path)
    reader = spark.read if cached_schema is None else spark.read.schema(cached_schema)
    df = reader.parquet(path)
    if cached_schema is None:
        _SCHEMA_CACHE[path] = df.schema
    raw_types = {f.name: f.dataType for f in df.schema.fields}
    for col, op, iso in ts_filters or []:
        if isinstance(raw_types.get(col), T.LongType):
            df = df.filter(_TS_OPS[op](F.col(col), F.lit(_utc_nanos(iso))))
        else:
            df = df.filter(_TS_OPS[op](F.col(col), F.lit(iso).cast("timestamp")))
    expected = TESTDATA_SCHEMAS.get(name)
    if expected is not None:
        for f in expected.fields:
            if isinstance(f.dataType, T.TimestampType) and isinstance(raw_types.get(f.name), T.LongType):
                df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def read_snapshot_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """S7: typed CSV snapshot source (feeder_postgres.py:119-131 semantics).

    multiLine handles embedded newlines in quoted text cells; emptyValue→NULL
    replaces the reference's ``"" → None``; timestamps/booleans are parsed by
    the schema-directed reader instead of per-row Python.
    """
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
        .csv(path)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S8: JDBC source (feeder_hadoop.py:79-86), with partitioned-read support.

    The reference reads the whole table through a single connection; at scale
    pass (partition_column, bounds, num_partitions) so executors read ranges
    in parallel — the same range-splitting idea as the reference's date
    bisection scan (get_vacancies.py:48-59), but handled by Spark.

    Tested end-to-end against embedded Derby (tests/test_jdbc.py) — a real
    JDBC endpoint inside the test JVM, covering both the plain and the
    partitioned read path.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    return reader.load()


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
) -> None:
    """S9 parquet sink. Atomicity (the reference's tempfile+rename dance,
    get_hist_vacancies.py:191-216) comes from Spark's task-commit protocol."""
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """SQL write sink — the reference writes its merged state back to
    Postgres (feeder_postgres.py:147-177). Executors write their partitions
    in parallel through their own connections with batched INSERTs; pass
    ``num_partitions`` to bound the connection count the database sees
    (Spark coalesces before writing — at 1000 executors an unbounded write
    is a connection storm, not a throughput win)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    if num_partitions is not None:
        writer = writer.option("numPartitions", str(num_partitions))
    writer.mode(mode).save()


def last_wins_per_key(
    df: DataFrame, key_cols: list[str], order_col: str | None = None
) -> DataFrame:
    """Collapse ``df`` to one row per key with a deterministic last-wins
    rule. ANSI MERGE raises on multiple source rows matching one target row
    (and a bootstrap append would silently keep the duplicates), so every
    upsert batch must be key-unique BEFORE it reaches the database.

    Ordering: ``order_col`` DESC first when given (a version / scraped-at
    column — the reference's snapshots carry ``data_pull_date``), then every
    REMAINING non-key column DESC as tiebreakers: two rows with the same key
    and a tied order_col but different payloads would otherwise get an
    arbitrary row_number winner, and a foreachBatch RETRY of the same batch
    could then upsert a different row than the first attempt — the
    tiebreakers make the winner a pure function of the data. Rows that
    still tie under the full ordering are exact duplicates, so either one
    is the same row."""
    from pyspark.sql.window import Window

    rest = [c for c in df.columns if c not in key_cols and c != order_col]
    order_exprs = [F.col(c).desc_nulls_last() for c in rest]
    if order_col:
        order_exprs = [F.col(order_col).desc_nulls_last()] + order_exprs
    if not order_exprs:  # key-only schema: rows within a key are identical
        return df.dropDuplicates(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(*order_exprs)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_jdbc(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
    staging_table: str | None = None,
    order_col: str | None = None,
) -> None:
    """Set-based JDBC upsert: the reference's conditional INSERT/UPDATE row
    loop (feeder_postgres.py:147-177 — one SELECT + one INSERT-or-UPDATE
    per vacancy id) re-expressed as the two-step shape that scales:

    1. the changeset lands in a staging table through the PARALLEL batched
       writer above (executor-side, no driver round trips), then
    2. ONE database-side ``MERGE INTO target USING staging`` folds it in —
       set-based, planned by the database, no per-row network round trips.

    The batch is first reduced to one row per key (``last_wins_per_key``):
    a cold-start availableNow stream folds EVERY existing changeset file
    into batch 0, so in-batch key duplicates are the normal case, and both
    failure modes (MERGE 'multiple source rows match', duplicate bootstrap
    appends) are prevented here rather than documented away. Pass
    ``order_col`` to pick the winner by a version/timestamp column.

    Tested end-to-end against embedded Derby (tests/test_jdbc.py), whose
    MERGE is the same ANSI form Postgres 15+ speaks."""
    df = last_wins_per_key(df, key_cols, order_col)
    if not jdbc_table_exists(spark, url, table, properties):
        # first changeset bootstraps the target (a stream's batch 0, a
        # fresh environment): plain parallel append creates the table
        write_jdbc(df, url, table, mode="append", properties=properties)
        return
    staging = staging_table or f"{table}_staging"
    write_jdbc(df, url, staging, mode="overwrite", properties=properties)
    cols = df.columns
    # Spark's JDBC writer creates QUOTED (case-exact) column identifiers;
    # unquoted names would resolve case-folded (e.g. Derby → uppercase)
    # and miss them, so every identifier here is quoted to match.
    q = '"{}"'.format
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in cols if c not in key_cols)
    insert_cols = ", ".join(q(c) for c in cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
    merge_sql = (
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
    execute_jdbc(spark, url, merge_sql, properties)


def jdbc_table_exists(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> bool:
    """Whether ``table`` exists, via JDBC DatabaseMetaData (exact-case
    match first — Spark creates quoted case-exact tables — then the
    database's case-folded form for tables created outside Spark)."""
    jvm = spark.sparkContext._jvm
    if properties and "driver" in properties:
        jvm.java.lang.Class.forName(properties["driver"])
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        meta = conn.getMetaData()
        for candidate in (table, table.upper(), table.lower()):
            rs = meta.getTables(None, None, candidate, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


def execute_jdbc(
    spark: SparkSession, url: str, sql: str, properties: dict[str, str] | None = None
) -> None:
    """Run one DDL/DML statement through a driver-side JDBC connection —
    the control-plane half of the sink (MERGE, CREATE TABLE, index builds).
    Data never flows through here; bulk rows go via write_jdbc."""
    jvm = spark.sparkContext._jvm
    if properties and "driver" in properties:
        # make sure the driver class is registered with DriverManager
        jvm.java.lang.Class.forName(properties["driver"])
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 CSV snapshot sink (get_vacancies.py:224-236)."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("escape", '"')
        .option("emptyValue", "")
        .csv(path)
    )


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format LLM-corpus tooling speaks
    (one JSON object per line; WebDataset/HF-datasets-style exports).
    Spark's native json writer: task-commit atomicity, splittable files,
    timestamps serialized ISO-8601."""
    df.write.mode(mode).json(path)


def read_json_lines(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-directed JSON-lines source. The explicit schema matters at
    scale twice over: it skips the whole-file inference pass, and it keeps
    types stable when a batch happens to contain only nulls for a column
    (inference would demote it). columnNameOfCorruptRecord stays at the
    default, so malformed lines surface as nulls rather than killing the
    read (PERMISSIVE), matching the CSV source's tolerance contract."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the columnar alternative where the downstream warehouse
    is Hive/Trino-flavored. Same task-commit atomicity as parquet; ORC's
    built-in indexes (min/max per stride) give the same row-group skipping
    predicate pushdown relies on."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source. Spark pushes filters and prunes columns exactly as with
    parquet (asserted in tests/test_sinks.py)."""
    return spark.read.orc(path)




def materialization_is_fresh(path: str, source: str) -> bool:
    """True iff the derived layout at ``path`` is complete (_SUCCESS), the
    source exists, and no file of ``source`` is newer than the layout.

    The _SUCCESS marker alone is not enough for an idempotent
    materialization gate: a regenerated source under the same path would
    keep serving the stale derived data (lake layouts, ANN indexes).
    A MISSING source is "not fresh" — the caller's rebuild then fails
    loudly on read instead of silently serving orphaned derived data.
    Filesystem-metadata only — one stat per source file, no data scan, so
    the idempotent fast path stays cheap."""
    import os

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        return False
    if not os.path.exists(source):
        return False
    built_at = os.path.getmtime(marker)
    paths = [source]
    if os.path.isdir(source):
        paths = [os.path.join(source, f) for f in os.listdir(source)]
    return all(os.path.getmtime(p) <= built_at for p in paths if os.path.exists(p))

__all__ = [
    "TESTDATA_SCHEMAS",
    "load_table",
    "load_tables",
    "materialization_is_fresh",
    "read_snapshot_csv",
    "read_jdbc",
    "table_path",
    "write_csv",
    "write_parquet",
]

