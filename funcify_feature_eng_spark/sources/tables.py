"""Table readers/writers: Iceberg-first with transparent parquet fallback.

The engine targets Iceberg transcript tables (BASELINE.json north_rule). In
environments without an Iceberg catalog (this sandbox) the same call reads a
parquet path — one code path, different format, as planned in SURVEY.md §7.1.

Reference analogs: S1/S2 data-element scans
(``gql-data-source/.../ServiceBackedDataElementSourceCallable.kt:92-110``)
become table scans with *selections* = column pruning and *arguments* =
pushed-down filters; S5 CSV scan
(``beam/.../NetflixMoviesTvShowsFeaturesPipeline.kt:61-120``) becomes
``read_netflix_csv`` with the reference's reshaping rules inlined as native
column expressions (``stream/StreamFunctions.kt:289-375``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _is_path(location: str) -> bool:
    return (
        "/" in location
        or location.endswith(".parquet")
        or location.endswith(".orc")
        or location.startswith("file:")
    )


_PATH_FORMATS = ("parquet", "orc")


def read_table(
    spark: SparkSession,
    location: str,
    columns: Sequence[str] | None = None,
    predicate: Column | str | None = None,
    file_format: str = "parquet",
) -> DataFrame:
    """Scan an Iceberg table name or a parquet/ORC path.

    ``columns``/``predicate`` express the reference's selection-set projection
    (P1) and argument pushdown — both reach the scan via Catalyst
    (ColumnPruning / PushDownPredicates → file and partition pruning).
    ``file_format`` selects the path reader (ignored for table names, whose
    format the catalog owns): ``parquet`` (default) or ``orc`` — both
    columnar, both with predicate pushdown and column pruning in Spark's
    native vectorized readers.
    """
    if file_format not in _PATH_FORMATS:
        raise ValueError(
            f"file_format must be one of {_PATH_FORMATS}, got {file_format!r}"
        )
    if _is_path(location):
        df = spark.read.format(file_format).load(location)
    else:
        df = spark.read.table(location)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "append",
    partition_by: Sequence[str] = (),
    file_format: str = "parquet",
) -> None:
    """Append/overwrite to an Iceberg table or parquet/ORC path."""
    if file_format not in _PATH_FORMATS:
        raise ValueError(
            f"file_format must be one of {_PATH_FORMATS}, got {file_format!r}"
        )
    if _is_path(location):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format(file_format).save(location)
    else:
        w = df.writeTo(location)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()


def read_transcripts(
    spark: SparkSession,
    location: str,
    conv_ids: Sequence[str] | None = None,
    min_ts: str | None = None,
    max_ts: str | None = None,
) -> DataFrame:
    """The canonical transcript source with pushdown-friendly filters.

    Filtering the spine on conv_id/ts BEFORE any join/window is the engine's
    equivalent of the reference pushing argument values into the source call
    (SURVEY.md §4 predicate pushdown row).
    """
    df = read_table(spark, location)
    if conv_ids is not None:
        df = df.filter(F.col("conv_id").isin(list(conv_ids)))
    if min_ts is not None:
        df = df.filter(F.col("ts") >= F.lit(min_ts).cast("timestamp"))
    if max_ts is not None:
        df = df.filter(F.col("ts") < F.lit(max_ts).cast("timestamp"))
    return df


def ingest_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 64,
    sort_cols: Sequence[str] = ("conv_id", "turn_idx", "ts"),
) -> None:
    """One-time ingest into a bucketed+sorted table (the 100 TB layout).

    Downstream per-entity windows and as-of merges over a table bucketed by
    the entity key and sorted by (entity, time) need NO exchange — the
    feature pass becomes embarrassingly parallel per bucket. On Iceberg the
    equivalent is a ``bucket(N, conv_id)`` partition transform + sorted
    write order.

    The pre-write ``repartition(n_buckets, bucket_col)`` guarantees ONE
    file per bucket: Spark's scan reports its outputOrdering (and elides
    the window SORT, not just the exchange) only in that layout — with
    multiple files per bucket their sorted runs interleave and every query
    re-sorts. At 100 TB keep one file per bucket per partition (compaction
    policy), not one global file.
    """
    (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_netflix_csv(spark: SparkSession, path: str) -> DataFrame:
    """Reference corpus reader with the observable reshaping semantics of
    ``stream/StreamFunctions.kt:289-375`` as native expressions:
    split ``cast``/``listed_in`` on ", ", regex-parse ``duration`` into
    minutes vs seasons, int-coerce ``release_year``."""
    from funcify_feature_eng_spark.functions.scalars import (
        parse_duration_minutes,
        parse_num_seasons,
        split_list,
    )

    raw = spark.read.csv(path, header=True, escape='"', multiLine=True)
    return raw.select(
        F.col("show_id"),
        F.col("type"),
        F.col("title"),
        F.col("director"),
        split_list(F.col("cast")).alias("cast"),
        F.col("country"),
        F.to_date(F.col("date_added"), "MMMM d, yyyy").alias("date_added"),
        F.col("release_year").cast("int").alias("release_year"),
        F.col("rating"),
        parse_duration_minutes(F.col("duration")).alias("duration_min"),
        parse_num_seasons(F.col("duration")).alias("num_seasons"),
        split_list(F.col("listed_in")).alias("listed_in"),
        F.col("description"),
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    *,
    columns: Sequence[str] | None = None,
    predicate: Column | str | None = None,
    permissive: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan with a DECLARED schema (S5's other classic shape
    beside the CSV path; the reference's serialized-document sources are
    jackson-typed the same way).

    The schema is required, never inferred: ``inferSchema`` costs an
    extra full pass over the corpus and lets types drift between ingest
    batches — at 100 TB both are disqualifying. ``columns``/``predicate``
    express P1 projection + pushdown exactly like :func:`read_table`
    (JSON scans prune parsed fields via Catalyst's schema pruning).

    ``permissive=False`` (default) is FAILFAST: a malformed line fails
    the job loudly. ``permissive=True`` appends ``corrupt_col`` holding
    each malformed raw line (NULL elsewhere) — the quarantine flow, same
    convention as ``plans/validation``'s value-level quarantine.
    """
    if permissive:
        from pyspark.sql.types import StringType, StructType

        if not isinstance(schema, StructType):
            raise ValueError("read_jsonl: permissive mode needs a StructType schema")
        schema = StructType(list(schema.fields)).add(corrupt_col, StringType())
        reader = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
        )
    else:
        reader = spark.read.schema(schema).option("mode", "FAILFAST")
    df = reader.json(path)
    if predicate is not None:
        if permissive:
            # the predicate applies to VALID rows only: a malformed line
            # parses to all-NULL declared fields + corrupt_col, where the
            # predicate evaluates NULL and a bare filter() would silently
            # drop the very rows quarantine mode exists to surface
            pred = predicate if isinstance(predicate, Column) else F.expr(predicate)
            df = df.filter(pred | F.col(corrupt_col).isNotNull())
        else:
            df = df.filter(predicate)
    if columns:
        cols = list(columns)
        if permissive and corrupt_col not in cols:
            # projection must not silently drop the quarantine column
            cols.append(corrupt_col)
        df = df.select(*cols)
    return df
