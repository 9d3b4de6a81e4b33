"""Streaming entry points.

The reference's "streaming" is a Spring Cloud Stream function: one message
in → materialize → one message out (``stream/StreamFunctions.kt:180-287``) —
no watermarks, windows, or state. The Spark-native upgrade is Structured
Streaming micro-batches that reuse the SAME batch feature DAG via
``foreachBatch`` (SURVEY.md §2.8), plus a genuinely streaming sessionizer
(watermark + session_window) the reference lacks but the transcript workload
wants.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def materialize_stream(
    stream_df: DataFrame,
    model,
    columns: Sequence[str],
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint_dir: str | None = None,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Run the batch feature DAG on each micro-batch (entry point C analog).

    Within a micro-batch, per-entity window features are computed over the
    rows of that batch; cross-batch state (e.g. "latest prior turn ever")
    belongs to the feature store read-through, exactly like the reference's
    store-backed TrackableValues.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = model.materialize(batch_df, list(columns))
        if sink is not None:
            sink(out, batch_id)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_windows_stream(
    stream_df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-based sessionization with late-data handling.

    ``session_window`` merges events closer than the gap into one session
    per entity; the watermark bounds state and admits late turns up to the
    horizon. Returns one row per closed session: entity, start, end, n_turns.
    """
    # watermarks require TIMESTAMP (not NTZ); cast is identity under UTC
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(entity_col),
            F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            entity_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
        )
    )
