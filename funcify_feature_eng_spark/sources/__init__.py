"""Data-element sources: table readers with the reference's source semantics."""

from funcify_feature_eng_spark.sources.tables import (
    read_table,
    read_transcripts,
    write_table,
)

__all__ = ["read_table", "read_transcripts", "write_table"]
