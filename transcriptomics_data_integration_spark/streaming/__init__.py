"""Structured Streaming seam (SURVEY.md sections 1.4, 2.8).

The reference is pure batch; its one incremental pattern is per-dataset
arrival of count files plus the idempotent registry append (S9).  This
package maps that to Spark Structured Streaming: a file source watches
an ingest directory, rows deduplicate on the dataset key, and windowed
aggregations maintain running per-gene/per-window state.
"""

from transcriptomics_data_integration_spark.streaming.ingest import (
    stream_count_files,
    streaming_window_counts,
)

__all__ = ["stream_count_files", "streaming_window_counts"]
