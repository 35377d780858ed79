"""JSON-lines corpus source — the de-facto interchange format for
training-data pipelines (one JSON document per line, usually gzip
shards).

Reference scope: the reference ingests external text tables
(`scripts/*/GenExpressionComb*.pl` read TSV contracts); a 100 TB text
corpus arrives as JSONL shards instead, so the engine needs the same
three ingest guarantees re-expressed for JSONL:

1. schema-projected scan (never infer on a 100 TB corpus — inference
   is a full extra pass);
2. corrupt-line CAPTURE, not silent drop (PERMISSIVE +
   columnNameOfCorruptRecord): a bad shard shows up as countable
   reject rows, and the clean/reject split is auditable;
3. required-field validation (id + text present) BEFORE anything
   downstream trusts the rows.

The scan itself is exercised on real temp files in
`tests/test_sources_streaming.py`; the parse/validate semantics are
hash-gated over the driver tables (`jsonl_parse` in the suite), where
both engines parse identically-constructed JSON strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = _CORRUPT,
) -> DataFrame:
    """Schema-projected JSONL scan with corrupt-line capture.

    ``schema`` is the DDL string of the EXPECTED fields (e.g.
    ``"doc_id LONG, text STRING, lang STRING"``); a line that fails to
    parse lands with all data fields null and the raw line preserved
    in ``corrupt_col``.  Multiline mode stays off: one document per
    line is what makes JSONL splittable — Spark assigns byte ranges of
    a shard to tasks and each task parses only its lines, so a single
    100 GB shard still fans out.  Caveat: that splitting only applies
    to UNCOMPRESSED (or splittable-codec) shards; a .gz shard is one
    task no matter its size — gzipped corpora must arrive as many
    shards sized for one task each (what :func:`write_jsonl_shards`
    produces).  Spark decompresses .gz transparently on read.
    """
    return (
        spark.read.schema(f"{schema}, {corrupt_col} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    target_shard_bytes: int = 256 << 20,
    compression: str | None = "gzip",
) -> int:
    """Size-targeted sharded JSONL sink — the output format training
    jobs consume (shard-per-worker streaming reads).

    Shard count = ceil(compressed size estimate / target), clamped to
    [1, 65536] — the Catalyst (uncompressed) plan estimate scaled by an
    approximate codec ratio when compression is on, so gzip shards land
    near ``target_shard_bytes`` instead of several-fold under it.
    Unknown estimates write with the EXISTING partitioning: a
    ``repartition(n)`` is a full round-robin shuffle even when ``n``
    equals the current partition count, so skipping it entirely is the
    only true no-shuffle fallback (r3 ADVICE finding).  Gzip by
    default: output shards are read WHOLE by downstream loaders, so
    non-splittability does not matter on the sink side — the sizing
    here is exactly what keeps each shard one worker's bite.  Returns
    the shard count used (-1 = existing partitioning, unknown count —
    resolving it would run ``df.rdd`` planning just for a log line).

    (For the scan side the rule inverts: a single huge .gz shard
    cannot be split across tasks — see :func:`read_jsonl_docs`.)
    """
    from transcriptomics_data_integration_spark.operators.windows import (
        estimated_plan_bytes,
    )

    # JSON text of natural-language docs gzips ~3-4x; a conservative
    # 3x keeps shards at-or-under target rather than far under
    _COMPRESSION_RATIO = {"gzip": 3.0, "bzip2": 4.0, "deflate": 3.0}

    est = estimated_plan_bytes(df)
    if est is None:
        out = df
        n = -1
    else:
        if compression:
            est = int(est / _COMPRESSION_RATIO.get(compression, 1.0))
        n = max(1, min(65536, -(-est // target_shard_bytes)))
        out = df.repartition(n)
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return n


def validate_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    corrupt_col: str = _CORRUPT,
) -> tuple[DataFrame, DataFrame]:
    """Split a scanned JSONL relation into (clean, rejects).

    A row is rejected when the line failed to parse OR a required
    field (id, text) is missing — the three ways shards rot in
    practice.  ``clean`` drops the corrupt column; ``rejects`` keeps
    it plus a ``reject_reason`` so the audit trail aggregates by
    cause.  Pure column predicates — the split is two filters over
    one scan, no shuffle.
    """
    parse_failed = F.col(corrupt_col).isNotNull()
    no_id = F.col(id_col).isNull()
    no_text = F.col(text_col).isNull()
    is_bad = parse_failed | no_id | no_text
    clean = df.where(~is_bad).drop(corrupt_col)
    rejects = df.where(is_bad).withColumn(
        "reject_reason",
        F.when(parse_failed, F.lit("parse_error"))
        .when(no_id, F.lit("missing_id"))
        .otherwise(F.lit("missing_text")),
    )
    return clean, rejects
