"""Realistic-payload CEL scan probe (r4 verdict item 4 evidence).

Generates N synthetic CEL v4 payloads at U133-class cell counts
(default 100 payloads x 1100x1100 = 1.21 M cells, ~12 MB each)
INSIDE executors via mapInPandas — the ~1.2 GB of binary never routes
through the driver — then times `cel_long` + a per-sample aggregate
over the resulting ~121 M-cell long relation.

Usage: python tools/cel_scale_probe.py [n_payloads] [grid_side]
Prints one JSON line with the measured decode rates.
"""
from __future__ import annotations

import json
import struct
import sys
import time

sys.path.insert(0, ".")


def make_cel_payload(sample_id: int, side: int) -> bytes:
    import numpy as np

    ncells = side * side
    header = struct.pack("<5i", 64, 4, side, side, ncells)
    body = b"".join(
        struct.pack("<i", len(s)) + s
        for s in (b"hdr", b"probe-gen", b"")
    )
    tail = struct.pack("<i3i", 1, 0, 0, 0)
    rng = np.random.default_rng(sample_id)
    cells = np.empty(ncells, dtype=[("i", "<f4"), ("s", "<f4"), ("n", "<i2")])
    cells["i"] = rng.uniform(10.0, 65000.0, ncells).astype("<f4")
    cells["s"] = rng.uniform(0.1, 100.0, ncells).astype("<f4")
    cells["n"] = rng.integers(9, 49, ncells).astype("<i2")
    return header + body + tail + cells.tobytes()


def main() -> None:
    n_payloads = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 1100

    import pandas as pd
    from pyspark.sql import functions as F

    from transcriptomics_data_integration_spark.session import get_spark
    from transcriptomics_data_integration_spark.sources.cel import cel_long

    spark = get_spark("cel-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        for pdf in batches:
            for sid in pdf["id"]:
                yield pd.DataFrame(
                    {"sample_id": [int(sid)], "payload": [make_cel_payload(int(sid), side)]}
                )

    media = (
        spark.range(n_payloads)
        .repartition(32)
        .mapInPandas(gen, schema="sample_id bigint, payload binary")
    )

    t0 = time.perf_counter()
    out = (
        cel_long(media)
        .groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.avg("intensity").alias("mean_i"),
            F.max("cell_y").alias("max_y"),
        )
        .collect()
    )
    wall = time.perf_counter() - t0
    total_cells = sum(r["n_cells"] for r in out)
    assert len(out) == n_payloads and all(r["n_cells"] == side * side for r in out)
    print(
        json.dumps(
            {
                "n_payloads": n_payloads,
                "cells_per_payload": side * side,
                "total_cells": total_cells,
                "wall_sec": round(wall, 2),
                "cells_per_sec": int(total_cells / wall),
                "note": "includes executor-side payload generation",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
