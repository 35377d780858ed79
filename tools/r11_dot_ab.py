"""A/B of bit-identical dot-product fold formulations at bench shape.

cosine_topk's per-pair fold (400k pairs x dim=64 at sf0.1) is the
dominant cost of the cosine family.  Every variant below evaluates the
EXACT left-fold addition sequence (((0+t1)+t2)+...+t64) in float64 —
values must be bit-identical; this probe asserts that before timing.

Variants:
  zipagg   — current: aggregate(zip_with(a,b,*), 0.0, +)  (2 HOFs,
             intermediate 64-elem array per pair)
  seqagg   — aggregate(sequence(1,64), 0.0, (acc,i) -> acc + a[i]*b[i])
             (1 HOF, no intermediate array)
  chunk8   — aggregate(sequence(0,7), 0.0, (acc,c) -> ((acc+t1)+...+t8))
             (1 HOF, 8 iterations, 8-term unrolled inner expression)
  arrow    — mapInArrow: flat values buffer -> (B,64) float64, column-
             wise accumulation acc += a[:,i]*b[:,i] (exact fold order)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _terms(a: str, b: str, lo: int, n: int) -> str:
    return " + ".join(
        f"CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE)"
        for i in range(lo, lo + n)
    )


def main() -> None:
    from transcriptomics_data_integration_spark.session import get_spark

    spark = get_spark("r11_dot_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_vec"))
    pairs = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("cand_id"))
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    n = pairs.count()
    print("pairs:", n)

    dim = 64
    exprs = {
        "zipagg": (
            "aggregate(zip_with(q_vec, c_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        ),
        "seqagg": (
            f"aggregate(sequence(1, {dim}), CAST(0 AS DOUBLE), "
            "(acc, i) -> acc + CAST(element_at(q_vec, i) AS DOUBLE) * "
            "CAST(element_at(c_vec, i) AS DOUBLE))"
        ),
        "chunk8": (
            "aggregate(sequence(0, 7), CAST(0 AS DOUBLE), (acc, ch) -> acc + "
            + " + ".join(
                f"CAST(element_at(q_vec, ch * 8 + {j}) AS DOUBLE) * "
                f"CAST(element_at(c_vec, ch * 8 + {j}) AS DOUBLE)"
                for j in range(1, 9)
            )
            + ")"
        ),
    }

    import pyarrow as pa

    def arrow_dot(it):
        import numpy as np

        for batch in it:
            ids = batch.column("query_id")
            cids = batch.column("cand_id")
            av = batch.column("q_vec")
            bv = batch.column("c_vec")
            nb = len(batch)
            a = np.asarray(av.values, dtype=np.float64).reshape(nb, 64)
            b = np.asarray(bv.values, dtype=np.float64).reshape(nb, 64)
            acc = np.zeros(nb, dtype=np.float64)
            for i in range(64):
                acc = acc + a[:, i] * b[:, i]
            yield pa.RecordBatch.from_arrays(
                [ids, cids, pa.array(acc, type=pa.float64())],
                names=["query_id", "cand_id", "dot"],
            )

    # ---- value identity check: order-independent checksum over
    # (query_id, cand_id, repr(double)).  Spark's double->string is the
    # shortest round-tripping repr, so distinct bit patterns hash apart.
    def bitsum(col_expr):
        return (
            pairs.select(
                F.sum(
                    F.xxhash64(
                        F.col("query_id"),
                        F.col("cand_id"),
                        F.expr(col_expr).cast("string"),
                    ).cast("decimal(38,0)")
                ).alias("s")
            ).collect()[0]["s"]
        )

    sums = {}
    for name, e in exprs.items():
        sums[name] = bitsum(e)
    # arrow variant checksum
    out = pairs.mapInArrow(arrow_dot, "query_id long, cand_id long, dot double")
    sums["arrow"] = (
        out.select(
            F.sum(
                F.xxhash64(F.col("query_id"), F.col("cand_id"), F.col("dot").cast("string")).cast(
                    "decimal(38,0)"
                )
            ).alias("s")
        ).collect()[0]["s"]
    )
    print("checksums:", sums)
    assert len(set(sums.values())) == 1, "VALUE MISMATCH across variants"

    # ---- timings (min of 3, noop-style: aggregate consuming the value)
    def timeit(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name, e in exprs.items():
        t = timeit(
            lambda e=e: pairs.select(F.expr(e).alias("d"))
            .agg(F.sum("d"))
            .collect()
        )
        print(f"{name}: {t:.2f}s")
    t = timeit(
        lambda: pairs.mapInArrow(arrow_dot, "query_id long, cand_id long, dot double")
        .agg(F.sum("dot"))
        .collect()
    )
    print(f"arrow: {t:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
