"""Streaming sustained-rate probe (r5 verdict item 8): drive the two
stateful streaming kernels through >= 20 file-arrival micro-batches and
record per-batch wall, rows/s, and state-store size from the query's
StreamingQueryProgress — the evidence that throughput HOLDS and state
stays BOUNDED as the stream ages.

    python tools/streaming_rate_probe.py [n_batches] [rows_per_batch]

Prints one JSON line per kernel:
  {"kernel": ..., "batches": N, "rows_per_batch": R,
   "rows_per_sec_first5": ..., "rows_per_sec_last5": ...,
   "state_rows_batch5": ..., "state_rows_final": ...,
   "state_mb_final": ..., "pairs_out"/"sessions_out": ...}
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def drive(spark, make_stream, write_batch, n_batches, rows_per_batch, name):
    d = tempfile.mkdtemp(prefix=f"rate_{name}_")
    try:
        write_batch(d, 0)  # schema seed
        out = make_stream(spark, d)
        q = (
            out.writeStream.outputMode(
                "update" if name == "sessionize" else "append"
            )
            .format("memory")
            .queryName(f"rate_{name}")
            .option("checkpointLocation", f"{d}/_ckpt")
            .start()
        )
        walls, states = [], []
        try:
            q.processAllAvailable()
            for b in range(1, n_batches):
                write_batch(d, b)
                t0 = time.perf_counter()
                q.processAllAvailable()
                walls.append(time.perf_counter() - t0)
                p = q.lastProgress
                so = (p.get("stateOperators") or [{}])[0] if p else {}
                states.append(
                    (
                        so.get("numRowsTotal"),
                        so.get("stateMemory")
                        or so.get("memoryUsedBytes")
                        or 0,
                    )
                )
            n_out = spark.sql(f"SELECT COUNT(*) AS n FROM rate_{name}").collect()[0]["n"]
        finally:
            q.stop()
        r5 = rows_per_batch * 5
        return {
            "kernel": name,
            "batches": n_batches,
            "rows_per_batch": rows_per_batch,
            "rows_per_sec_first5": int(r5 / sum(walls[:5])),
            "rows_per_sec_last5": int(r5 / sum(walls[-5:])),
            "state_rows_batch5": states[4][0],
            "state_rows_final": states[-1][0],
            "state_mb_final": round((states[-1][1] or 0) / 1e6, 2),
            "rows_out": n_out,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from transcriptomics_data_integration_spark.session import get_spark
    from transcriptomics_data_integration_spark.streaming.ingest import (
        streaming_minhash_neardup,
        streaming_sessionize,
    )

    spark = get_spark("streaming-rate-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- sessionize: 2k users, timestamps advance 60 s per batch with
    # a 30-min gap every 5 batches so sessions both extend and close
    n_users = 2000

    def write_sess(d, b):
        gap = (b // 5) * 3600
        rows = "\n".join(
            f"{i % n_users}\t{(b * 60 + gap) * 1_000_000_000 + (i // n_users) * 1000 + i}"
            for i in range(rows_per_batch)
        )
        with open(f"{d}/b{b:04d}.tsv", "w") as fh:
            fh.write("user_id\tts\n" + rows + "\n")

    def make_sess(spark, d):
        stream = (
            spark.readStream.schema("user_id long, ts long")
            .option("sep", "\t")
            .option("header", True)
            .option("maxFilesPerTrigger", 1)
            .csv(d)
        )
        return streaming_sessionize(stream, "user_id", "ts")

    print(
        json.dumps(
            drive(spark, make_sess, write_sess, n_batches, rows_per_batch, "sessionize")
        ),
        flush=True,
    )

    # ---- minhash near-dup: fresh docs each batch + 5% replayed text
    # from the previous batch (cross-batch dups the state must catch)
    mh_rpb = max(rows_per_batch // 10, 500)  # sig UDF is md5-per-shingle

    def _text(seed: int) -> str:
        # 12 hash-diverse words: distinct docs share almost no shingles
        return " ".join(f"w{(seed * 31 + j * 7919) % 999983}" for j in range(12))

    def write_mh(d, b):
        rpb = mh_rpb
        lines = []
        for i in range(rpb):
            doc_id = b * rpb + i
            if i % 20 == 0 and b > 0:
                # 5% replays of the PREVIOUS batch's text — cross-batch
                # dups the bucket state must catch
                text = _text((b - 1) * rpb + i)
            else:
                text = _text(doc_id)
            lines.append(f"{doc_id}\t{text}")
        with open(f"{d}/b{b:04d}.tsv", "w") as fh:
            fh.write("doc_id\ttext\n" + "\n".join(lines) + "\n")

    def make_mh(spark, d):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("sep", "\t")
            .option("header", True)
            .option("maxFilesPerTrigger", 1)
            .csv(d)
        )
        return streaming_minhash_neardup(stream, "doc_id", "text")

    print(
        json.dumps(
            drive(spark, make_mh, write_mh, n_batches, mh_rpb, "minhash_neardup")
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
