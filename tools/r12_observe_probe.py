"""r12 — prove/disprove that Observation metrics are delivered by the
localCheckpoint(eager=True) materialization action (VERDICT r11 item 5:
fuse the CC closure's convergence sum into the checkpoint job, saving
one driver-barrier job per cycle).

Usage: python tools/r12_observe_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Observation
from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark


def main() -> None:
    spark = get_spark("r12-observe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, 1000).select(F.col("id").alias("label"))

    # 1. does obs.get unblock (and agree with a collect) after an
    #    eager localCheckpoint?
    obs = Observation("cp_sum")
    cp = df.observe(obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("s")) \
           .localCheckpoint(eager=True)
    t0 = time.time()
    got = obs.get  # blocks until delivered (or hangs -> probe fails loudly)
    dt = time.time() - t0
    direct = df.agg(F.sum(F.col("label").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
    print(f"observe-on-checkpoint: got={got} in {dt:.3f}s direct={direct}")
    assert got["s"] == direct, (got, direct)

    # 2. does the checkpointed frame still compute correctly downstream?
    n = cp.where(F.col("label") % 2 == 0).count()
    print(f"downstream count: {n}")
    assert n == 500

    # 3. repeated cycles (the closure shape): unique Observation per cycle
    labels = df
    for i in range(3):
        ob = Observation(f"cyc_{i}")
        labels = (
            labels.select((F.col("label") - 1).alias("label"))
            .where(F.col("label") >= 0)
            .observe(ob, F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
                     F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        m = ob.get
        print(f"cycle {i}: sum={m['s']} n={m['n']}")
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
