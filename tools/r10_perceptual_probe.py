"""r10 capacity probe for perceptual-hash banding: does candidate-pair
growth stay LINEAR at 5M items under the capacity-scaled multi-word
profile, where the fixed 56-bit/4x14-bit profile is quadratic-in-
practice (r9 verdict item)?

Content: non-degenerate splitmix64-mixed band words (uniform over the
key space — the WORST case for banding false positives; real corpora
cluster, which the max_bucket storm cap covers separately).  Planted
near-dup per id pair (odd id = even id's words with 3 single-bit
flips), so true-pair counts are predictable (~n/2).

Per n in {1M, 2.5M, 5M}:
  - wide profile from capacity_banding(n, max_hamming=6)
  - bucket stats -> candidate pairs sum C(bucket, 2) for BOTH the wide
    profile and the fixed 14-bit narrow profile (same content, keys
    truncated to 14 bits) — the narrow join itself is NOT run at 5M
    (3e9 candidates ~= the r9 seed-family ENOSPC failure mode)
  - the wide banded join + exact verify, timed end-to-end

Usage: python tools/r10_perceptual_probe.py [n1 n2 ...]
Prints one JSON line per n; paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark
from transcriptomics_data_integration_spark.llmdata.multimodal import (
    capacity_banding,
    hamming_neardup_pairs_wide,
)


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1_000_000, 2_500_000, 5_000_000]
    spark = get_spark("r10-perceptual-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    import numpy as np
    import pandas as pd

    for n in ns:
        n_bands, word_bits = capacity_banding(n, max_hamming=6)

        def op(batches, n_bands=n_bands, word_bits=word_bits):
            mask = (1 << word_bits) - 1
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                fam = (ids // 2).astype(np.uint64)
                words = np.empty((len(ids), n_bands), dtype=np.int64)
                for b in range(n_bands):
                    # splitmix64 of (family, band): uniform iid content
                    # words — probe content, not an LSH seed family
                    z = fam * np.uint64(8) + np.uint64(b)
                    z = (z + np.uint64(0x9E3779B97F4A7C15))
                    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                    z = z ^ (z >> np.uint64(31))
                    words[:, b] = (z & np.uint64(mask)).astype(np.int64)
                # odd ids: flip 3 deterministic single bits (bands 0-2)
                odd = (ids % 2).astype(bool)
                for b in range(3):
                    bit = (ids[odd] + b) % word_bits
                    words[odd, b] ^= (1 << bit).astype(np.int64)
                yield pd.DataFrame(
                    {"doc_id": ids, "dwords": list(words)}
                )

        hashes = (
            spark.range(n)
            .repartition(cores)
            .mapInPandas(op, schema="doc_id long, dwords array<long>")
            .persist()
        )
        hashes.count()  # materialize generation outside the timed join

        # bucket stats: candidate pairs for wide vs narrow-truncated keys
        banded = hashes.select(
            F.posexplode("dwords").alias("band", "band_key")
        )
        stats = banded.groupBy("band", "band_key").count()
        cand_wide = stats.agg(
            F.sum(F.expr("count * (count - 1) / 2")).cast("long")
        ).collect()[0][0]
        narrow = banded.select(
            "band", (F.col("band_key") % (1 << 14)).alias("nk")
        ).where(F.col("band") < 4)
        cand_narrow = (
            narrow.groupBy("band", "nk")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).cast("long"))
            .collect()[0][0]
        )

        t0 = time.time()
        pairs = hamming_neardup_pairs_wide(hashes, "doc_id", max_hamming=6)
        n_pairs = pairs.count()
        dt = time.time() - t0
        print(json.dumps({
            "probe": "r10_perceptual_capacity", "n_items": n,
            "n_bands": n_bands, "word_bits": word_bits,
            "cand_pairs_wide": int(cand_wide),
            "cand_pairs_narrow14_projected": int(cand_narrow),
            "out_pairs": int(n_pairs),
            "wide_join_sec": round(dt, 1),
            "items_per_sec": int(n / dt),
        }))
        hashes.unpersist()


if __name__ == "__main__":
    main()
