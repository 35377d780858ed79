"""r9 scale probe for the perceptual near-dup family: image dHash and
audio envelope hash at 500k items each — the codec+hash stage is the
linear Arrow map the 100 TB plan rides on; the banded hamming join
runs on the 1-row-per-item hash relation.  Dup pairs planted every
2 items (base + perturbed copy) so pair counts are predictable.

Usage: python tools/r9_perceptual_probe.py [n_items]
Prints one JSON line per probe; paste into PLANS.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from transcriptomics_data_integration_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("r9-perceptual-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    tmp = "/tmp/r9_perceptual_probe"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.range(n).select(F.col("id").alias("doc_id")).repartition(
        cores
    ).write.mode("overwrite").parquet(f"{tmp}/ids")
    ids = spark.read.parquet(f"{tmp}/ids")

    import numpy as np
    import pandas as pd

    from transcriptomics_data_integration_spark.llmdata.multimodal import (
        audio_envelope_hash,
        dhash_neardup_pairs,
        encode_png,
        encode_wav,
        image_dhash,
    )

    # ---- images: pairs (id//2 shares a base; odd ids add a one-pixel
    # perturbation).  Per-family RandomState content: a LINEAR gray
    # formula makes the horizontal gradient constant per family mod
    # 256 (only ~256 distinct dHash patterns exist — a dup storm, the
    # first probe draft measured 1.8M pairs at 20k items); independent
    # random images give the realistic sparse-dup regime instead.
    def img_op(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fam = did // 2
                g = np.random.RandomState(fam).randint(
                    0, 256, (16, 18)
                ).astype(np.int64)
                if did % 2:
                    g = g.copy()
                    g[6, 9] = (g[6, 9] + 128) % 256
                px = np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)
                rows.append((did, bytearray(encode_png(px))))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    t0 = time.perf_counter()
    images = ids.mapInPandas(img_op, schema="doc_id long, payload binary")
    hashes = image_dhash(images, "doc_id")
    hashes.write.mode("overwrite").parquet(f"{tmp}/ihash")
    t_hash = time.perf_counter() - t0
    ih = spark.read.parquet(f"{tmp}/ihash")
    t0 = time.perf_counter()
    n_pairs = dhash_neardup_pairs(ih, "doc_id", max_hamming=6).count()
    t_pairs = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": f"image_dhash_{n}",
                "hash_sec": round(t_hash, 1),
                "imgs_per_sec": int(n / t_hash),
                "pair_join_sec": round(t_pairs, 1),
                "pairs": n_pairs,
            }
        ),
        flush=True,
    )

    # ---- audio: same pair structure over 116-sample random clips ------
    def wav_op(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fam = did // 2
                s = np.random.RandomState(2**31 - fam - 1).randint(
                    -1024, 1024, 116
                ).astype(np.int64)
                if did % 2:
                    s = s.copy()
                    s[50] += 700
                rows.append(
                    (did, bytearray(encode_wav(s.astype(np.int16), rate=8000)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # 57 frames -> 56 bits: the gate's 28-bit default saturates past
    # ~1e5 items (false pairs grow ~ n^2 * 2^-k; measured 13.8k FP at
    # 20k random clips) — frame count is the capacity knob, and the
    # scale probe runs the 56-bit configuration
    t0 = time.perf_counter()
    clips = ids.mapInPandas(wav_op, schema="doc_id long, payload binary")
    ah = audio_envelope_hash(clips, "doc_id", n_frames=57)
    ah.write.mode("overwrite").parquet(f"{tmp}/ahash")
    t_hash = time.perf_counter() - t0
    ahr = spark.read.parquet(f"{tmp}/ahash")
    t0 = time.perf_counter()
    n_pairs = dhash_neardup_pairs(
        ahr, "doc_id", hash_col="ahash", max_hamming=3, n_bands=4, n_bits=56
    ).count()
    t_pairs = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": f"audio_neardup_{n}",
                "hash_sec": round(t_hash, 1),
                "clips_per_sec": int(n / t_hash),
                "pair_join_sec": round(t_pairs, 1),
                "pairs": n_pairs,
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
