"""Scaling probe for sign-LSH semantic dedup (datapipe/semantic.py).

The catalog query pins ``n_bits=4`` for its fixed-text oracle, but the
honest way to scale sign-LSH is to grow the number of bucket cells with
the corpus so the EXPECTED BUCKET SIZE stays constant — then candidate
volume (the quadratic-within-bucket term) grows linearly with the data and
per-task memory is flat. This probe measures exactly that contract:

* base: the sf0.1 embeddings (5k vectors) at ``n_bits`` chosen for a
  target bucket size;
* scaled: the same vectors replicated ×N with a per-replica cyclic
  dimension rotation (within-replica pairwise cosines are EXACTLY
  preserved — rotation is a permutation applied to both sides — while
  cross-replica pairs decorrelate), at ``n_bits + log2(N)``.

Prints one JSON line {"factor": N, "base_s": ..., "scaled_s": ...,
"ratio": ..., "base_bits": b, "scaled_bits": b'}.

Usage: python tools/semantic_scale_probe.py [N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
TARGET_BUCKET = 320  # expected vectors per (table, bucket) cell


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from ihop_reddit_spark.datapipe.semantic import sign_lsh_semantic_dedup
    from ihop_reddit_spark.session import get_spark_session

    spark = get_spark_session(
        "semantic_scale_probe", config={"spark.ui.enabled": "false"}
    )
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    n = emb.count()
    dim = len(emb.select("embedding").head()["embedding"])

    def bits_for(rows: int) -> int:
        return max(1, round(math.log2(max(rows / TARGET_BUCKET, 2))))

    def run(df, n_bits: int) -> float:
        t0 = time.time()
        sign_lsh_semantic_dedup(
            df, cosine_threshold=0.4, n_bits=n_bits, dim=dim
        ).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.time() - t0, 2)

    base_bits = bits_for(n)
    base_s = run(emb, base_bits)

    reps = spark.range(factor).withColumnRenamed("id", "__r")
    rotated = emb.crossJoin(reps).select(
        (F.col("vec_id") * factor + F.col("__r")).alias("vec_id"),
        F.col("label"),
        # cyclic shift by replica index: slice(r+1..dim) ++ slice(1..r)
        F.when(F.col("__r") % dim == 0, F.col("embedding"))
        .otherwise(
            F.concat(
                F.slice(
                    F.col("embedding"),
                    (F.col("__r") % dim + 1).cast("int"),
                    (F.lit(dim) - F.col("__r") % dim).cast("int"),
                ),
                F.slice(
                    F.col("embedding"),
                    1,
                    (F.col("__r") % dim).cast("int"),
                ),
            )
        )
        .alias("embedding"),
    )
    workdir = "/tmp/spark_graft_semantic_scale"
    rotated.write.mode("overwrite").parquet(f"{workdir}/embeddings.parquet")
    scaled = spark.read.parquet(f"{workdir}/embeddings.parquet")
    scaled_bits = bits_for(n * factor)
    scaled_s = run(scaled, scaled_bits)

    print(
        json.dumps(
            {
                "factor": factor,
                "base_s": base_s,
                "scaled_s": scaled_s,
                "ratio": round(scaled_s / base_s, 2) if base_s else None,
                "base_bits": base_bits,
                "scaled_bits": scaled_bits,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
