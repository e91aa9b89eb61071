"""Hot-shape top-k stress: ONE query vs a large scored candidate set —
the shape where a per-query window would degenerate to a single-task
sort of the whole corpus (the 100 TB failure mode).

What it demonstrates (measured 2026-08-13, 20M rows, local[32]):
Spark's rank-limit pushdown (WindowGroupLimit, SPARK-37099) already
bounds the naive `row_number ... filter(rn<=k)` — each map task keeps
only top-k per group pre-shuffle — and beats the manual two-level
rewrite in operators/topk.py 2.4x (0.59 s vs 1.42 s). Hence the
similarity/IVF/kmeans reranks use the naive window; this script is
the regression evidence (if the ratio flips far above 1, the pushdown
broke) and also asserts the two implementations return identical rows.

Prints one JSON line:
{"metric": "topk_hot_query_speedup", "value": <single/two-level>, ...}
(value < 1 means the built-in pushdown path is winning, as expected)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_TOPK_ROWS", "20000000"))
    k = 10

    from pyspark.sql import Window as W, functions as F

    from cdc_via_flink_spark.operators.topk import two_level_topk
    from cdc_via_flink_spark.session import get_spark

    spark = get_spark("topk-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # one hot query, N candidates: deterministic pseudo-scores
    scored = (
        spark.range(n, numPartitions=32)
        .select(
            F.lit(0).cast("long").alias("query_id"),
            F.col("id").alias("vec_id"),
            ((F.col("id") * 2654435761) % 1000003 / 1000003.0).alias("cos"),
        )
    )

    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    single = (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )
    two = two_level_topk(scored, k)

    t_single = min(run(single) for _ in range(2))
    t_two = min(run(two) for _ in range(2))

    a = sorted(map(tuple, single.collect()))
    b = sorted(map(tuple, two.select("query_id", "vec_id", "cos", "rn").collect()))
    assert a == b, "two-level result differs from single-level"

    print(
        json.dumps(
            {
                "metric": "topk_hot_query_speedup",
                "value": round(t_single / t_two, 2),
                "unit": "x",
                "rows": n,
                "k": k,
                "single_level_sec": round(t_single, 2),
                "two_level_sec": round(t_two, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
