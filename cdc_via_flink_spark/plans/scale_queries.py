"""Scale-technique queries: IVF ANN probing (X2) and salted two-stage
aggregation (the skew idiom). Both produce results identical to their
naive forms — the point is the PLAN (bounded probes; no hot-key
reducer) — so the oracles state the naive equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_via_flink_spark.operators.ivf import ivf_topk
from cdc_via_flink_spark.plans.parity import dec
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table

SQL_VD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )


def _ivf_topk_oracle(q_below: int = 5) -> str:
    """The IVF probe as pure SQL, parameterized by the query-id bound
    (stream_ivf_probe serves vec_id < 10; the batch family uses 5)."""
    return _IVF_TOPK_ORACLE.replace("WHERE vec_id < 5", f"WHERE vec_id < {q_below}", 1)


_IVF_TOPK_ORACLE = f"""
WITH d AS (SELECT vec_id, {SQL_VD} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM d WHERE vec_id % 40 = 0),
asg AS (
  SELECT vec_id, v, cluster_id FROM (
    SELECT d.vec_id, d.v, c.centroid_id AS cluster_id,
           row_number() OVER (PARTITION BY d.vec_id
               ORDER BY {_cos('d.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM d CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM asg WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, cluster_id FROM (
    SELECT q.query_id, q.qv, c.centroid_id AS cluster_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id, {_cos('a.v', 'p.qv')} AS cos
  FROM asg a JOIN probes p ON a.cluster_id = p.cluster_id
   AND a.vec_id <> p.query_id
)
SELECT query_id, vec_id, cos, CAST(rn AS BIGINT) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rn
  FROM cand
) WHERE rn <= 5
"""


@query(
    "sim_ivf_topk",
    oracle=_IVF_TOPK_ORACLE,
    tags=("X2", "similarity", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: corpus partitioned into inverted lists by nearest
    (selection-based, deterministic) centroid; each query probes its 2
    closest lists and exact-reranks only those. Corpus assignment is a
    broadcast cross-score (no corpus shuffle); probing is a bounded
    equi-join — the 100 TB-shaped ANN plan."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, query_ids_below=5, every_k=40, nprobe=2, k=5)


@query(
    "sim_ivf_recall_sweep",
    oracle=f"""
WITH d AS (SELECT vec_id, {SQL_VD} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM d WHERE vec_id % 40 = 0),
asg AS (
  SELECT vec_id, v, cluster_id FROM (
    SELECT d.vec_id, d.v, c.centroid_id AS cluster_id,
           row_number() OVER (PARTITION BY d.vec_id
               ORDER BY {_cos('d.v', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM d CROSS JOIN c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM asg WHERE vec_id < 5),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, a.vec_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_cos('a.v', 'q.qv')} DESC, a.vec_id) AS rn
    FROM d a CROSS JOIN q WHERE a.vec_id <> q.query_id
  ) WHERE rn <= 5
),
pr AS (
  SELECT query_id, qv, cluster_id, rn FROM (
    SELECT q.query_id, q.qv, c.centroid_id AS cluster_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_cos('q.qv', 'c.cv')} DESC, c.centroid_id) AS rn
    FROM q CROSS JOIN c
  )
),
cand AS (
  SELECT np.np AS nprobe, p.query_id, a.vec_id, {_cos('a.v', 'p.qv')} AS cos
  FROM (VALUES (1), (2), (4)) np(np)
  JOIN pr p ON p.rn <= np.np
  JOIN asg a ON a.cluster_id = p.cluster_id AND a.vec_id <> p.query_id
),
ivf AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT nprobe, query_id, vec_id,
           row_number() OVER (PARTITION BY nprobe, query_id
               ORDER BY cos DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn <= 5
),
h AS (
  SELECT i.nprobe, i.query_id, count(*) AS hits
  FROM ivf i JOIN exact e
    ON i.query_id = e.query_id AND i.vec_id = e.vec_id
  GROUP BY i.nprobe, i.query_id
)
SELECT CAST(n.np AS BIGINT) AS nprobe, q.query_id,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       round(CAST(COALESCE(h.hits, 0) AS DOUBLE) / 5.0, 6) AS recall_at_5
FROM (VALUES (1), (2), (4)) n(np)
CROSS JOIN q
LEFT JOIN h ON h.nprobe = n.np AND h.query_id = q.query_id
""",
    tags=("X2", "similarity", "ivf", "recall"),
)
def sim_ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality sweep: recall@5 of the IVF probe vs the exact
    brute-force ground truth, per query, at nprobe ∈ {1, 2, 4} — the
    tuning curve every ANN deployment needs (probe budget vs recall).
    At production scale the index (centroids + assignment) is built
    once and shared across the sweep; here each nprobe re-derives it
    from the same deterministic selection so the whole curve remains
    SQL-oracle-checkable."""
    from cdc_via_flink_spark.operators.similarity import brute_force_topk

    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(e, qs, k=5).select("query_id", "vec_id")
    q_ids = qs.select("query_id")
    parts = []
    for nprobe in (1, 2, 4):
        ivf = ivf_topk(e, query_ids_below=5, every_k=40, nprobe=nprobe, k=5).select(
            "query_id", "vec_id"
        )
        hits = (
            ivf.join(exact, ["query_id", "vec_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        parts.append(
            q_ids.join(hits, "query_id", "left").select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                "query_id",
                F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.withColumn(
        "recall_at_5", F.round(F.col("hits").cast("double") / 5.0, 6)
    )


@query(
    "q_salted_agg",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(min("value") AS DOUBLE) AS min_value,
       CAST(max("value") AS DOUBLE) AS max_value
FROM events GROUP BY event_type
""",
    tags=("A3", "skew", "salting"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation — the hot-key idiom: stage 1
    aggregates (key, salt) so a skewed key spreads over 16 reducers,
    stage 2 combines the partials. Result is provably identical to the
    naive groupBy (the oracle), only the distribution differs. events'
    5 event_types on 32 partitions IS the skew shape this fixes."""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(dec(F.col("value"))).alias("p_sum"),
            F.min("value").alias("p_min"),
            F.max("value").alias("p_max"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("p_n").alias("n"),
        F.sum("p_sum").cast("double").alias("sum_value"),
        F.min("p_min").alias("min_value"),
        F.max("p_max").alias("max_value"),
    )


@query(
    "q_salted_join",
    oracle="""
SELECT e.event_type, count(*) AS n,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.event_type
""",
    tags=("J3", "skew", "salting"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join — the hot-key join idiom AQE's skew splitting
    automates, stated explicitly: the (possibly skewed) fact side gets
    a deterministic salt; the dimension side is replicated once per
    salt value, so one hot join key fans out over N_SALTS reducers
    instead of one straggler. Identical rows to the plain equi-join
    (the oracle); only the shuffle distribution differs."""
    n_salts = 8
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_salt", (F.col("event_id") % n_salts).cast("int")
    )
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .crossJoin(F.broadcast(salts))
    )
    return (
        ev.join(
            cust,
            (F.col("user_id") == F.col("c_custkey")) & (ev._salt == cust._salt),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("c_acctbal"))).cast("double").alias("sum_bal"),
        )
    )


@query(
    "sim_ivf_persisted_topk",
    oracle=_IVF_TOPK_ORACLE,
    tags=("X2", "similarity", "ivf", "index-persistence"),
)
def sim_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL index lifecycle: build the IVF index, PERSIST it
    (centroids + cluster-partitioned inverted lists), reload from
    disk, probe — value-identical to the in-memory sim_ivf_topk, so
    both share one oracle. The point at 100 TB: probing a loaded index
    joins the cluster-partitioned parquet against the broadcast probe
    set, so DYNAMIC PARTITION PRUNING restricts the scan to the probed
    lists' files (pinned in tests/test_plans.py) — queries never read
    the rest of the index."""
    import os

    from cdc_via_flink_spark.operators.ivf import (
        load_index,
        probe_index,
        save_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = f"/root/repo/.tmp/ivf_index_{sf_name}"
    save_index(e, path, every_k=40)
    assigned, cents = load_index(spark, path)
    return probe_index(assigned, cents, query_ids_below=5, nprobe=2, k=5)


@query(
    "sim_ivf_append_topk",
    oracle=_IVF_TOPK_ORACLE,
    tags=("X2", "similarity", "ivf", "index-maintenance", "streaming"),
)
def sim_ivf_append_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ANN index maintenance, value-pinned: build the
    persisted IVF index over HALF the corpus (even vec_ids — the
    stride-40 centroid set lives entirely in that half), then stream
    the other half through the incremental maintainer
    (streaming/ann_maintenance.py) in TWO micro-batches — each batch
    map-side-assigned to the FIXED centroids and committed as an
    atomic cluster-partitioned delta — and probe the maintained
    (base ∪ deltas) view. Because the centroid set is unchanged, the
    probe must be value-identical to probing a MONOLITHIC index built
    over the full corpus: the oracle is sim_ivf_topk's, unchanged —
    a maintenance bug (lost delta, double-applied epoch, wrong
    routing) breaks the hash."""
    import os
    import shutil

    from pyspark.sql.types import StructType

    from cdc_via_flink_spark.operators.ivf import probe_index, save_index
    from cdc_via_flink_spark.plans.streaming_queries import (
        STAGE_ROOT,
        _stage_ordered_files,
    )
    from cdc_via_flink_spark.streaming.ann_maintenance import (
        ann_maintenance_query,
        read_maintained_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(STAGE_ROOT, f"ivf_maint_{sf_name}")
    ckpt = os.path.join(STAGE_ROOT, f"ivf_maint_ckpt_{sf_name}")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)

    arrivals = os.path.join(STAGE_ROOT, f"ivf_maint_in_{sf_name}")
    _stage_ordered_files(
        spark,
        [
            e.filter(F.col("vec_id") % 4 == 1),
            e.filter(F.col("vec_id") % 4 == 3),
        ],
        arrivals,
    )
    schema = StructType.fromDDL("vec_id long, embedding array<float>")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
    )
    ann_maintenance_query(stream, path, ckpt).awaitTermination()

    assigned, cents = read_maintained_index(spark, path)
    return probe_index(assigned, cents, query_ids_below=5, nprobe=2, k=5)


@query(
    "sim_ivf_compacted_topk",
    oracle=_IVF_TOPK_ORACLE,
    tags=("X2", "similarity", "ivf", "index-maintenance", "compaction"),
)
def sim_ivf_compacted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index COMPACTION, value-pinned (the Delta OPTIMIZE / FAISS
    merge step of the index lifecycle): run the same build-half /
    stream-the-rest maintenance as sim_ivf_append_topk, then FOLD the
    committed deltas into the base lists
    (streaming/ann_maintenance.py::compact_maintained_index — marker-
    guarded two-rename swap, crash-recoverable, epoch high-water
    preserved) and probe the compacted single-layout index. The oracle
    is unchanged from sim_ivf_topk: compaction must be a pure physical
    rewrite — any lost/duplicated row breaks the hash. After folding,
    the deltas are gone (asserted) and a probe touches one layout."""
    import os
    import shutil

    from pyspark.sql.types import StructType

    from cdc_via_flink_spark.operators.ivf import probe_index, save_index
    from cdc_via_flink_spark.plans.streaming_queries import (
        STAGE_ROOT,
        _stage_ordered_files,
    )
    from cdc_via_flink_spark.streaming.ann_maintenance import (
        ann_maintenance_query,
        committed_delta_dirs,
        compact_maintained_index,
        read_maintained_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(STAGE_ROOT, f"ivf_compact_{sf_name}")
    ckpt = os.path.join(STAGE_ROOT, f"ivf_compact_ckpt_{sf_name}")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)
    arrivals = os.path.join(STAGE_ROOT, f"ivf_compact_in_{sf_name}")
    _stage_ordered_files(
        spark,
        [
            e.filter(F.col("vec_id") % 4 == 1),
            e.filter(F.col("vec_id") % 4 == 3),
        ],
        arrivals,
    )
    schema = StructType.fromDDL("vec_id long, embedding array<float>")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
    )
    ann_maintenance_query(stream, path, ckpt).awaitTermination()

    folded = compact_maintained_index(spark, path)
    assert folded["deltas_folded"] == 2, folded
    assert committed_delta_dirs(path) == []
    assigned, cents = read_maintained_index(spark, path)
    return probe_index(assigned, cents, query_ids_below=5, nprobe=2, k=5)


@query(
    "sim_ivf_ndcg",
    oracle=f"""
WITH ivf AS ({_IVF_TOPK_ORACLE}),
d2 AS (SELECT vec_id, {SQL_VD} AS v FROM embeddings),
q2 AS (SELECT vec_id AS query_id, v FROM d2 WHERE vec_id < 5),
exact AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT q2.query_id, a.vec_id,
           row_number() OVER (PARTITION BY q2.query_id
               ORDER BY {_cos('a.v', 'q2.v')} DESC, a.vec_id) AS rn
    FROM d2 a CROSS JOIN q2 WHERE a.vec_id <> q2.query_id
  ) WHERE rn <= 5
),
gains AS (
  SELECT i.query_id,
         CAST(sum(CAST(round(
           CASE WHEN e.vec_id IS NOT NULL
                THEN 1.0 / ln(i.rn + 1) ELSE 0 END, 9)
           AS DECIMAL(28,9))) AS DOUBLE) AS dcg
  FROM ivf i
  LEFT JOIN exact e ON e.query_id = i.query_id AND e.vec_id = i.vec_id
  GROUP BY i.query_id
),
ideal AS (
  SELECT query_id,
         CAST(sum(CAST(round(1.0 / ln(rn + 1), 9) AS DECIMAL(28,9)))
              AS DOUBLE) AS idcg
  FROM exact GROUP BY query_id
)
SELECT g.query_id, round(g.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
       round(g.dcg / i.idcg, 6) AS ndcg
FROM gains g JOIN ideal i ON g.query_id = i.query_id
""",
    tags=("X2", "ivf", "evaluation", "ndcg"),
)
def sim_ivf_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the IVF index against exact ground truth — ranking
    evaluation as a first-class declared operator (the IR metric a
    retrieval pipeline tracks per index build): binary relevance
    (candidate is in the exact top-5), DCG with 1/ln(rank+1) discounts
    summed decimal-exact, normalized by the ideal DCG. Both the index
    result and the truth are relationally derived, so the metric
    itself carries a full SQL oracle — unlike the recall floors of the
    trained-index queries, this is exact-hash end to end."""
    from pyspark.sql import Window as W

    from cdc_via_flink_spark.operators.ivf import ivf_topk
    from cdc_via_flink_spark.operators.similarity import brute_force_topk

    e = load_table(spark, sf_dir, "embeddings")
    ivf = ivf_topk(e, query_ids_below=5, every_k=40, nprobe=2, k=5)
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(e, qs, k=5).select(
        "query_id", F.col("vec_id").alias("evec"), F.col("rn").alias("ern")
    )
    term = F.round(
        F.when(F.col("evec").isNotNull(), 1.0 / F.log(F.col("rn") + 1)).otherwise(
            0.0
        ),
        9,
    ).cast("decimal(28,9)")
    gains = (
        ivf.join(
            exact,
            (ivf.query_id == exact.query_id) & (ivf.vec_id == exact.evec),
            "left",
        )
        .drop(exact.query_id)
        .groupBy("query_id")
        .agg(F.sum(term).cast("double").alias("dcg"))
    )
    ideal = exact.groupBy("query_id").agg(
        F.sum(F.round(1.0 / F.log(F.col("ern") + 1), 9).cast("decimal(28,9)"))
        .cast("double")
        .alias("idcg")
    )
    return gains.join(ideal, "query_id").select(
        "query_id",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


def _z16_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of the Morton interleave below."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def _z16(x, y, bits: int = 16):
    """Morton/Z-order interleave of two ``bits``-bit keys — pure
    integer bit expressions (2·bits shift-and-mask terms, whole-stage
    codegen). x rides the odd (higher) positions, y the even."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
        )
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i
        )
    return z


_ZB = 8  # per-column code width: 256 range buckets per dimension


def _scale_sql(x: str, mn: str, mx: str) -> str:
    """Map x over [mn, mx] onto the 8-bit code space (integer-exact in
    double: products stay far below 2^53)."""
    return f"CAST(floor(({x} - {mn}) * {1 << _ZB} / ({mx} - {mn} + 1)) AS BIGINT)"


@query(
    "q_zorder_layout",
    oracle=f"""
WITH mm AS (
  SELECT min(l_partkey) AS pk_mn, max(l_partkey) AS pk_mx,
         min(l_suppkey) AS sk_mn, max(l_suppkey) AS sk_mx
  FROM lineitem
),
z AS (
  SELECT l_partkey, l_suppkey,
         {_z16_sql(_scale_sql('l_partkey', 'mm.pk_mn', 'mm.pk_mx'),
                   _scale_sql('l_suppkey', 'mm.sk_mn', 'mm.sk_mx'),
                   bits=_ZB)} AS zval
  FROM lineitem CROSS JOIN mm
),
b AS (SELECT zval >> 10 AS zbucket, l_partkey, l_suppkey FROM z)
SELECT zbucket,
       count(*) AS n_rows,
       min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
       min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max,
       max(l_partkey) - min(l_partkey) AS pk_span,
       max(l_suppkey) - min(l_suppkey) AS sk_span
FROM b GROUP BY zbucket
""",
    tags=("ext", "layout", "zorder", "data-skipping"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER data layout (Delta `OPTIMIZE ... ZORDER BY` / Iceberg
    sort-order analog, on plain expressions): range-SCALE the two
    predicate columns onto a common 8-bit code space (raw-value
    interleave is a known z-order trap — with unequal key domains the
    top interleaved bits all come from the wider column and the second
    column never clusters; tests/test_zorder.py demonstrates it on
    parquet footer stats), Morton-interleave the codes into one
    clustering key, and profile the file-sized buckets a zval-sorted
    rewrite would produce — per bucket the MIN/MAX of BOTH columns and
    their spans, i.e. exactly the parquet row-group statistics that
    make data-skipping work. The point at 100 TB: a linear sort
    clusters only its leading column; the Z-curve keeps BOTH spans
    narrow, so selective predicates on EITHER column prune most files.
    The min/max scale constants ride a broadcast 1-row aggregate (no
    driver action); the interleave is 2·8 shift-and-mask integer terms
    — whole-stage codegen, map-side; the bucket profile is one hash
    aggregate. Writing the layout is then
    `df.repartitionByRange(F.col('zval')).sortWithinPartitions('zval')
    .write...` — exercised with footer-stats assertions in
    tests/test_zorder.py."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_partkey").alias("pk_mn"),
        F.max("l_partkey").alias("pk_mx"),
        F.min("l_suppkey").alias("sk_mn"),
        F.max("l_suppkey").alias("sk_mx"),
    )

    def scale(x, mn, mx):
        return F.floor(
            (x - mn) * (1 << _ZB) / (mx - mn + F.lit(1))
        ).cast("long")

    z = li.crossJoin(F.broadcast(mm)).select(
        "l_partkey",
        "l_suppkey",
        _z16(
            scale(F.col("l_partkey"), F.col("pk_mn"), F.col("pk_mx")),
            scale(F.col("l_suppkey"), F.col("sk_mn"), F.col("sk_mx")),
            bits=_ZB,
        ).alias("zval"),
    )
    return (
        z.withColumn("zbucket", F.shiftright(F.col("zval"), 10))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk_span"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("sk_span"),
        )
    )


@query(
    "q_interval_overlap_binned",
    oracle="""
WITH iv AS (
  SELECT l_suppkey AS sk,
         l_orderkey * 10 + l_linenumber AS id,
         l_shipdate AS s,
         l_shipdate + INTERVAL (1 + l_linenumber * 3) DAY AS e
  FROM lineitem
)
SELECT a.sk AS suppkey, CAST(count(*) AS BIGINT) AS overlap_pairs
FROM iv a JOIN iv b
  ON a.sk = b.sk AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
GROUP BY a.sk
""",
    tags=("J4", "interval-join", "binning"),
)
def q_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP SELF-JOIN via TEMPORAL BINNING — the classic
    "how many concurrent shipments per supplier" range self-join
    (shipment window = shipdate + 1..22 days, derived
    deterministically from the line number). The oracle states the
    quadratic theta-join; the Spark plan NEVER runs one: each
    interval explodes into the month bins it covers (≤ 2 here — bin
    width chosen ≥ max interval length), candidates come from an
    EQUI-join on (supplier, bin), and each overlapping pair is
    counted EXACTLY ONCE by crediting it to the month of
    greatest(start_a, start_b) — a bin both intervals provably cover,
    so no DISTINCT pass is needed.

    Scale shape: pair work is quadratic only in per-(supplier, month)
    bucket density, not in table size; the theta predicate survives
    only as a cheap post-filter on equi-matched rows. This is the
    same blocking idiom as the LSH band join, applied to the time
    axis; a hot (supplier, month) bucket inherits the salting guard.
    At 100× the bin width / key grain is the tuning knob (day bins,
    supplier+part keys) — the plan shape is unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_shipdate").alias("s"),
        F.expr(
            "l_shipdate + make_interval(0, 0, 0, 1 + l_linenumber * 3)"
        ).alias("e"),
    )
    binned = li.select(
        "sk",
        "id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col("s")),
                F.date_trunc("month", F.col("e")),
                F.expr("interval 1 month"),
            )
        ).alias("bin"),
    )
    a = binned.select(
        "sk", "bin",
        F.col("id").alias("id_a"), F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
    )
    b = binned.select(
        "sk", "bin",
        F.col("id").alias("id_b"), F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
    )
    pairs = (
        a.join(b, ["sk", "bin"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a"))
            & (
                F.col("bin")
                == F.date_trunc("month", F.greatest(F.col("s_a"), F.col("s_b")))
            )
        )
    )
    return (
        pairs.groupBy(F.col("sk").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("overlap_pairs"))
    )


SALTED_TOPK = 5
SALTED_TOPK_BUCKETS = 16


@query(
    "q_salted_topk",
    oracle=f"""
SELECT o_orderstatus AS status, o_orderkey, o_totalprice, rn FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) t WHERE rn <= {SALTED_TOPK}
""",
    tags=("A5", "skew", "salted-window"),
)
def q_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED TWO-PHASE TOP-K — the skew-proof form of "top-5 rows
    per group" when the group key is HOT (here o_orderstatus: 3
    values, so a naive window sends a third of the table through one
    reducer). Phase 1 ranks within (status, salt) — salt =
    orderkey % {SALTED_TOPK_BUCKETS}, deterministic — and keeps each
    salt's local top-{SALTED_TOPK}; phase 2 re-ranks the surviving
    groups × salts × {SALTED_TOPK} rows. The local top-k of every
    salt is a superset of that salt's contribution to the global
    top-k, so the two-phase result is EXACTLY the naive window's
    (the oracle states the naive form).

    Scale shape: the heavy shuffle is keyed by (status, salt) —
    {SALTED_TOPK_BUCKETS}× the parallelism of the skewed key — and
    phase 2 touches a bounded candidate set (groups·salts·k rows).
    Same idiom as q_salted_agg, applied to rank windows; at 100 TB
    the salt count scales with executor count, not data. (Spark's
    partial WindowGroupLimit already caps what each MAPPER emits for
    a rank filter; the salt additionally spreads the REDUCE side —
    the k·n_mappers survivor stream per hot group lands on
    {SALTED_TOPK_BUCKETS} reducers instead of one.)"""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderkey") % SALTED_TOPK_BUCKETS).alias("salt"),
    )
    w1 = W.partitionBy("status", "salt").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    local = (
        o.withColumn("lrn", F.row_number().over(w1))
        .filter(F.col("lrn") <= SALTED_TOPK)
        .drop("lrn", "salt")
    )
    w2 = W.partitionBy("status").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        local.withColumn("rn", F.row_number().over(w2).cast("long"))
        .filter(F.col("rn") <= SALTED_TOPK)
        .select("status", "o_orderkey", "o_totalprice", "rn")
    )


def _skipping_depth_oracle() -> str:
    scale_pk = _scale_sql("l_partkey", "mm.pk_mn", "mm.pk_mx")
    scale_sk = _scale_sql("l_suppkey", "mm.sk_mn", "mm.sk_mx")
    zexpr = _z16_sql(scale_pk, scale_sk, bits=_ZB)
    return f"""
WITH mm AS (
  SELECT min(l_partkey) AS pk_mn, max(l_partkey) AS pk_mx,
         min(l_suppkey) AS sk_mn, max(l_suppkey) AS sk_mx
  FROM lineitem
),
keyed AS (
  SELECT l_partkey, l_suppkey,
         ({zexpr}) >> 10 AS b_z,
         {scale_pk} AS b_pk,
         {scale_sk} AS b_sk
  FROM lineitem CROSS JOIN mm
),
prof AS (
  SELECT 'zorder' AS layout, b_z AS bucket,
         min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
         min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
  FROM keyed GROUP BY b_z
  UNION ALL
  SELECT 'pk_sorted', b_pk, min(l_partkey), max(l_partkey),
         min(l_suppkey), max(l_suppkey)
  FROM keyed GROUP BY b_pk
  UNION ALL
  SELECT 'sk_sorted', b_sk, min(l_partkey), max(l_partkey),
         min(l_suppkey), max(l_suppkey)
  FROM keyed GROUP BY b_sk
),
dpk AS (
  SELECT a.layout, a.bucket, CAST(count(*) AS BIGINT) AS d
  FROM prof a JOIN prof b
    ON a.layout = b.layout
   AND a.pk_min <= b.pk_max AND b.pk_min <= a.pk_max
  GROUP BY a.layout, a.bucket
),
dsk AS (
  SELECT a.layout, a.bucket, CAST(count(*) AS BIGINT) AS d
  FROM prof a JOIN prof b
    ON a.layout = b.layout
   AND a.sk_min <= b.sk_max AND b.sk_min <= a.sk_max
  GROUP BY a.layout, a.bucket
)
SELECT p.layout,
       CAST(count(DISTINCT p.bucket) AS BIGINT) AS n_buckets,
       round(CAST(sum(k.d) AS DOUBLE) / count(*), 4) AS depth_pk,
       round(CAST(sum(s.d) AS DOUBLE) / count(*), 4) AS depth_sk
FROM prof p
JOIN dpk k ON k.layout = p.layout AND k.bucket = p.bucket
JOIN dsk s ON s.layout = p.layout AND s.bucket = p.bucket
GROUP BY p.layout
"""


@query(
    "q_layout_skipping_depth",
    oracle=_skipping_depth_oracle(),
    tags=("ext", "layout", "data-skipping", "clustering-depth"),
)
def q_layout_skipping_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING DEPTH of candidate file layouts — the number Delta
    OPTIMIZE reports and the quantitative answer to "why Z-order":
    profile the file-sized buckets three layouts would produce
    (Z-curve, partkey-sorted, suppkey-sorted), then measure, per
    layout, the average number of files whose [min, max] range a
    point predicate on EACH column must still read (bucket-range
    overlap count). A linear sort gives depth ≈ 1 on its own column
    and ≈ n_files on the other; the Z-curve lands low on BOTH — the
    measured justification for q_zorder_layout's rewrite.

    Scale shape: the per-row bucket keys are pure integer expressions
    over one scan (the zorder recipe); the profiles are three bounded
    groupBys (≤2^{_ZB} buckets each); the overlap self-joins run over
    BUCKET tables (≤256 rows — file counts, not data), so the audit
    costs one fact scan regardless of table size."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_partkey").alias("pk_mn"),
        F.max("l_partkey").alias("pk_mx"),
        F.min("l_suppkey").alias("sk_mn"),
        F.max("l_suppkey").alias("sk_mx"),
    )

    def scale(x, mn, mx):
        return F.floor((x - mn) * (1 << _ZB) / (mx - mn + F.lit(1))).cast("long")

    keyed = li.crossJoin(F.broadcast(mm)).select(
        "l_partkey",
        "l_suppkey",
        F.shiftright(
            _z16(
                scale(F.col("l_partkey"), F.col("pk_mn"), F.col("pk_mx")),
                scale(F.col("l_suppkey"), F.col("sk_mn"), F.col("sk_mx")),
                bits=_ZB,
            ),
            10,
        ).alias("b_z"),
        scale(F.col("l_partkey"), F.col("pk_mn"), F.col("pk_mx")).alias("b_pk"),
        scale(F.col("l_suppkey"), F.col("sk_mn"), F.col("sk_mx")).alias("b_sk"),
    )

    def prof(bcol: str, layout: str) -> DataFrame:
        return (
            keyed.groupBy(F.col(bcol).alias("bucket"))
            .agg(
                F.min("l_partkey").alias("pk_min"),
                F.max("l_partkey").alias("pk_max"),
                F.min("l_suppkey").alias("sk_min"),
                F.max("l_suppkey").alias("sk_max"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    p = (
        prof("b_z", "zorder")
        .unionByName(prof("b_pk", "pk_sorted"))
        .unionByName(prof("b_sk", "sk_sorted"))
    )

    def depth(lo: str, hi: str, name: str) -> DataFrame:
        a = p.select(
            "layout", "bucket", F.col(lo).alias("a_lo"), F.col(hi).alias("a_hi")
        )
        b = p.select(
            "layout", F.col(lo).alias("b_lo"), F.col(hi).alias("b_hi")
        )
        return (
            a.join(F.broadcast(b), "layout")
            .filter((F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi")))
            .groupBy("layout", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    dpk = depth("pk_min", "pk_max", "d_pk")
    dsk = depth("sk_min", "sk_max", "d_sk")
    return (
        p.select("layout", "bucket")
        .join(dpk, ["layout", "bucket"])
        .join(dsk, ["layout", "bucket"])
        .groupBy("layout")
        .agg(
            F.countDistinct("bucket").alias("n_buckets"),
            F.round(F.sum("d_pk").cast("double") / F.count(F.lit(1)), 4).alias(
                "depth_pk"
            ),
            F.round(F.sum("d_sk").cast("double") / F.count(F.lit(1)), 4).alias(
                "depth_sk"
            ),
        )
    )


@query(
    "q_max_concurrency",
    oracle="""
WITH iv AS (
  SELECT l_suppkey AS sk,
         l_shipdate AS s,
         l_shipdate + INTERVAL (1 + l_linenumber * 3) DAY AS e
  FROM lineitem
),
pts AS (SELECT DISTINCT sk, s FROM iv),
cand AS (
  SELECT a.sk, a.s AS t, CAST(count(*) AS BIGINT) AS conc
  FROM pts a JOIN iv b ON a.sk = b.sk AND b.s <= a.s AND a.s <= b.e
  GROUP BY a.sk, a.s
)
SELECT sk AS suppkey, max(conc) AS max_concurrent
FROM cand GROUP BY sk
""",
    tags=("J4", "interval-analytics", "sweep-line"),
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX CONCURRENT SHIPMENTS per supplier — the capacity-planning
    number over the same shipment intervals as
    q_interval_overlap_binned, via the SWEEP LINE: each interval emits
    +1 at its start and −1 just after its (inclusive) end; a running
    sum over the supplier's time-ordered events IS the concurrency
    step function, and its max is the answer. The oracle states the
    quadratic spec (for every candidate instant, count covering
    intervals — max concurrency is always attained at some start).

    Tie rule (both engines): same-instant starts all apply before any
    end (+1 events sort ahead of −1 at equal timestamps via delta
    DESC), matching the inclusive-containment count. Scale shape:
    2 rows per interval, ONE keyed window per supplier ordered by
    (time, delta) — O(n log n) per key instead of the oracle's O(n²),
    the classic reason a scheduler never counts pairwise."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_shipdate").alias("s"),
        F.expr(
            "l_shipdate + make_interval(0, 0, 0, 1 + l_linenumber * 3)"
        ).alias("e"),
    )
    starts = li.select("sk", F.col("s").alias("ts"), F.lit(1).alias("delta"))
    ends = li.select(
        "sk",
        F.expr("e + make_interval(0, 0, 0, 0, 0, 0, 0.000001)").alias("ts"),
        F.lit(-1).alias("delta"),
    )
    ev = starts.unionByName(ends)
    w = (
        W.partitionBy("sk")
        .orderBy("ts", F.col("delta").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    conc = ev.select("sk", F.sum("delta").over(w).alias("conc"))
    return conc.groupBy(F.col("sk").alias("suppkey")).agg(
        F.max("conc").cast("long").alias("max_concurrent")
    )


# --- Bloom runtime-filter join (the 100 TB semi-join mechanism) ---

_RF_M = 1 << 16  # bits; fixed so the static SQL oracle can state it
_RF_K = 7  # (bloom_plan(n, fpr) is the data-driven sizing path)


def _rf_oracle() -> str:
    from cdc_via_flink_spark.operators.bloom import sql_positions

    pos = sql_positions("c_custkey", _RF_M, _RF_K)
    return f"""
WITH dim AS (
  SELECT c_custkey, c_nationkey FROM customer
  WHERE c_mktsegment = 'BUILDING'
),
cpos AS (SELECT unnest({pos}) AS pos FROM dim),
bitmap AS (
  SELECT pos // 32 AS word, bit_or(1::BIGINT << (pos % 32)) AS bits
  FROM cpos GROUP BY 1
),
fact AS (SELECT o_orderkey, o_custkey,
                CAST(o_totalprice AS DECIMAL(18,2)) AS rev FROM orders),
fpos AS (SELECT o_orderkey,
                unnest({pos.replace("c_custkey", "o_custkey")}) AS pos
         FROM fact),
probe AS (
  SELECT p.o_orderkey,
         (COALESCE(m.bits, 0) & (1::BIGINT << (p.pos % 32)))
           = (1::BIGINT << (p.pos % 32)) AS hit
  FROM fpos p LEFT JOIN bitmap m ON p.pos // 32 = m.word
),
verdict AS (SELECT o_orderkey, bool_and(hit) AS pass FROM probe GROUP BY 1),
passed AS (
  SELECT f.* FROM fact f JOIN verdict v ON f.o_orderkey = v.o_orderkey
  WHERE v.pass
),
counters AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probed,
         CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
  FROM verdict
),
agg AS (
  SELECT d.c_nationkey AS nationkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(p.rev) AS DOUBLE) AS revenue
  FROM passed p JOIN dim d ON p.o_custkey = d.c_custkey
  GROUP BY d.c_nationkey
)
SELECT agg.nationkey, agg.n_orders, round(agg.revenue, 2) AS revenue,
       counters.n_probed, counters.n_passed
FROM agg CROSS JOIN counters
ORDER BY agg.nationkey
"""


@query(
    "q_bloom_runtime_filter",
    oracle=_rf_oracle(),
    tags=("J3", "scale", "bloom", "runtime-filter"),
)
def q_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM RUNTIME-FILTER JOIN — the mechanism that makes a
    selective dim⋈fact join cheap at 100 TB: build a Bloom bitmap
    over the dim keys (BUILDING customers), probe every fact row
    against the broadcast words and DISCARD definite misses BEFORE
    the join shuffle — only bloom-passers (members + the ~FPR false
    positives) are hashed across the network; the exact join then
    removes the false positives, so the RESULT is provably identical
    to the plain join (that naive equivalence IS the oracle, which
    also replays the bitmap algebra for the probe counters). The
    bitmap is m/32 words regardless of dim size; counters n_probed/
    n_passed expose the eliminated shuffle volume (~80% here). Spark's
    own AQE can inject bloom runtime filters for some shapes; this is
    the engine-level form with a pinned, engine-independent layout —
    the same words the streaming gate maintains incrementally
    (stream_bloom_gated_dedup)."""
    from cdc_via_flink_spark.operators.bloom import bloom_build, bloom_probe

    c = load_table(spark, sf_dir, "customer")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_nationkey"
    )
    bitmap = bloom_build(dim, "c_custkey", _RF_M, _RF_K)
    fact = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", dec(F.col("o_totalprice")).alias("rev")
    )
    verdict = bloom_probe(
        fact.select("o_orderkey", "o_custkey"),
        "o_orderkey",
        "o_custkey",
        bitmap,
        _RF_M,
        _RF_K,
    )
    counters = verdict.agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_passed"),
    )
    passed = fact.join(
        verdict.filter(F.col("bloom_hit")).select("o_orderkey"), "o_orderkey"
    )
    agg = (
        passed.join(dim, passed.o_custkey == dim.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(counters))
        .select(
            "nationkey",
            "n_orders",
            F.round("revenue", 2).alias("revenue"),
            "n_probed",
            "n_passed",
        )
        .orderBy("nationkey")
    )


# --- Incremental view maintenance (batch form) ---


@query(
    "q_ivm_aggregate",
    oracle="""
WITH j AS (
  SELECT c.c_nationkey AS nk, CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT nk AS nationkey, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(v) AS DOUBLE) AS revenue,
       round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS avg_order
FROM j GROUP BY nk ORDER BY nationkey
""",
    tags=("A3", "ivm", "incremental"),
)
def q_ivm_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE of a revenue cube — the batch form
    of what every streaming aggregate does: the pre-1996 BASE
    partials (n, Σv per nation) are computed once and PERSISTED; the
    1996+ delta produces its own partials; the served view MERGES
    partials (sum of sums, sum of counts) and derives avg = Σ/n —
    never avg-of-avgs, never a base-row rescan. The oracle is the
    full recompute: hash-equality IS the IVM correctness proof
    (merge(base, delta) == recompute(all)). The non-decomposable
    aggregates (median, distinct) are exactly the ones this engine
    keeps sketches/bitmaps for (KLL, HLL, activity bitmap) — same
    contract, mergeable state."""
    import os as _os
    import shutil as _sh

    from cdc_via_flink_spark.plans.streaming_queries import STAGE_ROOT

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("nk")
    )
    j = o.join(c, "o_custkey").select(
        "nk",
        F.col("o_orderdate").alias("d"),
        dec(F.col("o_totalprice")).alias("v"),
    )
    split = F.lit("1996-01-01").cast("timestamp")

    def partials(df):
        return df.groupBy("nk").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("decimal(28,2)").alias("s"),
        )

    sf_name = _os.path.basename(sf_dir.rstrip("/"))
    base_path = _os.path.join(STAGE_ROOT, f"ivm_base_{sf_name}")
    _sh.rmtree(base_path, ignore_errors=True)
    # base partials persisted once (in production: the maintained table)
    partials(j.filter(F.col("d") < split)).write.mode("overwrite").parquet(
        base_path
    )
    base = spark.read.parquet(base_path)
    delta = partials(j.filter(F.col("d") >= split))
    merged = (
        base.unionByName(delta)
        .groupBy("nk")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        F.col("nk").alias("nationkey"),
        F.col("n").alias("n_orders"),
        F.col("s").cast("double").alias("revenue"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_order"),
    ).orderBy("nationkey")


# --- Bucketed co-located join (zero-exchange) ---


@query(
    "q_bucketed_join",
    oracle="""
SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS item_total
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 400000
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
""",
    tags=("J3", "scale", "bucketing", "zero-exchange"),
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKETED CO-LOCATED JOIN — the layout that deletes the join
    shuffle at 100 TB: both sides written bucketBy(orderkey), so the
    join requires NO Exchange on either input (each bucket pair joins
    locally; pinned by test_bucketed_join_no_exchange). The write
    cost amortizes across every subsequent orderkey join — the same
    argument as the Z-order layout (q_zorder_layout) for scans, here
    for joins. Result provably equals the plain join (the oracle).
    Selective predicate + aggregate on top show pushdown composes
    with bucketing."""
    import os as _os
    import shutil as _sh

    from cdc_via_flink_spark.plans.streaming_queries import STAGE_ROOT

    sf_name = _os.path.basename(sf_dir.rstrip("/"))
    wh = _os.path.join(STAGE_ROOT, f"bucketed_{sf_name}")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    names = {
        "o": f"bkt_orders_{sf_name.replace('.', '_')}",
        "l": f"bkt_lineitem_{sf_name.replace('.', '_')}",
    }
    for t in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    _sh.rmtree(wh, ignore_errors=True)
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", _os.path.join(wh, "orders"))
        .saveAsTable(names["o"])
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", _os.path.join(wh, "lineitem"))
        .saveAsTable(names["l"])
    )
    ob = spark.table(names["o"]).filter(F.col("o_totalprice") > 400000)
    lb = spark.table(names["l"])
    return (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias(
                "item_total"
            ),
        )
        .orderBy("o_orderkey")
    )
