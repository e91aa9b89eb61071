"""CDC declared queries (SURVEY.md M2): Debezium parse + transaction
reconstruction, batch-verified against the DuckDB oracle.

The CDC fixture streams are derived deterministically from the
driver's `events` table (FIXTURES.md §2 shape): non-purchase events
are row-change events, purchase events are transaction END markers.
The oracle SQL re-states the same derivation; the Spark side goes
through the full render-JSON → parse-JSON → reconstruct path, so
value parity proves the envelope codec and the assembly semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.operators.debezium import (
    ENVELOPE_SCHEMA_V2,
    parse_debezium,
    render_change_envelope,
    render_change_envelope_v2,
    render_txn_envelope,
)
from cdc_via_flink_spark.operators.reconstruct import (
    derive_change_stream,
    derive_txn_stream,
    latest_state,
    reconstruct_from_union,
    reconstruct_transactions,
)
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import ensure_min_partitions, load_table

# Oracle twins of operators.reconstruct.derive_*_stream — keep in sync.
CH_SQL = """
  SELECT 'txn-' || CAST(user_id AS VARCHAR) AS txn_id,
         event_id AS seq,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'click' THEN 'u'
              WHEN 'view' THEN 'r' ELSE 'd' END AS op,
         epoch_ms(ts) AS ts_ms,
         props
  FROM events WHERE event_type <> 'purchase'
"""

# The txn-metadata envelope has no timestamp (reference
# DebeziumTransactionReconstructor.java:109-114); only arrival offset.
EN_SQL = """
  SELECT 'txn-' || CAST(user_id AS VARCHAR) AS txn_id,
         event_id AS seq,
         CAST(floor("value") AS BIGINT) % 4 + 1 AS event_count
  FROM events WHERE event_type = 'purchase'
"""


def _streams(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    # CPU-heavy JSON codec follows: make sure the scan is split wide
    # enough to use every core (no-op when the file has enough row
    # groups, i.e. at any real scale).
    ev = ensure_min_partitions(load_table(spark, sf_dir, "events"))
    return derive_change_stream(ev), derive_txn_stream(ev)


def _envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render both derived streams to Debezium JSON strings and union —
    the batch stand-in for the two Kafka topics (SURVEY.md S1). `seq`
    rides alongside the value as the Kafka-offset analog."""
    changes, ends = _streams(spark, sf_dir)
    c_env = changes.select(
        F.col("seq"),
        render_change_envelope(
            F.col("op"), F.col("ts_ms"), F.col("txn_id"), F.col("before"), F.col("after")
        ).alias("value"),
    )
    e_env = ends.select(
        F.col("seq"),
        render_txn_envelope(F.col("status"), F.col("txn_id"), F.col("event_count")).alias(
            "value"
        ),
    )
    return c_env.unionByName(e_env)


_RECON_ORACLE = f"""
WITH ch AS ({CH_SQL}),
en AS ({EN_SQL}),
u AS (
  SELECT txn_id, seq, op, ts_ms, 'C' AS kind FROM ch
  UNION ALL
  SELECT txn_id, seq, CAST(NULL AS VARCHAR) AS op,
         CAST(NULL AS BIGINT) AS ts_ms, 'E' AS kind
  FROM en
),
a AS (
  SELECT *, min(CASE WHEN kind = 'E' THEN seq END) OVER (
      PARTITION BY txn_id ORDER BY seq
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS end_seq
  FROM u
),
g AS (
  SELECT txn_id, end_seq,
         count(*) AS n_events,
         string_agg(op, ',' ORDER BY seq) AS ops_concat,
         min(ts_ms) AS first_ts_ms,
         max(ts_ms) AS last_ts_ms
  FROM a WHERE kind = 'C' AND end_seq IS NOT NULL
  GROUP BY txn_id, end_seq
)
SELECT g.txn_id, g.end_seq, en.event_count, g.n_events, g.ops_concat,
       g.first_ts_ms, g.last_ts_ms
FROM g JOIN en ON g.txn_id = en.txn_id AND g.end_seq = en.seq
"""


@query(
    "cdc_reconstruct_end",
    oracle=_RECON_ORACLE,
    tags=("cdc", "stateful", "A1", "ST1"),
    bench=True,
)
def cdc_reconstruct_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit-on-END transaction reconstruction through the full envelope
    codec (reference semantics, DebeziumTransactionReconstructor.java:158)."""
    env = _envelopes(spark, sf_dir)
    parsed = parse_debezium(env)
    # One projection over ONE parse subtree — and NO pre-filter: a
    # `kind` filter here would be pushed through the projection into
    # the scan, re-evaluating the from_json subtree 3-4× per row
    # inside the pushed predicate. Instead the discriminator is
    # three-valued (C / E / NULL); NULL rows (BEGINs, malformed)
    # contribute to no aggregate and are dropped by the existing
    # n_events>0 / end_seq guards — identical semantics, single parse.
    is_change = F.col("kind") == "change"
    is_end = (F.col("kind") == "txn") & (F.col("status") == "END")
    u = parsed.select(
        "txn_id",
        F.col("seq").cast("long").alias("seq"),
        F.when(is_change, F.col("op")).alias("op"),
        F.when(is_change, F.col("ts_ms")).cast("long").alias("ts_ms"),
        F.when(is_change, F.lit("C")).when(is_end, F.lit("E")).alias("kind"),
        F.when(is_end, F.col("event_count")).cast("long").alias("declared"),
    )
    return reconstruct_from_union(u, emit_on="end")


@query(
    "cdc_reconstruct_count",
    oracle=_RECON_ORACLE + " WHERE g.n_events = en.event_count",
    tags=("cdc", "stateful", "A2"),
)
def cdc_reconstruct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-mode reconstruction: only segments whose size matches the
    declared event_count emit (the check the reference parses but never
    applies, reference :113-114)."""
    changes, ends = _streams(spark, sf_dir)
    return reconstruct_transactions(changes, ends, emit_on="count")


@query(
    "cdc_parse_envelope",
    oracle=f"""
WITH ch AS ({CH_SQL}), en AS ({EN_SQL}),
both_k AS (
  SELECT 'change' AS kind, op, txn_id, ts_ms FROM ch
  UNION ALL
  SELECT 'txn' AS kind, CAST(NULL AS VARCHAR) AS op, txn_id,
         CAST(NULL AS BIGINT) AS ts_ms FROM en
)
SELECT kind, op,
       count(*) AS n,
       count(DISTINCT txn_id) AS n_txn,
       min(ts_ms) AS min_ts_ms,
       max(ts_ms) AS max_ts_ms
FROM both_k GROUP BY kind, op
""",
    tags=("cdc", "P1", "P2", "P5"),
)
def cdc_parse_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON envelope render→parse round trip with discriminator stats
    (validates P1/P2/P5 against an oracle that never touches JSON)."""
    parsed = parse_debezium(_envelopes(spark, sf_dir))
    return (
        parsed.groupBy("kind", "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("txn_id").alias("n_txn"),
            F.min("ts_ms").alias("min_ts_ms"),
            F.max("ts_ms").alias("max_ts_ms"),
        )
        # NULL-kind filter AFTER the agg: pre-agg it would push through
        # the projection and re-evaluate the from_json subtree inside
        # the scan predicate; post-agg it touches a handful of groups.
        .filter(F.col("kind").isNotNull())
    )


@query(
    "cdc_dead_letter",
    oracle=f"""
WITH ch AS ({CH_SQL}), en AS ({EN_SQL}),
allrec AS (
  SELECT seq FROM ch UNION ALL SELECT seq FROM en
)
SELECT CASE WHEN seq % 7 = 0 THEN 'dead_letter' ELSE 'ok' END AS route,
       count(*) AS n
FROM allrec GROUP BY 1
""",
    tags=("cdc", "S4"),
)
def cdc_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing (SURVEY.md S4 side-output emulation):
    deterministically corrupt every 7th envelope, parse PERMISSIVE,
    route NULL-kind rows to the dead-letter leg and count both legs
    (reference side output :133,151,167)."""
    env = _envelopes(spark, sf_dir)
    corrupted = env.withColumn(
        "value",
        F.when(
            F.col("seq") % 7 == 0,
            F.expr("substring(value, 1, length(value) - 2)"),
        ).otherwise(F.col("value")),
    )
    parsed = parse_debezium(corrupted)
    return (
        parsed.withColumn(
            "route",
            F.when(F.col("kind").isNull(), "dead_letter").otherwise("ok"),
        )
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "cdc_latest_state",
    oracle=f"""
WITH ch AS ({CH_SQL}),
r AS (
  SELECT txn_id, op, ts_ms, props AS after, seq,
         row_number() OVER (PARTITION BY txn_id
                            ORDER BY ts_ms DESC, seq DESC) AS rn,
         count(*) OVER (PARTITION BY txn_id) AS n_changes
  FROM ch
)
SELECT txn_id, op AS last_op, ts_ms AS last_ts_ms, after AS last_after,
       n_changes
FROM r WHERE rn = 1
""",
    tags=("cdc", "J5", "A5"),
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot: final row image per key (window row_number idiom
    for 'latest state as of now', SURVEY.md J5)."""
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "click", "u")
        .when(F.col("event_type") == "view", "r")
        .otherwise("d")
    )
    ch = ev.filter(F.col("event_type") != "purchase").select(
        F.concat(F.lit("txn-"), F.col("user_id").cast("string")).alias("txn_id"),
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.col("ts_ms"),
        F.col("props").alias("after"),
    )
    return latest_state(ch)


@query(
    "cdc_scd2_history",
    oracle=f"""
WITH ch AS ({CH_SQL})
SELECT txn_id, seq, op, ts_ms AS valid_from_ms,
       lead(ts_ms) OVER (PARTITION BY txn_id ORDER BY ts_ms, seq) - 1
           AS valid_to_ms,
       CASE WHEN lead(ts_ms) OVER (PARTITION BY txn_id ORDER BY ts_ms, seq)
                 IS NULL THEN 1 ELSE 0 END AS is_current
FROM ch
""",
    tags=("cdc", "scd2", "A5"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history from the change stream: every change version
    gets a [valid_from, valid_to) interval per key via lead() — the
    warehouse-history materialization CDC feeds (one window on the
    txn_id shuffle; no self-join)."""
    from pyspark.sql import Window as W

    changes, _ = _streams(spark, sf_dir)
    w = W.partitionBy("txn_id").orderBy("ts_ms", "seq")
    nxt = F.lead("ts_ms").over(w)
    return changes.select(
        "txn_id",
        "seq",
        "op",
        F.col("ts_ms").alias("valid_from_ms"),
        (nxt - 1).alias("valid_to_ms"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


# Snapshot-diff instants (epoch ms, UTC): 2024-01-10 and 2024-01-20 —
# inside the events fixture's January span at every SF.
_DIFF_T1 = 1704844800000
_DIFF_T2 = 1705708800000


@query(
    "cdc_snapshot_diff",
    oracle=f"""
WITH ch AS ({{ch}}),
g AS (
  SELECT txn_id,
         max(CASE WHEN ts_ms <= {_DIFF_T1}
                  THEN {{'ts_ms': ts_ms, 'seq': seq, 'op': op,
                        'after': CASE WHEN op <> 'd' THEN props END}} END) AS s1,
         max(CASE WHEN ts_ms <= {_DIFF_T2}
                  THEN {{'ts_ms': ts_ms, 'seq': seq, 'op': op,
                        'after': CASE WHEN op <> 'd' THEN props END}} END) AS s2
  FROM ch GROUP BY txn_id
)
SELECT txn_id,
       CASE WHEN NOT (s1 IS NOT NULL AND s1.op <> 'd') THEN 'insert'
            WHEN NOT (s2 IS NOT NULL AND s2.op <> 'd') THEN 'delete'
            ELSE 'update' END AS diff_op,
       s1.after AS before_img, s2.after AS after_img,
       s1.ts_ms AS before_ts_ms, s2.ts_ms AS after_ts_ms
FROM g
WHERE ((s1 IS NOT NULL AND s1.op <> 'd') <> (s2 IS NOT NULL AND s2.op <> 'd'))
   OR ((s1 IS NOT NULL AND s1.op <> 'd') AND (s2 IS NOT NULL AND s2.op <> 'd')
       AND s1.ts_ms <> s2.ts_ms)
""".replace("{ch}", CH_SQL),
    tags=("cdc", "J5", "diff"),
    bench=True,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the inverse of CDC replay: given the change
    stream, emit the insert/update/delete delta between the table
    state at T1 and at T2 (what a downstream would need to catch up).
    A key is live at T if its latest change at-or-before T is not a
    delete ('d').

    Scale shape: ONE scan and ONE txn_id shuffle — both states come
    from a single groupBy via conditional `max(struct(ts_ms, seq,
    ...))` (lexicographic struct max = argmax; (ts_ms, seq) is unique
    so the winner is deterministic in both engines), instead of two
    windowed subqueries full-outer-joined (3 shuffles)."""
    changes, _ = _streams(spark, sf_dir)

    def state_at(t_ms: int):
        return F.max(
            F.when(
                F.col("ts_ms") <= t_ms,
                F.struct("ts_ms", "seq", "op", F.col("after")),
            )
        )

    g = changes.groupBy("txn_id").agg(
        state_at(_DIFF_T1).alias("s1"), state_at(_DIFF_T2).alias("s2")
    )
    p1 = F.col("s1").isNotNull() & (F.col("s1.op") != "d")
    p2 = F.col("s2").isNotNull() & (F.col("s2.op") != "d")
    return (
        g.filter(
            (p1 != p2) | (p1 & p2 & (F.col("s1.ts_ms") != F.col("s2.ts_ms")))
        )
        .select(
            "txn_id",
            F.when(~p1, "insert").when(~p2, "delete").otherwise("update").alias("diff_op"),
            F.col("s1.after").alias("before_img"),
            F.col("s2.after").alias("after_img"),
            F.col("s1.ts_ms").alias("before_ts_ms"),
            F.col("s2.ts_ms").alias("after_ts_ms"),
        )
    )


@query(
    "cdc_partitioned_replay",
    oracle=f"""
WITH ch AS ({CH_SQL}),
en AS ({EN_SQL}),
all_env AS (
  SELECT txn_id FROM ch UNION ALL SELECT txn_id FROM en
),
routed AS (
  SELECT txn_id,
         CAST(('0x' || substr(md5(txn_id), 1, 8)) AS BIGINT) % 4 AS part
  FROM all_env
)
SELECT part, count(*) AS n_envelopes, count(DISTINCT txn_id) AS n_txns,
       TRUE AS offsets_dense
FROM routed GROUP BY part
""",
    tags=("S1", "S2", "kafka-twin", "partitioned"),
)
def cdc_partitioned_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end PARTITIONED topic round-trip through the Kafka-twin
    DataSource (sources/python_datasource.py): every envelope is
    PRODUCED into a 4-partition topic keyed by txn_id (md5 key
    routing — all of a transaction's envelopes land in one partition,
    the invariant Kafka keyed production gives the reference's
    consumer, readme.md:1), then CONSUMED back through the partitioned
    reader. Declared output: per-partition envelope/txn counts —
    which the oracle re-derives from the events table through the
    SAME md5 routing formula, so a routing or layout regression
    changes the distribution and hash-mismatches — plus a
    per-partition offset-density proof (offsets are exactly
    0..n-1: nothing lost, nothing duplicated; oracle emits TRUE)."""
    import shutil

    from cdc_via_flink_spark.sources import python_datasource as PD

    PD.register(spark)
    changes, ends = _streams(spark, sf_dir)
    c_env = changes.select(
        F.col("txn_id").alias("key"),
        render_change_envelope(
            F.col("op"), F.col("ts_ms"), F.col("txn_id"), F.col("before"), F.col("after")
        ).alias("value"),
    )
    e_env = ends.select(
        F.col("txn_id").alias("key"),
        render_txn_envelope(
            F.col("status"), F.col("txn_id"), F.col("event_count")
        ).alias("value"),
    )
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/root/repo/.tmp", f"ptopic_{sf_name}")
    if os.path.isdir(root):
        shutil.rmtree(root)
    (
        c_env.unionByName(e_env)
        .write.format("debezium_replay")
        .option("path", root)
        .option("topic", "txns")
        .option("topicPartitions", 4)
        .mode("append")
        .save()
    )
    back = (
        spark.read.format("debezium_replay")
        .option("path", root)
        .option("subscribe", "txns")
        .load()
    )
    txn = F.coalesce(
        F.get_json_object("value", "$.payload.transaction.id"),
        F.get_json_object("value", "$.payload.id"),
    )
    return (
        back.select(
            F.col("partition").cast("long").alias("part"),
            F.col("offset"),
            txn.alias("txn_id"),
        )
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_envelopes"),
            F.countDistinct("txn_id").alias("n_txns"),
            (
                (F.max("offset") == F.count(F.lit(1)) - 1)
                & (F.min("offset") == 0)
            ).alias("offsets_dense"),
        )
    )


@query(
    "cdc_retract_view",
    oracle=f"""
WITH ch AS ({CH_SQL}),
im AS (
  SELECT txn_id, seq, ts_ms,
         CASE WHEN op <> 'd'
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
         lag(CASE WHEN op <> 'd'
                  THEN CAST(json_extract(props, '$.k') AS BIGINT) END)
           OVER (PARTITION BY txn_id ORDER BY ts_ms, seq) AS prev_k
  FROM ch
),
d AS (
  SELECT unnest(list_filter(
           [CASE WHEN prev_k IS NOT NULL
                 THEN {{'bucket': prev_k % 5, 'delta': -prev_k}} END,
            CASE WHEN k IS NOT NULL
                 THEN {{'bucket': k % 5, 'delta': k}} END],
           x -> x IS NOT NULL)) AS dl
  FROM im
),
view_side AS (
  SELECT dl.bucket,
         CAST(sum(dl.delta) AS BIGINT) AS view_sum,
         CAST(count(CASE WHEN dl.delta < 0 THEN 1 END) AS BIGINT)
           AS n_retractions,
         CAST(count(CASE WHEN dl.delta >= 0 THEN 1 END) AS BIGINT)
           AS n_additions
  FROM d GROUP BY dl.bucket
),
last_img AS (
  SELECT txn_id,
         max({{'ts_ms': ts_ms, 'seq': seq, 'k': k}}) AS li
  FROM im GROUP BY txn_id
),
direct AS (
  SELECT li.k % 5 AS bucket, CAST(sum(li.k) AS BIGINT) AS direct_sum
  FROM last_img WHERE li.k IS NOT NULL GROUP BY li.k % 5
)
SELECT v.bucket, v.n_retractions, v.n_additions, v.view_sum,
       COALESCE(direct.direct_sum, 0) AS direct_sum,
       v.view_sum = COALESCE(direct.direct_sum, 0) AS consistent
FROM view_side v LEFT JOIN direct ON v.bucket = direct.bucket
""",
    tags=("cdc", "ivm", "retract"),
)
def cdc_retract_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE over the change stream — the
    retract-stream capability (Flink retract mode / Materialize /
    Debezium-fed materialized views): turn each row change into SIGNED
    deltas against a grouped SUM view, including GROUP MIGRATION (an
    update whose payload moves the row to a different group emits a
    retraction in the old group and an addition in the new one) and
    deletes (pure retraction). The fixture's update envelopes carry
    the Debezium before==after degeneracy, so true before-images are
    repaired with lag() per key first — the standard unwrap step.

    The declared output carries BOTH formulations per group: the
    delta-maintained view_sum (never materializes key state — at
    100 TB this is one map-side delta explode + one small grouped sum,
    the shape a streaming sink applies per batch via upsert) and the
    direct snapshot aggregate over final row images (one keyed argmax),
    plus their equality as `consistent` — the telescoping-sum
    invariant a broken delta derivation breaks immediately. Integer
    arithmetic throughout; no float policy needed."""
    from pyspark.sql import Window as W

    changes, _ = _streams(spark, sf_dir)
    k = F.when(
        F.col("op") != "d",
        F.get_json_object(F.col("after"), "$.k").cast("long"),
    )
    w = W.partitionBy("txn_id").orderBy("ts_ms", "seq")
    im = changes.select(
        "txn_id", "seq", "ts_ms", k.alias("k")
    ).withColumn("prev_k", F.lag("k").over(w))

    delta_list = F.array_compact(
        F.array(
            F.when(
                F.col("prev_k").isNotNull(),
                F.struct(
                    (F.col("prev_k") % 5).alias("bucket"),
                    (-F.col("prev_k")).alias("delta"),
                ),
            ),
            F.when(
                F.col("k").isNotNull(),
                F.struct(
                    (F.col("k") % 5).alias("bucket"), F.col("k").alias("delta")
                ),
            ),
        )
    )
    d = im.select(F.explode(delta_list).alias("dl"))
    view_side = d.groupBy(F.col("dl.bucket").alias("bucket")).agg(
        F.sum("dl.delta").cast("long").alias("view_sum"),
        F.count(F.when(F.col("dl.delta") < 0, 1)).alias("n_retractions"),
        F.count(F.when(F.col("dl.delta") >= 0, 1)).alias("n_additions"),
    )
    last_img = im.groupBy("txn_id").agg(
        F.max(F.struct("ts_ms", "seq", "k")).alias("li")
    )
    direct = (
        last_img.filter(F.col("li.k").isNotNull())
        .groupBy((F.col("li.k") % 5).alias("bucket"))
        .agg(F.sum("li.k").cast("long").alias("direct_sum"))
    )
    return (
        view_side.join(direct, "bucket", "left")
        .select(
            "bucket",
            "n_retractions",
            "n_additions",
            "view_sum",
            F.coalesce("direct_sum", F.lit(0)).alias("direct_sum"),
            (F.col("view_sum") == F.coalesce("direct_sum", F.lit(0))).alias(
                "consistent"
            ),
        )
    )


@query(
    "cdc_time_weighted_avg",
    oracle=f"""
WITH ch AS ({CH_SQL}),
v AS (
  SELECT txn_id, ts_ms,
         CASE WHEN op <> 'd'
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
         COALESCE(lead(ts_ms) OVER (PARTITION BY txn_id ORDER BY ts_ms, seq),
                  (SELECT max(ts_ms) FROM ch)) AS end_ms
  FROM ch
),
iv AS (
  SELECT txn_id, k, end_ms - ts_ms AS dur
  FROM v WHERE k IS NOT NULL AND end_ms > ts_ms
)
SELECT txn_id,
       count(*) AS n_intervals,
       CAST(sum(dur) AS BIGINT) AS live_ms,
       round(CAST(sum(k * dur) AS DOUBLE) / sum(dur), 6) AS twap
FROM iv GROUP BY txn_id
""",
    tags=("cdc", "timeseries", "twap", "scd2"),
)
def cdc_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE over CDC version intervals — the
    hypertable/financial `time_weight` idiom applied to reconstructed
    row history: each version's payload value k holds for
    [its ts, next change), the last version until the stream's
    observation horizon (data-derived max ts, no wall clock); deleted
    periods contribute nothing. TWAP = Σ k·dur / Σ dur with integer
    numerators (exact, order-free) and ONE final double division —
    where a plain avg() over change events would overweight rapidly-
    flapping keys, this weights by how long each value was true.

    Scale: one keyed window (lead) on the single txn_id shuffle +
    one aggregate; the horizon scalar broadcasts."""
    from pyspark.sql import Window as W

    changes, _ = _streams(spark, sf_dir)
    k = F.when(
        F.col("op") != "d",
        F.get_json_object(F.col("after"), "$.k").cast("long"),
    )
    horizon = changes.agg(F.max("ts_ms").alias("mx"))
    w = W.partitionBy("txn_id").orderBy("ts_ms", "seq")
    v = (
        changes.select("txn_id", "ts_ms", "seq", k.alias("k"))
        .withColumn("next_ms", F.lead("ts_ms").over(w))
        .crossJoin(F.broadcast(horizon))
        .select(
            "txn_id",
            "k",
            (F.coalesce("next_ms", "mx") - F.col("ts_ms")).alias("dur"),
        )
        .filter(F.col("k").isNotNull() & (F.col("dur") > 0))
    )
    return v.groupBy("txn_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur").cast("long").alias("live_ms"),
        F.round(
            F.sum(F.col("k") * F.col("dur")).cast("double") / F.sum("dur"), 6
        ).alias("twap"),
    )


@query(
    "cdc_ordering_audit",
    oracle=f"""
WITH ch AS ({CH_SQL}),
l AS (
  SELECT txn_id, seq, ts_ms,
         lag(ts_ms) OVER (PARTITION BY txn_id ORDER BY seq) AS prev_ts
  FROM ch
),
per_key AS (
  SELECT txn_id,
         count(*) AS n_changes,
         count(CASE WHEN prev_ts IS NOT NULL AND ts_ms < prev_ts THEN 1 END)
           AS n_inversions,
         COALESCE(max(CASE WHEN prev_ts IS NOT NULL AND ts_ms < prev_ts
                           THEN prev_ts - ts_ms END), 0) AS max_skew_ms
  FROM l GROUP BY txn_id
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n_changes) AS BIGINT) AS n_changes,
       CAST(sum(n_inversions) AS BIGINT) AS n_inversions,
       round(CAST(sum(n_inversions) AS DOUBLE) / sum(n_changes), 6)
         AS inversion_rate,
       CAST(max(max_skew_ms) AS BIGINT) AS max_skew_ms,
       CAST(count(CASE WHEN n_inversions > 0 THEN 1 END) AS BIGINT)
         AS n_keys_affected
FROM per_key
""",
    tags=("cdc", "audit", "ordering", "W1"),
)
def cdc_ordering_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDER ARRIVAL AUDIT over the change stream — the ops
    metric that SIZES the watermark: per key, compare event time
    against ARRIVAL order (seq = the Kafka-offset analog) and count
    inversions (a later-arriving change carrying an earlier
    timestamp) plus the worst skew in ms. `max_skew_ms` is exactly
    the lower bound a safe `withWatermark` delay must clear
    (reference declares 1 minute blind, :57-61; this measures what
    the data actually needs). One keyed window + two aggregates."""
    from pyspark.sql import Window as W

    changes, _ = _streams(spark, sf_dir)
    w = W.partitionBy("txn_id").orderBy("seq")
    l = changes.select("txn_id", "seq", "ts_ms").withColumn(
        "prev_ts", F.lag("ts_ms").over(w)
    )
    inv = F.col("prev_ts").isNotNull() & (F.col("ts_ms") < F.col("prev_ts"))
    per_key = l.groupBy("txn_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.count(F.when(inv, 1)).alias("n_inversions"),
        F.coalesce(
            F.max(F.when(inv, F.col("prev_ts") - F.col("ts_ms"))), F.lit(0)
        ).alias("max_skew_ms"),
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_changes").cast("long").alias("n_changes"),
        F.sum("n_inversions").cast("long").alias("n_inversions"),
        F.round(
            F.sum("n_inversions").cast("double") / F.sum("n_changes"), 6
        ).alias("inversion_rate"),
        F.max("max_skew_ms").cast("long").alias("max_skew_ms"),
        F.count(F.when(F.col("n_inversions") > 0, 1)).cast("long").alias(
            "n_keys_affected"
        ),
    )


@query(
    "cdc_assembly_latency",
    oracle=f"""
WITH recon AS ({_RECON_ORACLE}),
sp AS (
  SELECT n_events, last_ts_ms - first_ts_ms AS span_ms FROM recon
),
b AS (
  SELECT n_events, span_ms,
         CASE WHEN span_ms < 60000 THEN 0
              WHEN span_ms < 300000 THEN 1
              WHEN span_ms < 1800000 THEN 2 ELSE 3 END AS bucket_id,
         CASE WHEN span_ms < 60000 THEN '<1m'
              WHEN span_ms < 300000 THEN '1-5m'
              WHEN span_ms < 1800000 THEN '5-30m' ELSE '>=30m' END AS bucket
  FROM sp
)
SELECT CAST(bucket_id AS BIGINT) AS bucket_id, bucket,
       CAST(count(*) AS BIGINT) AS n_txns,
       round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS avg_events,
       CAST(max(span_ms) AS BIGINT) AS max_span_ms
FROM b GROUP BY bucket_id, bucket
""",
    tags=("cdc", "ops", "latency"),
)
def cdc_assembly_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTION ASSEMBLY-LATENCY PROFILE — the ops readout next to
    the flagship reconstructor: per assembled transaction, the span
    from its first to its last change event, bucketed (<1m / 1-5m /
    5-30m / ≥30m) with transaction counts, average event counts and
    the worst span. This is the number that sizes the reconstructor's
    STATE WINDOW: open transactions buffer until their end-marker, so
    the span distribution IS the state-retention budget (and the ≥30m
    tail is what stream_state_heavy_hitters triages live).

    Scale shape: builds directly on the assembled output (same single
    keyed shuffle as cdc_reconstruct_end), then a 4-bucket fold —
    the profile costs one small aggregate on top of the flagship."""
    assembled = cdc_reconstruct_end(spark, sf_dir)
    sp = assembled.select(
        "n_events", (F.col("last_ts_ms") - F.col("first_ts_ms")).alias("span_ms")
    )
    b = sp.select(
        "n_events",
        "span_ms",
        F.when(F.col("span_ms") < 60000, 0)
        .when(F.col("span_ms") < 300000, 1)
        .when(F.col("span_ms") < 1800000, 2)
        .otherwise(3)
        .alias("bucket_id"),
        F.when(F.col("span_ms") < 60000, "<1m")
        .when(F.col("span_ms") < 300000, "1-5m")
        .when(F.col("span_ms") < 1800000, "5-30m")
        .otherwise(">=30m")
        .alias("bucket"),
    )
    return b.groupBy(
        F.col("bucket_id").cast("long").alias("bucket_id"), "bucket"
    ).agg(
        F.count(F.lit(1)).alias("n_txns"),
        F.round(F.sum("n_events").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_events"
        ),
        F.max("span_ms").cast("long").alias("max_span_ms"),
    )


@query(
    "cdc_bootstrap_snapshot_chain",
    oracle=f"""
WITH ch AS ({CH_SQL}),
b AS (SELECT (min(seq) + max(seq)) // 2 AS p FROM ch),
w AS (
  SELECT txn_id, op, ts_ms, seq,
         CASE WHEN op = 'd' THEN NULL ELSE props END AS final_after,
         row_number() OVER (PARTITION BY txn_id
                            ORDER BY ts_ms DESC, seq DESC) AS rn
  FROM ch
),
sufc AS (
  SELECT txn_id, count(*) AS n_suffix FROM ch
  WHERE seq > (SELECT p FROM b) GROUP BY txn_id
),
prec AS (SELECT DISTINCT txn_id FROM ch WHERE seq <= (SELECT p FROM b))
SELECT w.txn_id,
       CASE WHEN w.seq > (SELECT p FROM b) THEN w.op ELSE 'r' END
           AS last_seen_op,
       w.ts_ms AS final_ts_ms,
       w.final_after,
       CAST(coalesce(s.n_suffix, 0) AS BIGINT) AS n_suffix_events,
       (p2.txn_id IS NOT NULL) AS snapshot_present
FROM w
LEFT JOIN sufc s ON w.txn_id = s.txn_id
LEFT JOIN prec p2 ON w.txn_id = p2.txn_id
WHERE w.rn = 1
""",
    tags=("cdc", "S5", "J5", "bootstrap", "snapshot-chain"),
)
def cdc_bootstrap_snapshot_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT + LOG CHAINING — the consistent-bootstrap algorithm a
    binlog CDC source (the reference's declared-but-never-imported
    flink-connector-mysql-cdc, build.gradle:32) exists to perform, and
    the published core of Debezium's incremental snapshot / Netflix
    DBLog: a new consumer picks a log position P, takes a consistent
    SNAPSHOT of the table state as of P (rendered as Debezium 'r'
    "snapshot read" records AT position P — the MySQL-dialect op), and
    chains the log SUFFIX (> P) behind it. The bootstrap-equivalence
    theorem says last-writer-wins over (snapshot 'r' records ∪ suffix)
    equals last-writer-wins over the FULL log — which is exactly what
    the oracle computes, never seeing the snapshot: an exact-hash
    match is the theorem on real data, through the real codec (the
    snapshot records go through render_change_envelope -> parse
    round-trips, not a side channel).

    Output per key: final_after (the payload — must equal full-replay),
    last_seen_op ('r' when untouched since the snapshot — what a real
    Debezium consumer observes — else the suffix's last op),
    final_ts_ms, n_suffix_events, snapshot_present (key existed at P).

    Scale shape: the snapshot is ONE keyed window over the prefix
    (the cdc_latest_state plan), the chain is a union feeding one more
    keyed window; P is a 1-row driver scalar. At 100 TB this is the
    plan you want: bootstrap cost = one table-scan snapshot + the log
    tail, never a full-history replay per new consumer."""
    from pyspark.sql import Window as W

    env = _envelopes(spark, sf_dir)
    chg = parse_debezium(env).filter(F.col("kind") == "change")
    b = chg.agg(
        F.min("seq").alias("mn"), F.max("seq").alias("mx")
    ).head()
    p = (int(b["mn"]) + int(b["mx"])) // 2

    snap = latest_state(chg.filter(F.col("seq") <= p))
    snap_env = snap.select(
        F.lit(p).cast("long").alias("seq"),
        render_change_envelope(
            F.lit("r"),
            F.col("last_ts_ms"),
            F.col("txn_id"),
            F.lit(None).cast("string"),
            F.col("last_after"),
        ).alias("value"),
    )
    chain_env = snap_env.unionByName(env.filter(F.col("seq") > p))
    cp = parse_debezium(chain_env).filter(F.col("kind") == "change")

    wtx = W.partitionBy("txn_id")
    ranked = cp.select(
        "txn_id",
        "op",
        "ts_ms",
        "after",
        "seq",
        F.row_number()
        .over(wtx.orderBy(F.col("ts_ms").desc(), F.col("seq").desc()))
        .alias("rn"),
        F.sum(F.when(F.col("seq") > p, 1).otherwise(0))
        .over(wtx)
        .alias("n_suffix"),
        # seq == P identifies the snapshot record uniquely: log rows at
        # P are in the prefix (excluded), suffix rows are strictly > P
        F.max(F.when(F.col("seq") == p, 1).otherwise(0))
        .over(wtx)
        .alias("snap_flag"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "txn_id",
        F.col("op").alias("last_seen_op"),
        F.col("ts_ms").alias("final_ts_ms"),
        F.col("after").alias("final_after"),
        F.col("n_suffix").cast("long").alias("n_suffix_events"),
        (F.col("snap_flag") == 1).alias("snapshot_present"),
    )


_CHUNKS = 4  # incremental-snapshot waves (key-hash chunks)


@query(
    "cdc_incremental_snapshot_chunks",
    oracle=f"""
WITH ch AS ({CH_SQL}),
b AS (SELECT min(seq) AS mn, max(seq) AS mx FROM ch),
k AS (
  SELECT *,
         CAST(substring(txn_id, 5) AS BIGINT) % {_CHUNKS} AS chunk,
         (SELECT mn FROM b)
           + (CAST(substring(txn_id, 5) AS BIGINT) % {_CHUNKS} + 1)
             * (((SELECT mx FROM b) - (SELECT mn FROM b)) // ({_CHUNKS} + 1))
           AS pk
  FROM ch
),
w AS (
  SELECT txn_id, chunk, pk, op, ts_ms, seq,
         CASE WHEN op = 'd' THEN NULL ELSE props END AS final_after,
         row_number() OVER (PARTITION BY txn_id
                            ORDER BY ts_ms DESC, seq DESC) AS rn
  FROM k
),
sufc AS (
  SELECT txn_id, count(*) AS n_suffix FROM k WHERE seq > pk GROUP BY txn_id
),
prec AS (SELECT DISTINCT txn_id FROM k WHERE seq <= pk)
SELECT w.txn_id, CAST(w.chunk AS BIGINT) AS chunk,
       CAST(w.pk AS BIGINT) AS chunk_pos,
       CASE WHEN w.seq > w.pk THEN w.op ELSE 'r' END AS last_seen_op,
       w.ts_ms AS final_ts_ms, w.final_after,
       CAST(coalesce(s.n_suffix, 0) AS BIGINT) AS n_suffix_events,
       (p2.txn_id IS NOT NULL) AS snapshot_present
FROM w
LEFT JOIN sufc s ON w.txn_id = s.txn_id
LEFT JOIN prec p2 ON w.txn_id = p2.txn_id
WHERE w.rn = 1
""",
    tags=("cdc", "S5", "ST5", "bootstrap", "incremental-snapshot"),
)
def cdc_incremental_snapshot_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNKED incremental snapshot — the full DBLog / Debezium
    incremental-snapshot algorithm (the cdc_bootstrap_snapshot_chain
    companion, and the part that makes a binlog source bootstrap a
    100 TB table without stopping the stream): the key space is split
    into hash chunks, and each chunk is snapshotted in its own WAVE at
    a LATER log position P_i while the log keeps flowing — so no
    single consistent point-in-time read of the whole table is ever
    needed, and snapshot memory is bounded by one chunk. Per chunk the
    chain is (snapshot-'r' records at P_i) ∪ (that chunk's log suffix
    > P_i); the union over chunks must still equal full-log replay —
    per-key the bootstrap-equivalence theorem holds at the key's OWN
    chunk position, which is exactly what the oracle states (it never
    sees a snapshot).

    The Spark side runs every wave through the real envelope codec and
    one final keyed last-writer-wins window; wave positions are
    derived from the (min, max) log-position envelope (1-row driver
    scalar), chunk id from the key hash — both engine-exact."""
    from pyspark.sql import Window as W

    env = _envelopes(spark, sf_dir)
    chg = parse_debezium(env).filter(F.col("kind") == "change")
    b = chg.agg(
        F.min("seq").alias("mn"), F.max("seq").alias("mx")
    ).head()
    mn, mx = int(b["mn"]), int(b["mx"])
    chunk = (
        F.substring(F.col("txn_id"), 5, 30).cast("long") % _CHUNKS
    )
    pos = F.lit(mn) + (chunk + 1) * F.lit((mx - mn) // (_CHUNKS + 1))
    # NB: (chunk+1) * ((mx-mn) // (K+1)) — the divide happens FIRST on
    # both sides. DuckDB's * and // are equal-precedence
    # left-associative, so the oracle parenthesizes the // explicitly;
    # without it (chunk+1)*(mx-mn) // (K+1) divides LAST and drifts by
    # up to K-1 positions (caught by the hash gate on first run).
    keyed = chg.withColumn("chunk", chunk).withColumn("pk", pos)

    # one wave per chunk: snapshot that chunk's keys at P_i, render as
    # 'r' records AT P_i, chain the chunk's suffix behind it
    waves = []
    for i in range(_CHUNKS):
        p_i = mn + (i + 1) * ((mx - mn) // (_CHUNKS + 1))
        part = keyed.filter(F.col("chunk") == i)
        snap = latest_state(part.filter(F.col("seq") <= p_i))
        waves.append(
            snap.select(
                F.lit(p_i).cast("long").alias("seq"),
                render_change_envelope(
                    F.lit("r"),
                    F.col("last_ts_ms"),
                    F.col("txn_id"),
                    F.lit(None).cast("string"),
                    F.col("last_after"),
                ).alias("value"),
            )
        )
        waves.append(
            part.filter(F.col("seq") > p_i).select(
                "seq",
                render_change_envelope(
                    F.col("op"),
                    F.col("ts_ms"),
                    F.col("txn_id"),
                    F.lit(None).cast("string"),
                    F.col("after"),
                ).alias("value"),
            )
        )
    chain_env = waves[0]
    for wv in waves[1:]:
        chain_env = chain_env.unionByName(wv)
    cp = parse_debezium(chain_env).filter(F.col("kind") == "change")
    cp = cp.withColumn("chunk", chunk).withColumn("pk", pos)

    wtx = W.partitionBy("txn_id")
    ranked = cp.select(
        "txn_id",
        "chunk",
        "pk",
        "op",
        "ts_ms",
        "after",
        "seq",
        F.row_number()
        .over(wtx.orderBy(F.col("ts_ms").desc(), F.col("seq").desc()))
        .alias("rn"),
        F.sum(F.when(F.col("seq") > F.col("pk"), 1).otherwise(0))
        .over(wtx)
        .alias("n_suffix"),
        F.max(F.when(F.col("seq") == F.col("pk"), 1).otherwise(0))
        .over(wtx)
        .alias("snap_flag"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "txn_id",
        F.col("chunk").cast("long").alias("chunk"),
        F.col("pk").cast("long").alias("chunk_pos"),
        F.col("op").alias("last_seen_op"),
        F.col("ts_ms").alias("final_ts_ms"),
        F.col("after").alias("final_after"),
        F.col("n_suffix").cast("long").alias("n_suffix_events"),
        (F.col("snap_flag") == 1).alias("snapshot_present"),
    )


@query(
    "cdc_schema_evolution",
    oracle=f"""
WITH ch AS ({CH_SQL}),
v AS (
  SELECT *, CASE WHEN seq % 3 = 0 THEN 2 ELSE 1 END AS ver,
         CASE WHEN seq % 3 = 0 THEN seq * 1000 END AS lsn
  FROM ch
)
SELECT CAST(ver AS BIGINT) AS schema_version,
       count(*) AS n,
       count(*) AS n_v1_reader_ok,
       count(lsn) AS n_with_lsn,
       min(lsn) AS min_lsn,
       max(lsn) AS max_lsn,
       count(DISTINCT txn_id) AS n_txn
FROM v GROUP BY ver
""",
    tags=("cdc", "P1", "P2", "schema-evolution"),
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENVELOPE SCHEMA EVOLUTION tolerance — the production CDC drift
    concern a connector upgrade creates: a topic carries BOTH v1
    envelopes and v2 envelopes (payload gains `lsn` and a
    `source.version` block; every 3rd record here), and the two
    reader generations must keep working:

      - OLD reader (ENVELOPE_SCHEMA) over the mixed stream: from_json
        ignores unknown JSON fields, so v2 records parse identically
        to v1 — the query ASSERTS this by counting v1-reader
        successes per version (must equal n; a regression would
        surface as a count mismatch against the oracle, which never
        parses JSON at all);
      - NEW reader (ENVELOPE_SCHEMA_V2) over the same stream: v1
        records parse with lsn/source_version NULL, v2 records
        surface the evolved fields — pinned by the lsn stats.

    One pass each through the REAL codec (render_change_envelope /
    render_change_envelope_v2 -> parse_debezium)."""
    changes, _ = _streams(spark, sf_dir)
    is_v2 = F.col("seq") % 3 == 0
    env = changes.select(
        "seq",
        F.when(
            is_v2,
            render_change_envelope_v2(
                F.col("op"),
                F.col("ts_ms"),
                F.col("txn_id"),
                F.col("before"),
                F.col("after"),
                (F.col("seq") * 1000).cast("long"),
                F.lit("2"),
            ),
        )
        .otherwise(
            render_change_envelope(
                F.col("op"),
                F.col("ts_ms"),
                F.col("txn_id"),
                F.col("before"),
                F.col("after"),
            )
        )
        .alias("value"),
    )
    new_reader = parse_debezium(env, schema=ENVELOPE_SCHEMA_V2)
    old_reader = parse_debezium(env)
    old_ok = old_reader.filter(F.col("kind") == "change").select(
        "seq", F.lit(1).alias("ok_v1")
    )
    return (
        new_reader.filter(F.col("kind") == "change")
        .join(old_ok, "seq", "left")
        .withColumn(
            "schema_version",
            F.when(F.col("source_version") == "2", 2).otherwise(1),
        )
        .groupBy(F.col("schema_version").cast("long").alias("schema_version"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("ok_v1").alias("n_v1_reader_ok"),
            F.count("lsn").alias("n_with_lsn"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
            F.countDistinct("txn_id").alias("n_txn"),
        )
    )
