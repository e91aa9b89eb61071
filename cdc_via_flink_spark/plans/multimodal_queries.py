"""Multimodal declared queries (SURVEY.md X4): binary payload columns
with typed metadata; decode via the stubbed-but-real mapInPandas path.

The oracle never runs Python — it recomputes the deterministic fake
decode from octet_length/ascii in SQL, so parity proves the Arrow
binary plumbing produced exactly the declared bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.operators.multimodal import (
    attach_payload,
    decode_meta,
    payload_stats_by_group,
    sample_frames,
)
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table


@query(
    "mm_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha,
       upper(hex(encode(substring(text, 1, 4)))) AS magic
FROM documents WHERE doc_id % 9 = 0
""",
    tags=("X4", "binary"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column: byte length, content digest, magic-bytes
    hex — the metadata a media-shard manifest carries."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 0)
    p = attach_payload(d)
    return p.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
        F.upper(F.hex(F.substring(F.col("text"), 1, 4).cast("binary"))).alias("magic"),
    )


@query(
    "mm_decode_stub",
    oracle="""
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         ascii(substring(text, 1, 1)) AS first_byte
  FROM documents
)
SELECT doc_id, n_bytes,
       n_bytes % 64 + 16 AS width,
       (n_bytes * 7 + first_byte) % 64 + 16 AS height,
       n_bytes % 10 + 1 AS n_frames,
       (n_bytes * 31 + first_byte) % 1000003 AS checksum
FROM b
""",
    tags=("X4", "decode", "mapInPandas"),
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed media decode through the REAL mapInPandas/Arrow binary
    path (operators/multimodal.py): the oracle recomputes the
    deterministic fake in SQL, so a match proves batch shape, binary
    transfer, and schema all round-trip."""
    d = load_table(spark, sf_dir, "documents")
    return decode_meta(attach_payload(d))


@query(
    "mm_frame_sample",
    oracle="""
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         ascii(substring(text, 1, 1)) AS first_byte
  FROM documents WHERE doc_id % 11 = 0
),
f AS (
  SELECT doc_id, n_bytes, first_byte,
         unnest(range(0, n_bytes % 10 + 1, 3)) AS frame_idx
  FROM b
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       (n_bytes * 131 + first_byte * 7 + frame_idx * 1009) % 1000003 AS frame_crc
FROM f
""",
    tags=("X4", "frames", "mapInPandas"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the row-expanding mapInPandas path
    (operators/multimodal.py::sample_frames): every 3rd frame of each
    payload. The oracle recomputes frame indices and crcs in SQL;
    frame_bytes stay Spark-side (binary payloads don't cross the
    oracle boundary, as at 100 TB they wouldn't cross the network)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    return sample_frames(attach_payload(d), step=3).select(
        "doc_id", "frame_idx", "frame_crc"
    )


@query(
    "mm_payload_stats_by_source",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes,
       CAST(CAST(sum(octet_length(encode(text))) AS DOUBLE) / count(*)
            AS DOUBLE) AS mean_bytes
FROM documents GROUP BY source
""",
    tags=("X4", "applyInPandas", "grouped-map"),
)
def mm_payload_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source payload QA stats through the grouped-map
    applyInPandas surface (operators/multimodal.py::payload_stats_by_group)
    — the oracle recomputes the same stats in SQL, proving the Arrow
    group round-trip byte-exactly."""
    d = load_table(spark, sf_dir, "documents")
    return payload_stats_by_group(attach_payload(d), "source")
