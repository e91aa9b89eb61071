"""Sinks (SURVEY.md S3/S4/S6).

S3 console sink: `to_console`. S4 side-output/dead-letter: Spark has
no OutputTag side outputs (reference:
DebeziumTransactionReconstructor.java:133,151,167), so the engine uses
the foreachBatch dual-sink idiom — one parsed stream, two filtered
writes inside the same batch function, atomically versioned by the
streaming epoch. S6: checkpointed offsets+state via checkpointLocation
(per-batch atomic commit — strictly stronger than the reference's 60 s
checkpoint interval, :37).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def to_console(stream: DataFrame, mode: str = "append") -> StreamingQuery:
    """S3: the reference's print() sink (reference :92)."""
    return stream.writeStream.format("console").outputMode(mode).start()


def split_dead_letter(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route rows: (good, dead_letter) by the parse discriminator
    (kind IS NULL == the reference's invalid-events side output)."""
    return (
        parsed.filter(F.col("kind").isNotNull()),
        parsed.filter(F.col("kind").isNull()),
    )


def dual_sink_query(
    parsed: DataFrame,
    good_dir: str,
    dead_dir: str,
    checkpoint_dir: str,
    transform_good: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """S4: one streaming query, two parquet sinks via foreachBatch.

    Both writes happen inside one micro-batch epoch; on restart from
    the checkpoint a replayed epoch overwrites its own partition
    directory (idempotent exactly-once to files).
    """
    os.makedirs(good_dir, exist_ok=True)
    os.makedirs(dead_dir, exist_ok=True)

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        good, dead = split_dead_letter(df)
        if transform_good is not None:
            good = transform_good(good)
        good.write.mode("overwrite").parquet(os.path.join(good_dir, f"epoch={epoch_id}"))
        dead.select("seq", "value").write.mode("overwrite").parquet(
            os.path.join(dead_dir, f"epoch={epoch_id}")
        )

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
