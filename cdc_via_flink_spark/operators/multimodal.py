"""Multimodal column plumbing (SURVEY.md X4).

Convention: a modality column is an opaque BinaryType payload plus a
typed metadata struct — the pattern that scales to image/audio/video
shards at 100 TB (payload bytes never leave the executor; metadata is
columnar and prunable).

The decode step is where a real image/audio codec would run. Those
libraries are not in this container, so `decode_meta` is a
DETERMINISTIC STUB (documented fake: dimensions derived from payload
bytes) — but the Spark-side plumbing is real and load-bearing:
mapInPandas over Arrow record batches, binary columns in/out, schema
declared up front, batch-at-a-time vectorized Python. Swapping the
fake for PIL/ffmpeg changes only the inner function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, checksum long"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the binary payload + metadata struct from a text column
    (fixture stand-in for real media bytes)."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode(n_bytes: int, first_byte: int) -> tuple[int, int, int]:
    """Deterministic stand-in for a media decoder. Real decoders:
    PIL.Image.open / soundfile / av — NOT installed here by design."""
    width = n_bytes % 64 + 16
    height = (n_bytes * 7 + first_byte) % 64 + 16
    n_frames = n_bytes % 10 + 1
    return width, height, n_frames


def decode_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode pass: binary payload -> typed media metadata.

    Arrow moves the binary column to Python in batches; the inner loop
    is vectorized pandas (no per-row Python in the driver, no UDF
    re-pickling per row).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("int64")
            first = payload.map(lambda b: b[0] if len(b) else 0).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "width": n_bytes % 64 + 16,
                    "height": (n_bytes * 7 + first) % 64 + 16,
                    "n_frames": n_bytes % 10 + 1,
                    "checksum": (n_bytes * 31 + first) % 1_000_003,
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_crc long, frame_bytes binary"


def sample_frames(df: DataFrame, step: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Row-EXPANDING mapInPandas pass: every `step`-th frame of each
    media payload (video frame sampling / audio windowing shape).

    The stubbed "frame" is a deterministic byte slice + crc of the
    payload (real: av.decode / librosa.frames — not in this
    container). The Spark-side contract is the real one: one input
    batch yields a variable number of output rows, Arrow streams them
    back batch-at-a-time, and downstream operators see an ordinary
    (doc_id, frame_idx, bytes) frame table they can shuffle/join —
    payload bytes themselves never hit the driver. At 100 TB the
    input stays partition-parallel; peak executor memory is one Arrow
    batch of frames, not one document's full frame set.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("int64")
            first = payload.map(lambda b: b[0] if len(b) else 0).astype("int64")
            n_frames = n_bytes % 10 + 1
            ids, idxs, crcs, blobs = [], [], [], []
            for did, nb, fb, nf, raw in zip(
                pdf[id_col].astype("int64"), n_bytes, first, n_frames, payload
            ):
                for fi in range(0, int(nf), step):
                    ids.append(did)
                    idxs.append(fi)
                    crcs.append((int(nb) * 131 + int(fb) * 7 + fi * 1009) % 1_000_003)
                    blobs.append(raw[fi : fi + 16])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_crc": pd.Series(crcs, dtype="int64"),
                    "frame_bytes": pd.Series(blobs, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(gen, FRAME_SCHEMA)


GROUP_STATS_SCHEMA = (
    "source string, n_docs long, total_bytes long, max_bytes long, mean_bytes double"
)


def payload_stats_by_group(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Grouped-map applyInPandas pass: per-group payload statistics.

    The third sanctioned Python surface (after mapInPandas decode and
    the stateful assembler): groupBy().applyInPandas — one pandas
    frame per group key, Arrow both ways. Shape matters at scale: a
    group must fit one executor's memory (payload STATS do; raw
    payload concatenation would not — that variant belongs in
    mapInPandas with streaming aggregation). Real use: per-shard media
    QA (corrupt-rate, size distribution) before a training run.
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n_bytes = pdf["payload"].str.len().astype("int64")
        return pd.DataFrame(
            {
                "source": [pdf[group_col].iloc[0]],
                "n_docs": [len(pdf)],
                "total_bytes": [int(n_bytes.sum())],
                "max_bytes": [int(n_bytes.max())],
                "mean_bytes": [float(n_bytes.sum()) / len(pdf)],
            }
        )

    return (
        df.select(group_col, "payload")
        .groupBy(group_col)
        .applyInPandas(stats, GROUP_STATS_SCHEMA)
    )


PATCH_SCHEMA = (
    "doc_id long, patch_row long, patch_col long, px long, py long, patch_crc long"
)


def patch_grid(df: DataFrame, patch: int = 16, id_col: str = "doc_id") -> DataFrame:
    """Vision-transformer-style PATCH TILING: the decoded (width,
    height) raster becomes ceil(h/P) x ceil(w/P) patch rows — the
    preprocessing shape every image-training pipeline runs before
    embedding. Same row-expanding mapInPandas contract as
    sample_frames: Arrow batches in, a variable number of patch rows
    out, payload bytes never on the driver. The patch pixel fetch is
    stubbed (real: PIL crop / torchvision unfold — not in this
    container); indices and crcs are deterministic so the SQL oracle
    re-derives them exactly.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("int64")
            first = payload.map(lambda b: b[0] if len(b) else 0).astype("int64")
            width = n_bytes % 64 + 16  # _fake_decode
            height = (n_bytes * 7 + first) % 64 + 16
            ids, prs, pcs, pxs, pys, crcs = [], [], [], [], [], []
            for did, nb, fb, w, h in zip(
                pdf[id_col].astype("int64"), n_bytes, first, width, height
            ):
                n_rows = -(-int(h) // patch)
                n_cols = -(-int(w) // patch)
                for pr in range(n_rows):
                    for pc in range(n_cols):
                        ids.append(did)
                        prs.append(pr)
                        pcs.append(pc)
                        pxs.append(pc * patch)
                        pys.append(pr * patch)
                        crcs.append(
                            (int(nb) * 17 + int(fb) * 3 + pr * 31 + pc * 7)
                            % 1_000_003
                        )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "patch_row": pd.Series(prs, dtype="int64"),
                    "patch_col": pd.Series(pcs, dtype="int64"),
                    "px": pd.Series(pxs, dtype="int64"),
                    "py": pd.Series(pys, dtype="int64"),
                    "patch_crc": pd.Series(crcs, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(gen, PATCH_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, win_idx long, start_sample long, end_sample long, rms_q double"
)


def audio_windows(
    df: DataFrame, window: int = 400, hop: int = 160, id_col: str = "doc_id"
) -> DataFrame:
    """STFT-style AUDIO FRAMING: the payload is treated as 16-bit PCM
    (n_samples = 2 x n_bytes) and cut into overlapping windows of
    ``window`` samples every ``hop`` samples — the framing in front of
    any spectrogram/feature extractor. Payloads shorter than one
    window emit ZERO rows (the real edge case: silence-trimmed clips).
    The per-window energy is a deterministic stub (real: numpy over
    decoded samples); indices are exact so SQL re-derives them.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("int64")
            first = payload.map(lambda b: b[0] if len(b) else 0).astype("int64")
            ids, wis, starts, ends, rms = [], [], [], [], []
            for did, nb, fb in zip(pdf[id_col].astype("int64"), n_bytes, first):
                n_samples = int(nb) * 2
                n_windows = max(0, 1 + (n_samples - window) // hop)
                for wi in range(n_windows):
                    ids.append(did)
                    wis.append(wi)
                    starts.append(wi * hop)
                    ends.append(wi * hop + window)
                    rms.append(((int(nb) * 13 + int(fb) + wi * 97) % 9973) / 100.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(wis, dtype="int64"),
                    "start_sample": pd.Series(starts, dtype="int64"),
                    "end_sample": pd.Series(ends, dtype="int64"),
                    "rms_q": pd.Series(rms, dtype="float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(gen, AUDIO_WINDOW_SCHEMA)
