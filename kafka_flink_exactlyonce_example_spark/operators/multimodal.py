"""Multimodal column pipeline: image / audio / video as opaque binary
columns with typed metadata (SURVEY.md §2.10, "multimodal columns").

The pattern a 100 TB training-data pipeline needs:

- payloads travel as ``binary`` columns next to typed metadata
  (mime, width/height, sample rate, frame count) — Spark never
  interprets the bytes, so scans stay columnar and prunable;
- decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
  stages — one Python process per partition, one Arrow batch at a
  time, so memory is bounded by batch size, not partition size;
- per-frame/per-window expansion yields MORE rows than the input —
  mapInPandas is the row-expanding escape hatch (UDTF semantics with
  Arrow throughput).

No real codec libraries ship in this container, so the decoders are
deterministic stubs behind ``_decode_image`` / ``_decode_audio`` —
clearly marked, swap in PIL/soundfile/ffmpeg in production. The
Spark-side contract (schemas, batch iteration, row expansion,
partition parallelism) is real and tested. All queries rows-only
(DuckDB can't run the Python stages).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — production replaces with PIL.Image.open(BytesIO).

    Deterministic fake: tile the payload bytes into a (height, width)
    uint8 array so downstream stages (resize, stats) exercise real
    ndarray shapes.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = (width * height + buf.size - 1) // buf.size
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (production: PIL/cv2)."""
    h, w = img.shape
    rows = (np.arange(out_h) * h // out_h).astype(np.intp)
    cols = (np.arange(out_w) * w // out_w).astype(np.intp)
    return img[np.ix_(rows, cols)]


def _decode_audio(payload: bytes, rate: int) -> np.ndarray:
    """STUB decoder — production replaces with soundfile/librosa.
    Deterministic fake: bytes → centered float32 samples in [-1, 1)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    return (buf.astype(np.float32) - 128.0) / 128.0


@query("q_image_pipeline")  # rows-only: Python decode stage
def q_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize(8×8) → per-image feature stats, one mapInPandas
    stage. Metadata (width/height) is typed columns; the payload is an
    opaque binary column synthesized from document text."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit("image/fake").alias("mime"),
        # typed metadata, derived deterministically from the row
        (F.col("doc_id") % 16 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 8 + 8).cast("int").alias("height"),
    )

    out_schema = (
        "doc_id long, width int, height int, "
        "px_mean double, px_min int, px_max int, thumb_mean double"
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image(r.payload, r.width, r.height)
                thumb = _resize_nearest(img, 8, 8)
                rows.append(
                    (
                        r.doc_id,
                        r.width,
                        r.height,
                        round(float(img.mean()), 6),
                        int(img.min()),
                        int(img.max()),
                        round(float(thumb.mean()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_mean",
                    "px_min",
                    "px_max",
                    "thumb_mean",
                ],
            )

    return d.mapInPandas(stage, schema=out_schema).orderBy("doc_id")


@query("q_frame_sample")  # rows-only: row-expanding Python stage
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: treat the payload as a frame sequence
    (fixed 32-byte frames), emit every 4th frame as its OWN row —
    mapInPandas producing more rows than it consumes (the shape a
    video→training-images pipeline needs). Output partitioning follows
    the input, so a downstream per-frame stage stays shuffle-free."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    frame_bytes, stride = 32, 4
    out_schema = "doc_id long, frame_idx int, frame_mean double, n_frames int"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for r in pdf.itertuples(index=False):
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                n_frames = max(len(buf) // frame_bytes, 1)
                frames = buf[: n_frames * frame_bytes]
                if frames.size < n_frames * frame_bytes:  # short payload
                    frames = np.pad(frames, (0, n_frames * frame_bytes - frames.size))
                frames = frames.reshape(n_frames, frame_bytes)
                for idx in range(0, n_frames, stride):
                    out.append(
                        (
                            r.doc_id,
                            idx,
                            round(float(frames[idx].mean()), 6),
                            n_frames,
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_mean", "n_frames"]
            )

    return d.mapInPandas(stage, schema=out_schema)


@query("q_audio_features")  # rows-only: Python decode stage
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: decode stub → windowed RMS + zero-cross
    rate, vectorized numpy inside each Arrow batch (no per-sample
    Python)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit(16000).alias("sample_rate"),
    )
    win = 64
    out_schema = "doc_id long, n_samples int, rms double, zero_cross double, n_windows int"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = _decode_audio(r.payload, r.sample_rate)
                rms = float(np.sqrt(np.mean(x * x)))
                zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                rows.append(
                    (r.doc_id, len(x), round(rms, 6), round(zc, 6), max(len(x) // win, 1))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "rms", "zero_cross", "n_windows"],
            )

    return d.mapInPandas(stage, schema=out_schema)


@query("q_phash_dedup")  # rows-only: Python decode stage feeds native dedup
def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup — the multimodal sibling of
    q_exact_dedup/q_simhash and the one dedup modality the text family
    can't cover: decode (stub) → 8×8 nearest resize → mean-threshold
    bits → 64-bit pHash, computed in ONE Arrow-batched mapInPandas
    stage; the dedup itself then runs NATIVELY on the returned hash
    (64-bit groupBy keep-lowest, exactly the digest discipline of
    q_exact_dedup — only 8 bytes per image ever shuffle, never
    payloads). Output: one row per pHash bucket with >1 image —
    keeper, copy count, and an example duplicate.

    At 100 TB the Python stage is the only non-JVM hop and is bounded
    by Arrow batch size; swap the stub for PIL and the plan is
    unchanged. Rows-only by the multimodal contract (DuckDB can't run
    the Python stage), deterministic across runs by construction."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        (F.col("doc_id") % 16 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 8 + 8).cast("int").alias("height"),
    )
    out_schema = "doc_id long, phash long"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image(r.payload, r.width, r.height)
                small = _resize_nearest(img, 8, 8).astype(np.float64)
                bits = (small > small.mean()).flatten()
                ph = 0
                for b in bits:  # 64 bits → one long
                    ph = (ph << 1) | int(b)
                # keep within signed int64 for the Spark long column
                if ph >= 1 << 63:
                    ph -= 1 << 64
                rows.append((r.doc_id, ph))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    hashed = d.mapInPandas(stage, schema=out_schema)
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("example_dup"),
        )
        .filter(F.col("n_copies") > 1)
    )
