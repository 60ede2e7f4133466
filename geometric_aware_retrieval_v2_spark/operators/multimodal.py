"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partitioning, Arrow batch shape) fully real and
the codec layer stubbed (no image/audio libraries in this environment).

Pattern: media rows are (id, modality, payload binary, meta struct). Decode /
feature-extract run as ``mapInPandas`` over Arrow batches — the exact shape a
real pipeline uses with PIL/ffmpeg/torchvision; here the decode step is
either a deterministic fake (byte statistics standing in for pixels) or an
explicit NotImplementedError for real codecs.

``synth_media`` derives payloads deterministically from the documents table
(utf-8 bytes as the "encoded media"), so every downstream stat is
oracle-checkable against DuckDB byte functions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def synth_media(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """documents -> media table: payload = utf-8 bytes of content; metadata
    derived deterministically from doc_id (stable under repartitioning)."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.floor(F.length(F.col(content_col)) / 256) + 1).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col(content_col), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL-CODEC STUB: decoding actual image/audio/video requires PIL /
    torchaudio / ffmpeg, none of which exist in this container."""
    raise NotImplementedError(
        "real media decoding needs PIL/ffmpeg; use extract_features() for the "
        "deterministic byte-statistics fake that exercises the same plumbing"
    )


def extract_features(media: DataFrame, n_bins: int = 4) -> DataFrame:
    """Arrow-batched 'feature extraction' over binary payloads:
    (media_id, n_bytes, first_byte, byte_sum_mod, histogram array<double>).

    The NumPy body is the exact batch shape a real extractor uses (decode ->
    (n, features) ndarray per Arrow batch); the 'features' are deterministic
    byte statistics so tests and the DuckDB oracle can verify the plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, fb, bs, hists = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                ids.append(mid)
                nb.append(len(arr))
                fb.append(int(arr[0]) if len(arr) else -1)
                bs.append(int(arr.astype(np.int64).sum()) % 1_000_003)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                tot = max(1, len(arr))
                # raw ratios out: consumers that need fixed decimals round
                # JVM-side (F.round) so bit patterns match SQL round()
                hists.append((hist / tot).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": nb,
                    "first_byte": fb,
                    "byte_sum_mod": bs,
                    "histogram": hists,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema="media_id long, n_bytes long, first_byte int, byte_sum_mod long, "
        "histogram array<double>",
    )


def frame_sample(media: DataFrame, every: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing: slice every `every`-th byte window of the
    payload into its own row — the partition/explode shape of video frame
    extraction. -> (media_id, frame_no, frame_bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, fnos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, lo in enumerate(range(0, max(len(payload), 1), every)):
                    mids.append(mid)
                    fnos.append(i)
                    frames.append(bytes(payload[lo : lo + every]))
            yield pd.DataFrame(
                {"media_id": mids, "frame_no": fnos, "frame_bytes": frames}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, frame_no int, frame_bytes binary"
    )
