"""Multimodal column plumbing: opaque binary media + typed metadata.

The image/audio codecs are NOT in this container, so the decode step is
stubbed (clearly marked), but everything Spark-level is real and tested:
schema, Arrow batch shapes, mapInPandas signatures, partition sizing.
Swap `_decode_stub` for a real decoder (PIL/torchaudio/ffmpeg) and the
pipeline is production-shaped.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 8


def media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table: bytes derived from the text column,
    typed metadata derived from content hash — real binary-column plumbing
    without real codecs.

    The metadata hash is the first 8 hex chars of md5(text) as an integer
    (NOT crc32): md5 is the one hash both Spark and DuckDB compute
    identically over strings, which makes every downstream derivation —
    including frame sampling — value-checkable against a pure-SQL oracle
    (DuckDB: ``('0x' || substr(md5(text), 1, 8))::BIGINT``)."""
    h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (h % 3 + 1).cast("int"),
        ).alias("media_type"),
        (h % 1920 + 1).cast("int").alias("width"),
        (h % 1080 + 1).cast("int").alias("height"),
        (h % 600000).cast("int").alias("duration_ms"),
    )


def _decode_stub(media: bytes, media_type: str) -> np.ndarray:
    """STUB: real decoders (PIL / soundfile / av) are unavailable in this
    container. Deterministic fake: pixels/samples derived from md5(media).
    Raises for unknown media types exactly like a real decoder would."""
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {media_type}")
    d = hashlib.md5(bytes(media)).digest()
    return np.frombuffer(d, dtype=np.uint8).astype(np.float64) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature
    matrix out (batch-vectorized post-decode). Output: fixed-dim
    array<double> + a content hash usable as an exact-dup key."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m, t in zip(pdf["media"], pdf["media_type"]):
                raw = _decode_stub(m, t)
                feats.append(raw[:FEATURE_DIM].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": feats,
                    "content_md5": [
                        hashlib.md5(bytes(m)).hexdigest() for m in pdf["media"]
                    ],
                }
            )

    return media.mapInPandas(
        run, f"doc_id long, features array<double>, content_md5 string"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (doc_id, frame_ts_ms,
    frame_hash) per sampled timestamp — the explode/fan-out shape a real
    frame extractor produces, with the decoder stubbed.

    frame_hash = md5(md5_hex(media) ‖ ':' ‖ frame_idx) — the outer md5 is
    over a STRING composition of the (binary-computed) content digest and
    the frame index, so the whole fan-out is value-checkable in plain SQL
    (DuckDB: ``md5(md5(text) || ':' || g::VARCHAR)`` with a lateral
    ``generate_series`` — see entry_queries.q_frame_sample)."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video/mp4"]
            if len(vids) == 0:
                yield pd.DataFrame({"doc_id": [], "frame_ts_ms": [], "frame_hash": []})
                continue
            # fan-out plumbing vectorized: np.repeat for doc ids, one
            # concatenated arange for timestamps; only the (stubbed)
            # per-frame decode itself touches Python per frame
            n_frames = np.clip(
                vids["duration_ms"].to_numpy(np.int64) // every_ms, 1, 32
            )
            out_doc = np.repeat(vids["doc_id"].to_numpy(np.int64), n_frames)
            total = int(n_frames.sum())
            starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
            frame_idx = np.arange(total) - np.repeat(starts, n_frames)
            out_ts = (frame_idx * every_ms).astype(np.int32)
            bases = [hashlib.md5(bytes(m)).hexdigest() for m in vids["media"]]
            out_hash = [
                hashlib.md5(f"{bases[b]}:{int(i)}".encode()).hexdigest()
                for b, i in zip(np.repeat(np.arange(len(bases)), n_frames), frame_idx)
            ]
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_ts_ms": out_ts, "frame_hash": out_hash}
            )

    return media.mapInPandas(run, "doc_id long, frame_ts_ms int, frame_hash string")
