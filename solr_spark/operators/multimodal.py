"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference ingests rich documents through Tika (solr/contrib/extraction)
— text-centric. A 100TB training-data pipeline additionally needs binary
assets as first-class columns. This module provides the Spark-side
plumbing — schema, partitioning, Arrow-batched UDF signatures, batch
shapes — as real, tested code, while the actual codec work (JPEG decode,
audio resample, video frame extraction) is STUBBED: the image/audio
libraries are not in this container, so `decode=...` accepts either a
real decoder callable or the deterministic fake used by tests.

Design points for scale:
- assets are (asset_id, modality, payload binary, meta map) rows;
  payloads never enter a shuffle — feature extraction is mapInPandas
  over the scan, and downstream ops join on asset_id + features only;
- `spark.sql.files.maxPartitionBytes` bounds per-task payload memory;
- batch size for Arrow transfer is controlled by
  spark.sql.execution.arrow.maxRecordsPerBatch (payload-heavy tables
  should set it low, e.g. 64).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, modality string, payload binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = "asset_id long, modality string, n_bytes int, feature array<double>"


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque binary assets (stand-ins for image/audio)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                payload = (h * ((64 + i % 192) // len(h) + 1))[: 64 + i % 192]
                rows.append(
                    {
                        "asset_id": int(i),
                        "modality": ["image", "audio", "video"][i % 3],
                        "payload": payload,
                        "meta": {"w": str(32 + i % 64), "h": str(32 + i % 64)},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8-bin byte histogram,
    L1-normalized. Replace with PIL/librosa/pyav decode in production."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float64)
    return hist / max(hist.sum(), 1.0)


def real_decode(payload: bytes, modality: str) -> np.ndarray:
    """Production decoder hook — requires imaging/audio libs not present
    in this environment."""
    raise NotImplementedError(
        "binary decode requires PIL/librosa/pyav; pass decode=fake_decode "
        "or a real decoder callable"
    )


def extract_features(
    assets: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """Arrow-batched feature extraction over payload columns.

    mapInPandas keeps payloads inside the scan stage (no shuffle of
    binary data); output carries only ids + small feature vectors.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, m).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].str.len().astype("int32"),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling plumbing: emit one row per sampled 'frame'
    (fixed-stride payload slice — the real implementation would seek
    keyframes via pyav; the slicing/explode shape is what matters here)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_no": [], "frame": []}
            for aid, payload, modality in zip(
                pdf["asset_id"], pdf["payload"], pdf["modality"]
            ):
                if modality != "video":
                    continue
                for j, off in enumerate(range(0, len(payload), every_n_bytes)):
                    out["asset_id"].append(aid)
                    out["frame_no"].append(j)
                    out["frame"].append(payload[off : off + every_n_bytes])
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, schema="asset_id long, frame_no int, frame binary")


def resize_meta(assets: DataFrame, max_side: int = 32) -> DataFrame:
    """Metadata-only resize planning (pure column ops, no decode): the
    target dims each image would be resized to."""
    w = F.element_at("meta", "w").cast("int")
    h = F.element_at("meta", "h").cast("int")
    scale = F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    return assets.select(
        "asset_id",
        "modality",
        w.alias("w"),
        h.alias("h"),
        F.least(F.round(w * scale).cast("int"), F.lit(max_side)).alias("target_w"),
        F.least(F.round(h * scale).cast("int"), F.lit(max_side)).alias("target_h"),
    )
