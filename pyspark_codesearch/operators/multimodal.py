"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
transforms run as Arrow-batched ``mapInPandas`` so each worker touches a
bounded iterator of record batches (never materializing a partition).

The decode kernels are STUBBED (no image/audio libs in this container —
see ``DecoderUnavailable`` / the deterministic fake): the Spark-side
plumbing — schema, batch iteration, partition sizing, UDF signatures —
is real and tested. Swapping in PIL/ffmpeg later changes only
``_decode_image_bytes``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, n_bytes int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha16 string, "
    "feat array<float>, decode_status string"
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decoder slot; the fake path never raises."""


def _decode_image_bytes(payload: bytes) -> np.ndarray:
    """REAL decoder slot. No imaging libs in this container."""
    raise DecoderUnavailable("image decode requires PIL/opencv; use fake_decode=True")


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: bytes -> md5-seeded vector."""
    h = hashlib.md5(payload or b"").digest()
    vals = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (vals.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def synth_media_rows(n: int = 64, seed: int = 123) -> list[tuple]:
    """Deterministic fake media rows, pure python/numpy (Spark-free).

    Shared by :func:`synth_media` AND the driver's DuckDB VALUES oracle for
    ``multimodal_features`` — both sides derive from the same rng stream."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i, kind, bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 256)), int(rng.integers(16, 256)), len(payload),
            )
        )
    return rows


def synth_media(spark, n: int = 64, seed: int = 123) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata)."""
    return spark.createDataFrame(synth_media_rows(n, seed), MEDIA_SCHEMA)


def features_oracle_sql(n: int = 64, seed: int = 123) -> str:
    """DuckDB VALUES oracle pinning the ``multimodal_features`` entry by
    value: every projected column (media_id, kind, n_bytes, sha16,
    decode_status) is pure-python computable from the seeded row stream —
    no Spark, no table dependence."""
    vals = ", ".join(
        f"({i}, '{kind}', {n_bytes}, "
        f"'{hashlib.sha256(bytes(payload)).hexdigest()[:16]}', 'fake')"
        for i, kind, payload, _mime, _w, _h, n_bytes in synth_media_rows(n, seed)
    )
    return (
        "SELECT * FROM (VALUES "
        + vals
        + ") AS t(media_id, kind, n_bytes, sha16, decode_status) ORDER BY media_id"
    )


def extract_features(
    media: DataFrame, *, fake_decode: bool = True, dim: int = 8, batch_rows: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator-of-batches form: per-worker setup (a model load, in real
    life) happens once per partition, then streams Arrow batches —
    the pattern the reference's batch-32 BGE embedder (bge_embedder.py
    :86-96) maps to in Spark.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition setup would go here (load model once)
        for pdf in batches:
            feats, status = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if fake_decode:
                    feats.append([float(x) for x in _fake_feature(b, dim)])
                    status.append("fake")
                else:
                    try:
                        _decode_image_bytes(b)
                        status.append("ok")  # pragma: no cover
                        feats.append([0.0] * dim)  # pragma: no cover
                    except DecoderUnavailable:
                        feats.append([0.0] * dim)
                        status.append("decoder_unavailable")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "sha16": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()[:16]
                        for p in pdf["payload"]
                    ],
                    "feat": feats,
                    "decode_status": status,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: 1 video row -> N frame-descriptor rows.

    Frame extraction itself is stubbed (no ffmpeg); the explode shape,
    deterministic frame ids and partitioning are the real contract.
    """
    frames = F.transform(
        F.sequence(F.lit(0), F.floor(F.col("n_bytes") / (every_n * 16)).cast("int")),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.concat_ws("_", F.col("media_id"), i).alias("frame_id"),
        ),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_no").alias("frame_no"), F.col("f.frame_id").alias("frame_id"))
    )
