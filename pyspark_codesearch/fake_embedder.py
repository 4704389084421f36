"""Deterministic text embedder (feature hashing), stand-in for BGE.

The reference embeds with BGE-large (bge_embedder.py:52-120, torch —
not available in this container). The Spark-side plumbing (vector
columns, cosine scoring, normalization) is real; only the encoder is
swapped for a deterministic hashing embedder so tests are exact and
self-contained: analyzer tokens are feature-hashed (md5) into ``dim``
buckets with a sign bit, then L2-normalized — like BGE's output, vectors
are unit-norm so cosine == dot (bge_embedder.py:104-106).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .analysis import tokenize_py

DIM = 16


def _bucket_sign(token: str, dim: int) -> tuple[int, float]:
    h = hashlib.md5(token.encode()).digest()
    bucket = int.from_bytes(h[:4], "little") % dim
    sign = 1.0 if h[4] & 1 else -1.0
    return bucket, sign


def embed_py(text: str, dim: int = DIM) -> list[float]:
    v = np.zeros(dim, dtype=np.float64)
    for t in tokenize_py(text):
        b, s = _bucket_sign(t, dim)
        v[b] += s
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return [float(x) for x in v]


def embed_pandas(texts, dim: int = DIM):
    """pandas Series[str] -> Series[list[float]] (used inside pandas UDFs)."""
    return texts.map(lambda t: embed_py(t or "", dim))


def cosine_py(a, b) -> float:
    return float(np.dot(np.asarray(a), np.asarray(b)))


def embed_texts(df, text_col: str = "text", out_col: str = "embedding", dim: int = DIM):
    """Distributed embedding via mapInPandas (iterator-of-batches).

    The Spark shape of the reference's batch-32 BGE embedder
    (bge_embedder.py:52-120): per-partition setup happens ONCE (where a
    real model would load), then Arrow batches stream through. Swapping
    the hashing encoder for a torch model changes only the setup line.
    """
    from collections.abc import Iterator

    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition setup (model load) would go here
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = embed_pandas(pdf[text_col], dim)
            yield pdf

    return df.mapInPandas(run, schema)
