#!/usr/bin/env python
"""Measure the chunker token-count fallback against real cl100k_base.

This container has no network and no tiktoken wheel, so the divergence
of chunker.count_tokens' fallback (exact cl100k pre-tokenizer pieces +
a per-piece length estimate) cannot be measured in-sandbox. Run this
script in ANY environment that has tiktoken installed:

    python scripts/tiktoken_divergence.py [documents.parquet]

It reports, over the fixture corpus (default /root/testdata/sf0.01):
- per-document token-count relative error (mean / p50 / p95 / max);
- chunk-count delta per document when chunk_text_py runs with the
  fallback counter vs the real encoder;
- the share of pre-tokenizer pieces whose estimated cost is exact.

Paste the summary into chunker.py's module docstring as the measured
bound once obtained.
"""

from __future__ import annotations

import statistics
import sys


def main() -> int:
    try:
        import tiktoken
    except ImportError:
        print(
            "tiktoken is not installed here — run this script in an "
            "environment with tiktoken to obtain the measured bound."
        )
        return 1

    import duckdb

    sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
    import importlib

    import pyspark_codesearch.chunker as ch

    enc = tiktoken.get_encoding("cl100k_base")
    real = lambda t: len(enc.encode(t))  # noqa: E731

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/documents.parquet"
    rows = duckdb.connect().execute(f"SELECT doc_id, text FROM '{path}'").fetchall()

    # PASS 1 — real-tiktoken state: ch.count_tokens is the exact encoder
    # (the tiktoken import branch), so these chunk counts are ground truth.
    # importlib.reload mutates the module IN PLACE, so both passes must
    # fully complete before/after the reload, never mixing the two.
    assert ch.count_tokens("hello") == real("hello"), (
        "chunker did not pick up the tiktoken branch — stale module?"
    )
    real_chunks = {doc_id: len(ch.chunk_text_py(text)) for doc_id, text in rows}

    # PASS 2 — reload with tiktoken masked: ch.count_tokens is the fallback
    masked_out = sys.modules.pop("tiktoken")
    sys.modules["tiktoken"] = None  # type: ignore[assignment]
    try:
        importlib.reload(ch)
        rel_errs, chunk_deltas = [], []
        for doc_id, text in rows:
            r, f = real(text), ch.count_tokens(text)
            rel_errs.append(abs(f - r) / max(r, 1))
            chunk_deltas.append(abs(len(ch.chunk_text_py(text)) - real_chunks[doc_id]))
    finally:
        sys.modules["tiktoken"] = masked_out
        importlib.reload(ch)  # restore the tiktoken-backed module for callers

    rel_errs.sort()
    print(f"docs: {len(rows)}")
    print(
        "token-count rel err: "
        f"mean={statistics.mean(rel_errs):.4f} "
        f"p50={rel_errs[len(rel_errs) // 2]:.4f} "
        f"p95={rel_errs[int(len(rel_errs) * 0.95)]:.4f} "
        f"max={rel_errs[-1]:.4f}"
    )
    print(
        f"chunk-count delta: mean={statistics.mean(chunk_deltas):.3f} "
        f"max={max(chunk_deltas)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
