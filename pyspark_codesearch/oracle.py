"""Pure-python BM25 oracle for rank-identity tests.

Shares the tokenizer implementation (:func:`analysis.tokenize_py`) with the
engine — SURVEY §5/§7: "the oracle and the UDF must share one
implementation imported by both". Encodes the reference's *declared*
semantics (ES BM25, k1=1.2 b=0.75; es_indexer.py mapping + SURVEY §2.5),
with exact (unquantized) doc lengths — the documented deviation from
Lucene-the-binary's 1-byte norm quantization.
"""

from __future__ import annotations

import math
from collections import Counter

from .analysis import tokenize_py
from .indexing import B, K1


class OracleIndex:
    def __init__(self, docs: dict[int, str], k1: float = K1, b: float = B):
        """docs: doc_id -> raw content."""
        self.k1, self.b = k1, b
        self.tf: dict[int, Counter] = {}
        self.doc_len: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, content in docs.items():
            toks = tokenize_py(content)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.doc_len[doc_id] = len(toks)
            for t in c:
                self.df[t] += 1
        self.n_docs = len(docs)
        self.avgdl = (sum(self.doc_len.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, query_terms: list[str]) -> float:
        k1, b = self.k1, self.b
        dl = self.doc_len[doc_id]
        avgdl = max(self.avgdl, 1e-9)
        s = 0.0
        # fixed accumulation order (sorted unique terms) for reproducibility
        for t, qtf in sorted(Counter(query_terms).items()):
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                continue
            s += qtf * self.idf(t) * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return s

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k [(doc_id, score)] — score desc, doc_id asc tie-break."""
        qterms = tokenize_py(query)
        if not qterms:
            return []
        qset = set(qterms)
        cands = {d for d, c in self.tf.items() if qset & c.keys()}
        ranked = sorted(
            ((d, self.score(d, qterms)) for d in cands),
            key=lambda x: (-x[1], x[0]),
        )
        return ranked[:k]
