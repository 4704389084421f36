"""Pure-python oracle for the reference-parity search layer.

Implements the reference's declared pipeline exactly (DSL semantics from
SURVEY §2.5 + python post-processing from es_search_service.py), sharing
the tokenizer and embedder with the engine. Used only by tests.
"""

from __future__ import annotations

import math
from collections import Counter

from .analysis import tokenize_py
from .fake_embedder import cosine_py, embed_py
from .indexing import B, K1
from .search import BM25_CLAUSE_BOOST, SERVICE_FIELDS


class FieldOracle:
    def __init__(self, docs: dict[str, str]):
        """docs: id -> field text; only docs with >=1 token count."""
        self.tf, self.dl, self.df = {}, {}, Counter()
        for i, text in docs.items():
            toks = tokenize_py(text or "")
            if not toks:
                continue
            c = Counter(toks)
            self.tf[i] = c
            self.dl[i] = len(toks)
            for t in c:
                self.df[t] += 1
        self.n = len(self.tf)
        self.avgdl = sum(self.dl.values()) / self.n if self.n else 0.0

    def score(self, i: str, qterms: Counter) -> float | None:
        if i not in self.tf:
            return None
        s, matched = 0.0, False
        for t, qtf in sorted(qterms.items()):
            tf = self.tf[i].get(t, 0)
            if tf == 0:
                continue
            matched = True
            idf = math.log(1.0 + (self.n - self.df[t] + 0.5) / (self.df[t] + 0.5))
            s += qtf * idf * tf / (tf + K1 * (1 - B + B * self.dl[i] / max(self.avgdl, 1e-9)))
        return s if matched else None


class SearchOracle:
    def __init__(self, papers_pdf, chunks_pdf):
        self.papers = {r.paper_id: r for r in papers_pdf.itertuples()}
        self.chunks = {r.doc_id: r for r in chunks_pdf.itertuples()}
        self.chunk_fields = {
            "title": FieldOracle({r.doc_id: r.title for r in chunks_pdf.itertuples()}),
            "chunk_text": FieldOracle({r.doc_id: r.chunk_text for r in chunks_pdf.itertuples()}),
        }
        self.paper_fields = {
            "title": FieldOracle({r.paper_id: r.title for r in papers_pdf.itertuples()}),
            "abstract": FieldOracle({r.paper_id: r.abstract for r in papers_pdf.itertuples()}),
        }
        self.chunk_embs = {
            r.doc_id: embed_py(r.chunk_text) for r in chunks_pdf.itertuples()
        }

    def best_fields(self, indexes, ids, query, boosts) -> dict[str, float]:
        qterms = Counter(tokenize_py(query))
        out = {}
        if not qterms:
            return out
        for i in ids:
            best = None
            for f, fo in indexes.items():
                if f not in boosts:
                    continue
                s = fo.score(i, qterms)
                if s is not None:
                    bs = boosts[f] * s
                    best = bs if best is None or bs > best else best
            if best is not None:
                out[i] = best
        return out

    def search(self, query, max_results=10, mode="fulltext", fields=None,
               author=None, date_from=None, date_to=None, normalize=True,
               query_vec=None):
        fields = fields or SERVICE_FIELDS
        size = max_results * 2
        clause_scores: dict[str, float] = {}
        if mode in ("fulltext", "hybrid"):
            boost = BM25_CLAUSE_BOOST if mode == "hybrid" else 1.0
            for i, s in self.best_fields(self.chunk_fields, self.chunks, query, fields).items():
                clause_scores[i] = clause_scores.get(i, 0.0) + boost * s
        if mode in ("hybrid", "semantic"):
            qv = query_vec if query_vec is not None else embed_py(query)
            for i, v in self.chunk_embs.items():
                clause_scores[i] = clause_scores.get(i, 0.0) + (cosine_py(qv, v) + 1.0)
        # A1 terms agg on paper_id
        buckets: dict[str, list[tuple[str, float]]] = {}
        for cid, s in clause_scores.items():
            buckets.setdefault(self.chunks[cid].paper_id, []).append((cid, s))
        rows = []
        for pid, hits in buckets.items():
            hits.sort(key=lambda x: (-x[1], x[0]))
            rows.append({
                "paper_id": pid,
                "matching_chunks": len(hits),
                "score": hits[0][1],
                "best_chunk_id": hits[0][0],
            })
        # bucket survival: doc_count desc, key asc, top `size`
        rows.sort(key=lambda r: (-r["matching_chunks"], r["paper_id"]))
        rows = rows[:size]
        # stable re-sort by score (reference list.sort)
        rows.sort(key=lambda r: -r["score"])
        # post-filters
        out = []
        for r in rows:
            p = self.papers[r["paper_id"]]
            if author and author.lower() not in " ".join(p.authors).lower():
                continue
            if date_from and p.publish_date < date_from:
                continue
            if date_to and p.publish_date > date_to:
                continue
            if not r["paper_id"] or not p.title:
                continue
            out.append(r)
        out = out[:max_results]
        if normalize and out:
            scores = [r["score"] for r in out]
            mn, mx = min(scores), max(scores)
            for r in out:
                r["score"] = 1.0 if mx == mn else round((r["score"] - mn) / (mx - mn), 6)
        return out

    def find_similar_papers(self, paper_id, max_results=10, normalize=True):
        """es_search_service.py:416-476 semantics, python-literal."""
        p = self.papers.get(paper_id)
        if p is None:
            return []
        qv = embed_py(f"{p.title} {p.abstract}")
        rows = self.search(
            "", max_results + 5, mode="semantic", normalize=False, query_vec=qv
        )
        rows = [r for r in rows if r["paper_id"] != paper_id][:max_results]
        if normalize and rows:
            scores = [r["score"] for r in rows]
            mn, mx = min(scores), max(scores)
            for r in rows:
                r["score"] = 1.0 if mx == mn else round((r["score"] - mn) / (mx - mn), 6)
        return rows

    def get_chunks_for_papers(self, paper_ids, query=None, max_chunks_per_paper=5):
        """es_search_service.py:339-414 semantics, python-literal."""
        qterms = Counter(tokenize_py(query)) if query else None
        out = {}
        for pid in paper_ids:
            cs = [c for c in self.chunks.values() if c.paper_id == pid]
            if qterms:
                scored = [
                    (c, self.chunk_fields["chunk_text"].score(c.doc_id, qterms) or 0.0)
                    for c in cs
                ]
                scored.sort(key=lambda x: (-x[1], x[0].chunk_index))
            else:
                scored = sorted(((c, 0.0) for c in cs), key=lambda x: x[0].chunk_index)
            out[pid] = scored[:max_chunks_per_paper]
        return out

    def search_papers(self, query, max_results=10, fields=None):
        fields = fields or {k: v for k, v in SERVICE_FIELDS.items() if k != "chunk_text"}
        size = max_results * 2
        scores = self.best_fields(self.paper_fields, self.papers, query, fields)
        # doc_count==1 buckets: survival is key-asc
        survivors = sorted(scores)[:size]
        ranked = sorted(((p, scores[p]) for p in survivors), key=lambda x: (-x[1], x[0]))
        return ranked[:max_results]
