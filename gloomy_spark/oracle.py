"""Slow, obviously-correct pure-Python oracle (differential testing).

Exhaustive tf/df dictionaries + full BM25 scoring over a list of
(doc_id, text). The engine must be rank-identical (top-k docIDs, score
desc / doc_id asc tie-break) and score-equal within 1e-9.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .config import DEFAULT_CONFIG, EngineConfig
from .textnorm import tokenize


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.tf: dict[str, dict[int, int]] = defaultdict(dict)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text, cfg)
            self.doclen[doc_id] = len(toks)
            counts = Counter(toks)
            for t, c in counts.items():
                self.tf[t][doc_id] = c
            for pos, t in enumerate(toks):
                self.positions[t].setdefault(doc_id, []).append(pos)
        self.n_docs = len(self.doclen)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.tf.get(term, {}).values())

    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score(self, term: str, doc_id: int) -> float:
        tf = self.tf.get(term, {}).get(doc_id, 0)
        if tf == 0:
            return 0.0
        k1, b = self.cfg.bm25.k1, self.cfg.bm25.b
        dl = self.doclen[doc_id]
        return self.idf(term) * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * (dl / self.avgdl))
        )

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        qterms = list(dict.fromkeys(tokenize(query, self.cfg)))
        scores: dict[int, float] = defaultdict(float)
        for t in qterms:
            for doc_id in self.tf.get(t, {}):
                scores[doc_id] += self.score(t, doc_id)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def postings(self, term: str) -> list[tuple[int, int]]:
        return sorted(self.tf.get(term, {}).items())
