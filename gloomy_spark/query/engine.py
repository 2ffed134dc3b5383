"""Query engine: term search (exact / prefix / restricted-regex) + BM25 top-k.

Reference parity (service/search.go:174-200 dispatch; index.go:291-306
first-token lookup; README query dialect) re-expressed over columnar
tables, plus the BM25/block-max layer mandated by BASELINE.json.

Distributed scoring plan:
    segments.where(term_id ∈ query terms)        ── parquet row-group pruning
      ⨝ broadcast(query-term idf)                ── tiny dim join
      groupBy(doc_bucket).applyInPandas(scorer)  ── all terms for one doc
                                                    range co-located; WAND
                                                    block skipping inside
      orderBy(score desc, doc_id asc) LIMIT k    ── global top-k
        (TakeOrderedAndProject — no full sort)

The scorer is an exact block-max algorithm: piecewise-constant upper
bounds are swept from block metadata only (first_doc/last_doc/max_score —
no payload decode), and blocks are decoded strictly in upper-bound order
until the running k-th best exact score exceeds the next segment's bound.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import decode_position_lists, decode_posting_block
from ..config import EngineConfig
from ..index_store import IndexStore, Manifest
from ..textnorm import tokenize
from .regexparser import regex_to_prefixes

TOPK_SCHEMA = "doc_id long, score double"


@dataclass
class _Bm25Params:
    k1: float
    b: float
    avgdl: float
    k: int
    use_blockmax: bool


def _score_arrays(tf: np.ndarray, dl: np.ndarray, idf: np.ndarray, p: _Bm25Params) -> np.ndarray:
    return idf * (tf * (p.k1 + 1.0)) / (tf + p.k1 * (1.0 - p.b + p.b * (dl / p.avgdl)))


def _bucket_scorer(p: _Bm25Params):
    """applyInPandas scorer for one doc_bucket: exact top-k with block-max
    pruning. Input rows = posting blocks of every query term overlapping
    this bucket, with per-term idf joined in."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n_blocks = len(pdf)
        if n_blocks == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        first = pdf["first_doc"].to_numpy(np.int64)
        last = pdf["last_doc"].to_numpy(np.int64)
        bmax = pdf["max_score"].to_numpy(np.float64)

        def decode_block(i: int) -> tuple[np.ndarray, np.ndarray]:
            row = pdf.iloc[i]
            d, tf, dl = decode_posting_block(
                row["docs"], row["tfs"], row["dls"], int(row["n_docs"])
            )
            s = _score_arrays(
                tf.astype(np.float64), dl.astype(np.float64),
                np.float64(row["idf"]), p,
            )
            return d, s

        if not p.use_blockmax:
            # brute-force DAAT: decode everything, scatter-add, top-k
            all_d = []
            all_s = []
            for i in range(n_blocks):
                d, s = decode_block(i)
                all_d.append(d)
                all_s.append(s)
            docs = np.concatenate(all_d)
            scores = np.concatenate(all_s)
            uniq, inv = np.unique(docs, return_inverse=True)
            tot = np.zeros(len(uniq))
            np.add.at(tot, inv, scores)
            return _topk_df(uniq, tot, p.k)

        # ---- block-max sweep -------------------------------------------
        # piecewise-constant upper bound over doc ranges from metadata only
        ev_pos = np.concatenate([first, last + 1])
        ev_val = np.concatenate([bmax, -bmax])
        order = np.argsort(ev_pos, kind="stable")
        ev_pos, ev_val = ev_pos[order], ev_val[order]
        # merge events at equal positions
        bounds, idx = np.unique(ev_pos, return_index=True)
        seg_ub = np.add.reduceat(ev_val, idx).cumsum()
        # numerical dust from +x then -x cancellation
        seg_ub[seg_ub < 1e-12] = 0.0
        # segment i covers [bounds[i], bounds[i+1]); last event closes all
        seg_starts = bounds[:-1]
        seg_ends = bounds[1:]
        seg_ub = seg_ub[:-1]

        live = seg_ub > 0
        seg_starts, seg_ends, seg_ub = seg_starts[live], seg_ends[live], seg_ub[live]
        ub_order = np.argsort(-seg_ub, kind="stable")

        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
        theta = -np.inf
        scored_docs: set[int] = set()

        for si in ub_order:
            # strict '<' so an exact tie with θ is still examined (the
            # smaller doc_id must win the tie-break deterministically)
            if len(heap) >= p.k and seg_ub[si] < theta:
                break
            lo, hi = seg_starts[si], seg_ends[si]
            # all blocks overlapping [lo, hi)
            blk = np.nonzero((first < hi) & (last >= lo))[0]
            docs_l, scores_l = [], []
            for i in blk:
                if i not in decoded:
                    decoded[i] = decode_block(int(i))
                d, s = decoded[i]
                m = (d >= lo) & (d < hi)
                docs_l.append(d[m])
                scores_l.append(s[m])
            if not docs_l:
                continue
            docs = np.concatenate(docs_l)
            scores = np.concatenate(scores_l)
            uniq, inv = np.unique(docs, return_inverse=True)
            tot = np.zeros(len(uniq))
            np.add.at(tot, inv, scores)
            for d, s in zip(uniq.tolist(), tot.tolist()):
                if d in scored_docs:
                    continue
                scored_docs.add(d)
                item = (s, -d)  # tie-break: higher doc_id evicted first
                if len(heap) < p.k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            if len(heap) >= p.k:
                theta = heap[0][0]

        if not heap:
            return pd.DataFrame({"doc_id": [], "score": []})
        out_docs = np.array([-d for _, d in heap], dtype=np.int64)
        out_scores = np.array([s for s, _ in heap])
        return pd.DataFrame({"doc_id": out_docs, "score": out_scores})

    return score


def _topk_df(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    if len(docs) == 0:
        return pd.DataFrame({"doc_id": [], "score": []})
    # score desc, doc_id asc tie-break
    order = np.lexsort((docs, -scores))[:k]
    return pd.DataFrame({"doc_id": docs[order].astype(np.int64), "score": scores[order]})


class SearchIndex:
    """Open, query-ready index. Long-lived (unlike the reference, which
    reloads per request — service/search.go:176-181): segments and terms
    DataFrames are cached in the session."""

    def __init__(self, spark: SparkSession, index_dir: str):
        from ..session import ship_package

        ship_package(spark)
        self._term_map: dict[str, tuple[int, float]] | None = None
        self.spark = spark
        self.store = IndexStore(index_dir)
        self.manifest = Manifest.load(index_dir)
        self.cfg = EngineConfig.from_json(
            open(f"{index_dir}/config.json").read()
        )
        self.terms = spark.read.parquet(self.store.terms_path)
        self.segments = spark.read.parquet(
            f"{self.store.segments_path}/bucket=*"
        )
        self.docs = spark.read.parquet(self.store.docs_path)

    # driver-side dictionary cap: the reference preloads col0 into memory
    # (index.go:502-504); our analog is a driver/broadcast term map, only
    # viable while the vocabulary fits comfortably on the driver
    _TERM_MAP_LIMIT = 5_000_000

    def cache(self) -> "SearchIndex":
        self.terms.cache().count()
        self.segments.cache().count()
        if self.manifest.n_terms <= self._TERM_MAP_LIMIT:
            self._term_map = {
                r["term"]: (r["term_id"], r["idf"]) for r in self.terms.collect()
            }
        return self

    # ------------------------------------------------------ term search --
    def search_exact(self, term: str) -> DataFrame:
        """Q1 analog: dictionary row(s) for an exact term."""
        return self.terms.where(F.col("term") == term.lower()).select(
            "term", "term_id", "df", "cf"
        )

    def search_prefix(self, prefix: str) -> DataFrame:
        """Q2 analog: all terms with the given prefix (input may carry the
        trailing '*' of the CLI dialect)."""
        p = prefix[:-1] if prefix.endswith("*") else prefix
        return self.terms.where(F.col("term").startswith(p.lower())).select(
            "term", "term_id", "df", "cf"
        )

    def search_regexp(self, pattern: str) -> DataFrame:
        """Q3/Q4 analog: compile the restricted regex to literal/prefix
        alternatives, union the narrowed candidates, post-filter with the
        full anchored regex (service/search.go:136-172 semantics)."""
        return (
            self.search_regexp_candidates(pattern)
            .where(F.col("term").rlike(f"^{pattern}$"))
            .select("term", "term_id", "df", "cf")
        )

    def search_ngram_regexp(self, patterns: list[str]) -> DataFrame:
        """Multi-position regex search over an n-gram index (reference
        searchByRegexp semantics, service/search.go:136-172): the FIRST
        pattern narrows the candidate set via the prefix compiler; every
        position is then post-filtered with its own anchored regex."""
        first = self.search_regexp_candidates(patterns[0])
        cond = F.lit(True)
        for i, p in enumerate(patterns):
            cond = cond & F.split(F.col("term"), " ").getItem(i).rlike(f"^{p}$")
        return first.where(F.size(F.split(F.col("term"), " ")) == len(patterns)).where(
            cond
        ).select("term", "term_id", "df", "cf")

    def search_regexp_candidates(self, pattern: str) -> DataFrame:
        """Prefix-compiler narrowing only (no post-filter) — the candidate
        set the reference unions before filtering."""
        alts = regex_to_prefixes(pattern)
        exact = [a for a in alts if not a.endswith("*")]
        prefixes = [a[:-1] for a in alts if a.endswith("*")]
        cond = F.lit(False)
        if exact:
            # n-gram terms: first token equality/prefix (space-joined)
            for e in exact:
                el = e.lower()
                cond = cond | (F.col("term") == el) | F.col("term").startswith(el + " ")
        for p in prefixes:
            cond = cond | F.col("term").startswith(p.lower())
        return self.terms.where(cond)

    def with_doc_metadata(self, hits: DataFrame, attrs: list[str] | None = None) -> DataFrame:
        """Q11 metadata decode: broadcast-join the docs dimension onto a
        hits DataFrame carrying doc_id (url/lang/doclen or chosen attrs)."""
        cols = ["doc_id"] + (attrs or ["url", "lang", "doclen"])
        dim = self.docs.select(*[c for c in cols if c in self.docs.columns])
        return hits.join(F.broadcast(dim), "doc_id", "left")

    def export_ngrams_tsv(self, path: str, min_freq: int = 1) -> None:
        """S8 analog: dump (term, cf) as TSV (extras.ExtractUniqueNgrams)."""
        (
            self.terms.where(F.col("cf") >= min_freq)
            .select("term", "cf")
            .write.mode("overwrite")
            .option("sep", "\t")
            .csv(path)
        )

    def slice(self, df: DataFrame, offset: int, limit: int) -> DataFrame:
        """Q10 pagination: deterministic lexicographic order + offset/limit."""
        from pyspark.sql import Window

        w = Window.orderBy("term")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
            .drop("_rn")
        )

    # -------------------------------------------------------- postings --
    def postings(self, term: str) -> DataFrame:
        """Decoded posting list of one term: (doc_id, tf, dl)."""
        tid_rows = self.search_exact(term).select("term_id").collect()
        if not tid_rows:
            return self.spark.createDataFrame([], "doc_id long, tf int, dl int")
        tid = tid_rows[0]["term_id"]
        segs = self.segments.where(F.col("term_id") == tid)

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    d, tf, dl = decode_posting_block(
                        row["docs"], row["tfs"], row["dls"], int(row["n_docs"])
                    )
                    yield pd.DataFrame(
                        {"doc_id": d, "tf": tf.astype(np.int32), "dl": dl.astype(np.int32)}
                    )

        return segs.mapInPandas(decode, "doc_id long, tf int, dl int")

    def postings_positions(self, term: str) -> DataFrame:
        """Posting list with decoded positions: (doc_id, tf, positions)."""
        tid_rows = self.search_exact(term).select("term_id").collect()
        if not tid_rows:
            return self.spark.createDataFrame(
                [], "doc_id long, tf int, positions array<int>"
            )
        tid = tid_rows[0]["term_id"]
        segs = self.segments.where(F.col("term_id") == tid)

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    n = int(row["n_docs"])
                    d, tf, _dl = decode_posting_block(
                        row["docs"], row["tfs"], row["dls"], n
                    )
                    pos = decode_position_lists(row["pos_counts"], row["positions"], n)
                    yield pd.DataFrame(
                        {
                            "doc_id": d,
                            "tf": tf.astype(np.int32),
                            "positions": [p.astype(np.int32) for p in pos],
                        }
                    )

        return segs.mapInPandas(decode, "doc_id long, tf int, positions array<int>")

    def phrase_match(self, phrase: str) -> DataFrame:
        """Docs containing the exact token phrase (adjacent positions).

        Distributed anchor-join: each term's positions are shifted by the
        term's offset in the phrase; a doc matches where one anchor carries
        every phrase slot. No driver-side loops over postings."""
        terms = tokenize(phrase, self.cfg)
        if not terms:
            return self.spark.createDataFrame([], "doc_id long")
        parts = []
        for i, t in enumerate(terms):
            p = (
                self.postings_positions(t)
                .select("doc_id", F.explode("positions").alias("p"))
                .select(
                    "doc_id",
                    (F.col("p") - F.lit(i)).alias("anchor"),
                    F.lit(i).alias("slot"),
                )
            )
            parts.append(p)
        un = parts[0]
        for p in parts[1:]:
            un = un.unionAll(p)
        return (
            un.groupBy("doc_id", "anchor")
            .agg(F.countDistinct("slot").alias("n_slots"))
            .where(F.col("n_slots") == len(terms))
            .select("doc_id")
            .distinct()
        )

    # ------------------------------------------------------------ BM25 --
    def query_terms(self, query: str) -> DataFrame:
        toks = list(dict.fromkeys(tokenize(query, self.cfg)))
        return self.terms.where(F.col("term").isin(toks)).select("term_id", "idf")

    def bm25_topk(self, query: str, k: int = 10, use_blockmax: bool = True) -> DataFrame:
        """Top-k BM25: score desc, doc_id asc tie-break — rank-identical
        with the exhaustive oracle."""
        p = _Bm25Params(
            k1=self.cfg.bm25.k1,
            b=self.cfg.bm25.b,
            avgdl=self.manifest.avgdl,
            k=k,
            use_blockmax=use_blockmax,
        )
        if self._term_map is not None:
            # cached-dictionary fast path: term lookup on the driver, idf
            # attached as a literal map — no terms scan in the query plan
            toks = [
                t
                for t in dict.fromkeys(tokenize(query, self.cfg))
                if t in self._term_map
            ]
            if not toks:
                return self.spark.createDataFrame([], TOPK_SCHEMA)
            ids = [self._term_map[t][0] for t in toks]
            idf_map = F.create_map(
                *[F.lit(x) for t in toks for x in self._term_map[t]]
            )
            cand = (
                self.segments.where(F.col("term_id").isin(ids))
                .withColumn("idf", idf_map[F.col("term_id")])
                .select(
                    "doc_bucket", "first_doc", "last_doc", "n_docs",
                    "max_score", "docs", "tfs", "dls", "idf",
                )
            )
        else:
            qterms = self.query_terms(query)
            cand = self.segments.join(F.broadcast(qterms), "term_id").select(
                "doc_bucket", "first_doc", "last_doc", "n_docs", "max_score",
                "docs", "tfs", "dls", "idf",
            )
        per_bucket = cand.groupBy("doc_bucket").applyInPandas(
            _bucket_scorer(p), TOPK_SCHEMA
        )
        return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
