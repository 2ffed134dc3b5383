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
import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import (
    decode_position_lists,
    decode_posting_block,
    decode_posting_blocks_bulk,
)
from ..config import EngineConfig
from ..index_store import IndexStore, Manifest
from ..textnorm import tokenize
from .regexparser import regex_to_prefixes

TOPK_SCHEMA = "doc_id long, score double"

# ---- driver-side replica of Spark's shuffle hash (Murmur3_x86_32) ----
# Spark's hashpartitioning places a row at pmod(hash(cols, seed=42), n);
# `F.hash` chains the running hash through each column (the previous
# value becomes the next seed), longs as two 32-bit words, ints as one.
# Replicating it in python lets the perfect-partitioning salt search run
# entirely on the driver — no createDataFrame job, no python-RDD
# broadcast — while keeping the placement guarantee (parity with F.hash
# is pinned by test_spark_hash_parity / the injectivity test).

_M32 = 0xFFFFFFFF


def _mm_mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    return (k1 * 0x1B873593) & _M32


def _mm_mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    return (h1 * 5 + 0xE6546B64) & _M32


def _mm_fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _spark_hash_int(v: int, seed: int) -> int:
    return _mm_fmix(_mm_mix_h1(seed & _M32, _mm_mix_k1(v & _M32)), 4)


def _spark_hash_long(v: int, seed: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    h1 = _mm_mix_h1(seed & _M32, _mm_mix_k1(v & _M32))
    h1 = _mm_mix_h1(h1, _mm_mix_k1(v >> 32))
    return _mm_fmix(h1, 8)


def _spark_hash_bqs(b: int, q: int, s: int) -> int:
    """Signed-int32 value of F.hash(doc_bucket long, qgrp int, psalt int)."""
    h = _spark_hash_long(b, 42)
    h = _spark_hash_int(q, h)
    h = _spark_hash_int(s, h)
    return h - (1 << 32) if h >= (1 << 31) else h


def _spark_hash_bs(b: int, s: int) -> int:
    """Signed-int32 value of F.hash(doc_bucket long, psalt int) — the
    serving view's 2-column layout (qgrp dropped: a CONSTANT key column
    is folded out of the cached partitioning expression, which then no
    longer satisfies the scorer's clustering requirement and re-inserts
    the very exchange the view exists to remove — verified empirically
    on persisted repartition + applyInPandas)."""
    h = _spark_hash_long(b, 42)
    h = _spark_hash_int(s, h)
    return h - (1 << 32) if h >= (1 << 31) else h


def _in_longs(col: str, vals) -> "F.Column":
    """``col IN (...)`` over integer values as ONE py4j round-trip.
    ``Column.isin`` builds a java literal per element (~1 ms each — 0.8 s
    of driver time for the ~1000 distinct terms of a 1000-query batch,
    profiled); parsing one SQL string is microseconds. Small lists keep
    isin (the string build isn't free either, and plans stay readable)."""
    vs = [int(v) for v in vals]
    if not vs:
        return F.lit(False)
    if len(vs) <= 64:
        return F.col(col).isin(vs)
    return F.expr(f"{_quote_ident(col)} IN ({','.join(map(str, vs))})")


def _quote_ident(col: str) -> str:
    """Backtick-quote a column identifier for interpolation into F.expr.
    Values were always escaped; the identifier must be too, otherwise a
    caller-supplied column name (e.g. an HTTP facet attr) becomes an SQL
    injection point into the serving session once the >64-value path
    switches from Column.isin to a parsed expression."""
    return "`" + col.replace("`", "``") + "`"


def _in_strings(col: str, vals) -> "F.Column":
    """String variant of :func:`_in_longs` (values backslash-escaped)."""
    vs = [str(v) for v in vals]
    if not vs:
        return F.lit(False)
    if len(vs) <= 64:
        return F.col(col).isin(vs)
    quoted = ",".join(
        "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'" for v in vs
    )
    return F.expr(f"{_quote_ident(col)} IN ({quoted})")


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
        # column arrays once — pdf.iloc per block costs ~50µs of pandas
        # machinery, which dominates the varint decode at many blocks
        docs_a = pdf["docs"].to_numpy()
        tfs_a = pdf["tfs"].to_numpy()
        dls_a = pdf["dls"].to_numpy()
        nd_a = pdf["n_docs"].to_numpy()
        idf_a = pdf["idf"].to_numpy(np.float64)

        def decode_block(i: int) -> tuple[np.ndarray, np.ndarray]:
            d, tf, dl = decode_posting_block(
                docs_a[i], tfs_a[i], dls_a[i], int(nd_a[i])
            )
            s = _score_arrays(
                tf.astype(np.float64), dl.astype(np.float64),
                np.float64(idf_a[i]), p,
            )
            return d, s

        if not p.use_blockmax:
            return _exhaustive_topk(n_blocks, decode_block, p.k)
        return _blockmax_sweep(first, last, bmax, decode_block, p)

    return score


def _per_bucket_arrow(fn, arrow_schema):
    """mapInArrow wrapper running a per-bucket pandas function over every
    doc_bucket group in the task's partition (see _partition_scorer for
    why: one python round trip per TASK, no Sort operator, vs one per
    bucket under groupBy().applyInPandas)."""

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        bl = [b for b in batches if b.num_rows]
        if not bl:
            return
        pdf = pa.Table.from_batches(bl).to_pandas()
        outs = []
        for _, g in pdf.groupby("doc_bucket", sort=False):
            r = fn(g)
            if len(r):
                outs.append(r)
        if not outs:
            return
        out = pd.concat(outs, ignore_index=True)
        yield pa.RecordBatch.from_pandas(
            out, schema=arrow_schema, preserve_index=False
        )

    return run


def _partition_scorer(p: _Bm25Params, idf_by_tid: dict[int, float] | None = None):
    """mapInArrow scorer: one hash-partitioned task scores MANY doc
    buckets in a single python call. The groupBy().applyInPandas shape
    paid a Sort below its exchange plus one grouped-protocol round trip
    per bucket (~100 buckets/query on the bench index — measured ~0.7 s
    of a 0.85 s single-query job in that stage); here the same rows
    arrive as one Arrow stream per task and bucket grouping is a pandas
    groupby (guide §4.2). Per-bucket numerics are EXACTLY
    _bucket_scorer's — same decode, same sweep, same heap — so scores
    are bit-identical.

    When ``idf_by_tid`` is given, rows arrive with ``term_id`` and the
    per-term idf is attached HERE (same doubles, same scoring) instead
    of as a literal map expression in the plan — per-query literals
    force a fresh whole-stage-codegen compile for every query, a fixed
    ~0.1 s/query the python-side map avoids (measured 4.8 → 3.9 s over
    10 warm queries)."""
    score = _bucket_scorer(p)

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        bl = [b for b in batches if b.num_rows]
        if not bl:
            return
        pdf = pa.Table.from_batches(bl).to_pandas()
        if idf_by_tid is not None:
            pdf["idf"] = pdf["term_id"].map(idf_by_tid)
        outs = []
        for _, g in pdf.groupby("doc_bucket", sort=False):
            r = score(g)
            if len(r):
                outs.append(r)
        if not outs:
            return
        out = pd.concat(outs, ignore_index=True)
        yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return run


def _exhaustive_topk(n_blocks: int, decode_block, k: int) -> pd.DataFrame:
    """Brute-force DAAT: decode everything, scatter-add, top-k."""
    all_d = []
    all_s = []
    for i in range(n_blocks):
        d, s = decode_block(i)
        if len(d):
            all_d.append(d)
            all_s.append(s)
    if not all_d:
        return pd.DataFrame({"doc_id": [], "score": []})
    docs = np.concatenate(all_d)
    scores = np.concatenate(all_s)
    uniq, inv = np.unique(docs, return_inverse=True)
    tot = np.zeros(len(uniq))
    np.add.at(tot, inv, scores)
    return _topk_df(uniq, tot, k)


def _blockmax_sweep(
    first: np.ndarray, last: np.ndarray, bmax: np.ndarray, decode_block, p: _Bm25Params
) -> pd.DataFrame:
    """Exact block-max top-k sweep over one bucket's posting blocks.

    ``decode_block(i) -> (doc_ids, scores)`` may return FEWER docs than
    the block holds (e.g. a facet allow-mask applied after decode): block
    metadata bounds stay valid upper bounds because filtering only
    removes candidates — it can never raise a true score above
    max_score. The sweep stays rank-exact in that case."""
    n_blocks = len(first)
    # piecewise-constant upper bound over doc ranges from metadata only
    ev_pos = np.concatenate([first, last + 1])
    ev_val = np.concatenate([bmax, -bmax])
    ev_cnt = np.concatenate(
        [np.ones(n_blocks, np.int64), -np.ones(n_blocks, np.int64)]
    )
    order = np.argsort(ev_pos, kind="stable")
    ev_pos, ev_val, ev_cnt = ev_pos[order], ev_val[order], ev_cnt[order]
    # merge events at equal positions
    bounds, idx = np.unique(ev_pos, return_index=True)
    seg_ub = np.add.reduceat(ev_val, idx).cumsum()
    # open-block count tells us exactly where the +x/−x cumsum should
    # cancel to zero: no magnitude epsilon, so legitimately tiny
    # max_scores (idf→0 at df≈N) are never dropped. Where blocks ARE
    # open, inflate the bound by one relative ulp-scale step so float
    # cancellation error can only weaken pruning, never skip a block.
    seg_open = np.add.reduceat(ev_cnt, idx).cumsum()
    # segment i covers [bounds[i], bounds[i+1]); last event closes all
    seg_starts = bounds[:-1]
    seg_ends = bounds[1:]
    seg_ub = seg_ub[:-1]
    seg_open = seg_open[:-1]
    pad = 1e-9 * float(np.abs(bmax).max()) if n_blocks else 0.0
    seg_ub = np.where(seg_open > 0, seg_ub + pad, 0.0)

    live = seg_open > 0
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
        if not len(docs):
            continue
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


def _topk_arrays(
    docs: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k as numpy arrays (score desc, doc_id asc). The batch scorer
    calls this per (term-set × bucket) group — constructing a pandas
    frame per group cost 7.5 s of a 23 s scoring pass at 1000 queries ×
    19 buckets (profiled), so frame construction happens ONCE per task,
    never per group."""
    if len(docs) == 0:
        return docs.astype(np.int64), scores
    if len(docs) > max(4 * k, 4096):
        # O(n) prefilter: keep everything ≥ the kth score (ties included,
        # so the lexsort below still breaks them exactly), then sort the
        # small survivor set instead of the full candidate array
        thr = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = scores >= thr
        docs, scores = docs[keep], scores[keep]
    # score desc, doc_id asc tie-break
    order = np.lexsort((docs, -scores))[:k]
    return docs[order].astype(np.int64), scores[order]


def _topk_df(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    d, s = _topk_arrays(docs, scores, k)
    return pd.DataFrame({"doc_id": d, "score": s})


class SearchIndex:
    """Open, query-ready index. Long-lived (unlike the reference, which
    reloads per request — service/search.go:176-181): segments and terms
    DataFrames are cached in the session."""

    def __init__(self, spark: SparkSession, index_dir: str):
        from ..session import ship_package

        ship_package(spark)
        self._term_map: dict[str, tuple[int, float]] | None = None
        self._term_df: dict[str, int] = {}
        self._n_doc_buckets: int | None = None
        self._total_cf: int | None = None  # corpus token count (Σ cf)
        # perfect scorer-partitioning state (see _perfect_scorer_partitioning)
        self._bucket_values: list[int] | None = None
        self._scorer_salt_cache: dict[int, object] = {}
        # persisted pre-partitioned segments view for batch serving
        # (see _batch_serving_view); built lazily on the first batch
        self._serving_view: tuple[DataFrame, list[str]] | None = None
        self._serving_view_lock = threading.Lock()
        # decoded-postings LRU for the driver-local serving fast path (the
        # analog of the reference preloading col0 into RAM, index.go:502-504).
        # Served from ThreadingHTTPServer threads, so all lookup/insert/
        # eviction happens under _posting_cache_lock; the postings counter
        # is recomputed from the dict (never incrementally drifted).
        self._posting_cache: "OrderedDict[int, tuple[np.ndarray, np.ndarray]]" = (
            OrderedDict()
        )
        self._posting_cache_lock = threading.Lock()
        # per-doc attrs LRU for the /bm25?attrs= serving fast path
        self._doc_attr_cache: dict[int, dict] = {}
        self._doc_attr_cache_lock = threading.Lock()
        self.spark = spark
        self.store = IndexStore(index_dir)
        self.manifest = Manifest.load(index_dir)
        self.cfg = EngineConfig.from_json(
            open(f"{index_dir}/config.json").read()
        )
        self.terms = spark.read.parquet(self.store.terms_path)
        from ..session import ensure_min_partitions

        # a small index writes few (large) segment files since the r6
        # chunk-size floor, which would serialize the decode paths
        # (postings/kwic/boolean) on a handful of tasks; redistribute to
        # the cluster's slots when the scan is that narrow. Term filters
        # still push into the parquet scan BELOW the added exchange, and
        # at scale (files >> slots) this is a no-op. Measured on the
        # bench index: head-term kwic 1.2-1.8 s -> 0.7 s, postings decode
        # 0.6 -> 0.5 s.
        self.segments = ensure_min_partitions(
            spark.read.parquet(f"{self.store.segments_path}/bucket=*")
        )
        self.docs = spark.read.parquet(self.store.docs_path)

    # driver-side dictionary cap: the reference preloads col0 into memory
    # (index.go:502-504); our analog is a driver/broadcast term map, only
    # viable while the vocabulary fits comfortably on the driver
    _TERM_MAP_LIMIT = 5_000_000
    # floor on (estimated) postings per scorer task — sizes the scorer
    # shuffle from the query's dictionary-known posting volume instead of
    # a fixed partition count (see bm25_topk)
    _SCORER_MIN_POSTINGS = 16384

    def _scorer_parts(self, est_postings: int | None) -> int:
        """Partition count for a per-bucket python scorer shuffle:
        data-derived from the query's posting volume when the dictionary
        is driver-resident (guide §2.2 — near-empty python tasks cost
        ~90 ms each), capped by bucket count and shuffle width."""
        nb = self._n_doc_buckets
        sp = int(self.cfg.shuffle_partitions)
        cap = max(1, min(sp, nb)) if nb else sp
        if est_postings:
            return max(
                1, min(cap, -(-est_postings // self._SCORER_MIN_POSTINGS))
            )
        return cap

    def cache(self) -> "SearchIndex":
        self.terms.cache().count()
        self.segments.cache().count()
        # doc-bucket count feeds the batch scorer's parallelism policy
        # (query-group salting when buckets < shuffle partitions); one
        # tiny agg over block METADATA rows, amortized across the cached
        # index's lifetime
        self._n_doc_buckets = int(
            self.segments.select(
                F.countDistinct("doc_bucket").alias("nb")
            ).collect()[0]["nb"]
        )
        if self.manifest.n_terms <= self._TERM_MAP_LIMIT:
            rows = self.terms.collect()
            self._term_map = {r["term"]: (r["term_id"], r["idf"]) for r in rows}
            self._term_df = {r["term"]: int(r["df"]) for r in rows}
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

    _DOC_ATTR_CACHE_MAX = 100_000
    # term_attr_counts fallback: max summed df of the requested page's
    # terms for which broadcasting the postings side is allowed (~rows;
    # 2M posting rows ≈ tens of MB — well under a sane broadcast bound).
    # Above this the join shuffles instead.
    _ATTR_COUNT_BROADCAST_MAX_DF = 2_000_000

    def doc_attrs(
        self, doc_ids: list[int], attrs: list[str] | None = None
    ) -> dict[int, dict]:
        """Driver-side Q11 for the serving fast path: metadata for a
        handful of doc_ids without a full Spark join job. Cache misses cost
        ONE pushed-down docs scan (doc_id ∈ PushedFilters — at 10¹² docs
        this touches only the row groups holding those ids); hits are free.
        Whole rows are cached so any later attr set reuses them. Used by
        SearchService./bm25?attrs=… after bm25_serve. Thread-safe."""
        ids = [int(d) for d in doc_ids]
        cols = [
            c for c in (attrs or ["url", "lang", "doclen"])
            if c in self.docs.columns
        ]
        # The local `got` dict is the source of truth for THIS call: cache
        # hits are captured at check time and merged with the freshly
        # fetched rows, so concurrent eviction (cache at its cap, or more
        # ids than _DOC_ATTR_CACHE_MAX in one call) can never turn an
        # existing doc into {} attrs. The cache is an optimization only —
        # same contract as bm25_serve's posting cache.
        got: dict[int, dict] = {}
        with self._doc_attr_cache_lock:
            for d in ids:
                if d in self._doc_attr_cache:
                    got[d] = self._doc_attr_cache[d]
        missing = [d for d in ids if d not in got]
        if missing:
            rows = self.docs.where(_in_longs("doc_id", missing)).collect()
            fetched = {int(r["doc_id"]): r.asDict() for r in rows}
            for d in missing:
                # absent docs resolve as {} so callers see a stable shape
                got[d] = fetched.get(d, {})
            with self._doc_attr_cache_lock:
                for d in missing:
                    self._doc_attr_cache.setdefault(d, got[d])
                while len(self._doc_attr_cache) > self._DOC_ATTR_CACHE_MAX:
                    del self._doc_attr_cache[next(iter(self._doc_attr_cache))]
        return {d: {c: row.get(c) for c in cols} for d, row in got.items()}

    def term_attr_counts(self, terms: list[str], attrs: list[str]) -> DataFrame:
        """Per-(term, attr-values) occurrence counts — the reference's
        search-result Args (service/search.go:72-83, builder.go:130-139):
        every n-gram result row carries the struct/metadata attr values it
        occurred under, with counts grouped by (ngram, args).

        Spark shape: the matched terms' postings (term_id-pushed-down
        segment scan, bulk-decoded) joined to the docs dimension's attr
        columns, then a partial-agg groupBy. The postings side of a search
        result is the small side, so it broadcasts; the dim scan is pruned
        to (doc_id + attrs). For head terms at 10¹² docs this is
        O(postings of term) — the reference pays the same cost at BUILD
        time by materializing per-(ngram, args) counts; build with
        ``attr_rollup_cols=[…]`` to get the same here — when the index
        carries an attr_rollup table covering the requested attrs, this
        answers from a term-pushed-down scan of it, O(result) even for
        head terms (used automatically below)."""
        import os

        lowered = [t.lower() for t in dict.fromkeys(terms)]
        roll_path = self.store.attr_rollup_path
        if os.path.exists(os.path.join(roll_path, "_SUCCESS")):
            roll = self.spark.read.parquet(roll_path)
            cols = [c for c in attrs if c in roll.columns]
            if cols and all(c in roll.columns for c in attrs if c in self.docs.columns):
                return (
                    roll.where(_in_strings("term", lowered))
                    # re-aggregate: the rollup may carry MORE attr columns
                    # than this request (e.g. built with [lang, url],
                    # queried with [lang])
                    .groupBy("term", *cols)
                    .agg(F.sum("count").cast("long").alias("count"))
                )
        cols = [c for c in attrs if c in self.docs.columns]
        posts = self.postings_multi(lowered).select("term", "doc_id", "tf")
        dim = self.docs.select("doc_id", *cols)
        # broadcast is only safe while the postings side is small; a head
        # term in the requested page (no rollup covering it) can carry
        # O(corpus) postings, which must NOT be broadcast. df is free from
        # the dictionary, so guard on it and fall back to a shuffle join.
        # Served from the driver-resident term map when loaded (r5 ADVICE:
        # the guard was a blocking terms-scan collect on EVERY no-rollup
        # request, even tail-term pages); the Spark job is the fallback.
        if self._term_map is not None:
            total_df = sum(self._term_df.get(t, 0) for t in lowered)
        else:
            total_df = sum(
                int(r["df"])
                for r in self.terms.where(_in_strings("term", lowered))
                .select("df")
                .collect()
            )
        if total_df <= self._ATTR_COUNT_BROADCAST_MAX_DF:
            posts = F.broadcast(posts)
        return (
            posts.join(dim, "doc_id")
            .groupBy("term", *cols)
            .agg(F.sum("tf").cast("long").alias("count"))
        )

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
        """Q10 pagination: deterministic lexicographic order + offset/limit.

        offset+limit push down to the sort (CollectLimit / TakeOrdered) —
        no single-partition window Exchange, so paging a 10⁹-term result
        never materializes a global sort."""
        return df.orderBy("term").offset(offset).limit(limit)

    # -------------------------------------------------------- postings --
    def postings(self, term: str) -> DataFrame:
        """Decoded posting list of one term: (doc_id, tf, dl)."""
        tid_rows = self.search_exact(term).select("term_id").collect()
        if not tid_rows:
            return self.spark.createDataFrame([], "doc_id long, tf int, dl int")
        tid = tid_rows[0]["term_id"]
        # prune to the block payload columns the decoder touches — the
        # scan must not read max_score/sum_tf/doc-range bytes it won't use
        segs = self.segments.where(F.col("term_id") == tid).select(
            "n_docs", "docs", "tfs", "dls"
        )

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # per-BLOCK loop (1/block_size of posting count); to_dict avoids
            # iterrows' per-cell Series boxing
            for pdf in batches:
                for row in pdf.to_dict("records"):
                    d, tf, dl = decode_posting_block(
                        row["docs"], row["tfs"], row["dls"], int(row["n_docs"])
                    )
                    yield pd.DataFrame(
                        {"doc_id": d, "tf": tf.astype(np.int32), "dl": dl.astype(np.int32)}
                    )

        return segs.mapInPandas(decode, "doc_id long, tf int, dl int")

    def postings_multi(self, terms: list[str]) -> DataFrame:
        """Decoded postings of MANY terms in one pushed-down scan:
        (term, doc_id, tf, dl). Terms missing from the dictionary emit no
        rows (they may still live in uncompacted streaming runs — the NRT
        merger unions those in). One Spark scan total, vs one scan + one
        driver round-trip PER TERM with repeated `postings()` calls."""
        uniq = list(dict.fromkeys(terms))
        if self._term_map is not None:
            found = {t: int(self._term_map[t][0]) for t in uniq if t in self._term_map}
        else:
            rows = self.terms.where(F.col("term").isin(uniq)).select(
                "term", "term_id"
            ).collect()
            found = {r["term"]: int(r["term_id"]) for r in rows}
        if not found:
            return self.spark.createDataFrame(
                [], "term string, doc_id long, tf int, dl int"
            )
        term_of = {tid: t for t, tid in found.items()}
        segs = self.segments.where(
            _in_longs("term_id", found.values())
        ).select("term_id", "n_docs", "docs", "tfs", "dls")

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for row in pdf.to_dict("records"):
                    d, tf, dl = decode_posting_block(
                        row["docs"], row["tfs"], row["dls"], int(row["n_docs"])
                    )
                    yield pd.DataFrame(
                        {
                            "term": term_of[int(row["term_id"])],
                            "doc_id": d,
                            "tf": tf.astype(np.int32),
                            "dl": dl.astype(np.int32),
                        }
                    )

        return segs.mapInPandas(decode, "term string, doc_id long, tf int, dl int")

    def postings_positions(self, term: str) -> DataFrame:
        """Posting list with decoded positions: (doc_id, tf, positions)."""
        if not self.cfg.store_positions:
            # fail loud and early: without this the scan raises a cryptic
            # missing-column AnalysisException (pos_counts/positions).
            # Guards kwic's single-term path and collocations too.
            raise ValueError(
                "positions retrieval (kwic/collocations/term_positions) "
                "requires an index built with store_positions=True"
            )
        tid_rows = self.search_exact(term).select("term_id").collect()
        if not tid_rows:
            return self.spark.createDataFrame(
                [], "doc_id long, tf int, positions array<int>"
            )
        tid = tid_rows[0]["term_id"]
        segs = self.segments.where(F.col("term_id") == tid).select(
            "n_docs", "docs", "tfs", "dls", "pos_counts", "positions"
        )

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for row in pdf.to_dict("records"):
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

    def boolean_search(
        self,
        must: list[str] | tuple[str, ...] = (),
        should: list[str] | tuple[str, ...] = (),
        must_not: list[str] | tuple[str, ...] = (),
    ) -> DataFrame:
        """Boolean doc-set retrieval: docs containing ALL ``must`` terms,
        at least one ``should`` term (when any are given), and NONE of
        ``must_not``. Returns (doc_id, tf) with tf = total occurrences of
        the positive (must+should) terms in the doc.

        This is new query capability relative to the reference (gloomy
        returns per-n-gram rows, index/index.go:241-258, and unions
        sub-results — Q7; it has no doc-set algebra because it has no doc
        ids). Scale shape: ONE pushed-down segments scan for every term in
        the query (term_id IN (...) reaches the parquet scan), per-block
        parallel decode, then a single partial-agg shuffle on doc_id — no
        joins, no per-term scans, no driver materialization. Exclusion
        needs no anti-join: any result doc must carry a positive term, so
        grouping the combined postings by doc_id sees the must_not hits
        of every candidate doc.
        """
        must = [t.lower() for t in dict.fromkeys(must)]
        should = [t.lower() for t in dict.fromkeys(should)]
        must_not = [t.lower() for t in dict.fromkeys(must_not)]
        if not must and not should:
            raise ValueError("boolean_search needs at least one must/should term")
        empty = self.spark.createDataFrame([], "doc_id long, tf int")
        if must and self._term_ids(must) is None:
            return empty  # an unindexed must term can match nothing
        p = self.postings_multi(must + should + must_not)
        is_must = _in_strings("term", must) if must else F.lit(False)
        is_should = _in_strings("term", should) if should else F.lit(False)
        is_not = _in_strings("term", must_not) if must_not else F.lit(False)
        # (term, doc_id) is unique in decoded postings (each doc lives in
        # exactly one block of a term), so a conditional COUNT replaces
        # count-distinct — no Expand in the plan
        agg = p.groupBy("doc_id").agg(
            F.sum(F.when(is_must, 1).otherwise(0)).alias("_nm"),
            F.max(F.when(is_should, 1).otherwise(0)).alias("_hs"),
            F.max(F.when(is_not, 1).otherwise(0)).alias("_hn"),
            F.sum(F.when(~is_not, F.col("tf")).otherwise(0))
            .cast("int")
            .alias("tf"),
        )
        cond = F.col("_hn") == 0
        if must:
            cond = cond & (F.col("_nm") == len(must))
        if should:
            cond = cond & (F.col("_hs") == 1)
        return agg.where(cond).select("doc_id", "tf")

    def _term_ids(self, terms: list[str]) -> dict[str, int] | None:
        """term → term_id for the given terms; None if ANY term is absent
        (a phrase containing an unindexed token can match nothing)."""
        uniq = list(dict.fromkeys(terms))
        if self._term_map is not None:
            found = {t: self._term_map[t][0] for t in uniq if t in self._term_map}
        else:
            rows = self.terms.where(F.col("term").isin(uniq)).select(
                "term", "term_id"
            ).collect()
            found = {r["term"]: r["term_id"] for r in rows}
        return found if len(found) == len(uniq) else None

    def phrase_match(self, phrase: str, with_positions: bool = False) -> DataFrame:
        """Docs containing the exact token phrase (adjacent positions).

        Scale-safe plan (a phrase containing "the" must NOT explode the
        corpus-wide position list of "the"): compressed posting blocks of
        the phrase terms are shuffled once by doc_bucket, and inside each
        group the matcher (a) intersects doc-id sets rarest-first from the
        cheap doc payloads, (b) decodes POSITIONS only for blocks that
        still overlap the surviving candidate docs, then (c) verifies
        adjacency per candidate. No explode, no position decode for
        non-candidate docs.

        ``with_positions=True`` adds a ``positions array<int>`` column
        carrying the anchor positions (token offset of the phrase's FIRST
        token) of every occurrence in the doc — the anchors are a free
        by-product of step (c), so this costs nothing extra."""
        schema = (
            "doc_id long, positions array<int>" if with_positions else "doc_id long"
        )
        if not self.cfg.store_positions:
            raise ValueError(
                "phrase queries require an index built with store_positions=True"
            )
        terms = tokenize(phrase, self.cfg)
        if not terms:
            return self.spark.createDataFrame([], schema)
        tids = self._term_ids(terms)
        if tids is None:
            return self.spark.createDataFrame([], schema)
        # term_id → phrase offsets (a repeated token occupies several slots)
        slot_map: dict[int, list[int]] = {}
        for slot, t in enumerate(terms):
            slot_map.setdefault(int(tids[t]), []).append(slot)
        n_terms_distinct = len(slot_map)

        segs = self.segments.where(
            _in_longs("term_id", slot_map)
        ).select(
            "doc_bucket", "term_id", "first_doc", "last_doc", "n_docs",
            "docs", "tfs", "dls", "pos_counts", "positions",
        )

        def match(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"doc_id": np.array([], dtype=np.int64)})
            if with_positions:
                empty["positions"] = pd.Series([], dtype=object)
            groups = {
                int(tid): g.sort_values("first_doc")
                for tid, g in pdf.groupby("term_id")
            }
            if len(groups) < n_terms_distinct:
                return empty  # a phrase term has no postings in this bucket

            # (a) doc-set intersection, rarest term first — positions
            # unread; ONE bulk varint pass per term (see
            # decode_posting_blocks_bulk), not one per 128-posting block
            doc_sets: dict[int, np.ndarray] = {}
            for tid, g in groups.items():
                doc_sets[tid] = decode_posting_blocks_bulk(
                    g["docs"].tolist(), g["tfs"].tolist(),
                    g["dls"].tolist(), g["n_docs"].tolist(),
                )[0]
            by_rarity = sorted(doc_sets, key=lambda t: len(doc_sets[t]))
            cand = doc_sets[by_rarity[0]]
            for tid in by_rarity[1:]:
                cand = np.intersect1d(cand, doc_sets[tid], assume_unique=True)
                if len(cand) == 0:
                    return empty

            # (b) positions only for candidate docs, in overlapping blocks
            pos_by_tid: dict[int, dict[int, np.ndarray]] = {}
            lo_c, hi_c = int(cand[0]), int(cand[-1])
            for tid, g in groups.items():
                docpos: dict[int, np.ndarray] = {}
                for r in g.to_dict("records"):
                    if r["last_doc"] < lo_c or r["first_doc"] > hi_c:
                        continue
                    n = int(r["n_docs"])
                    d, _tf, _dl = decode_posting_block(
                        r["docs"], r["tfs"], r["dls"], n
                    )
                    hit = np.isin(d, cand, assume_unique=True)
                    if not hit.any():
                        continue
                    pos = decode_position_lists(r["pos_counts"], r["positions"], n)
                    for i in np.nonzero(hit)[0]:
                        docpos[int(d[i])] = pos[i].astype(np.int64)
                pos_by_tid[tid] = docpos

            # (c) adjacency: one anchor must carry every phrase slot
            out: list[int] = []
            out_pos: list[np.ndarray] = []
            for doc in cand.tolist():
                anchors: np.ndarray | None = None
                for tid, slots in slot_map.items():
                    p = pos_by_tid[tid].get(doc)
                    if p is None:
                        anchors = None
                        break
                    for s in slots:
                        shifted = p - s
                        anchors = (
                            shifted
                            if anchors is None
                            else np.intersect1d(anchors, shifted, assume_unique=True)
                        )
                        if len(anchors) == 0:
                            break
                    if anchors is not None and len(anchors) == 0:
                        anchors = None
                        break
                if anchors is not None and len(anchors) > 0:
                    out.append(doc)
                    if with_positions:
                        out_pos.append(np.sort(anchors).astype(np.int32))
            res = pd.DataFrame({"doc_id": np.array(out, dtype=np.int64)})
            if with_positions:
                res["positions"] = pd.Series(out_pos, dtype=object)
            return res

        # doc_buckets are disjoint doc ranges → no cross-bucket duplicates.
        # Same repartition+mapInArrow shape as bm25_topk (no Sort, one
        # python round trip per task, width derived from the phrase
        # terms' dictionary-known posting volume).
        import pyarrow as pa

        est = (
            sum(self._term_df.get(t, 0) for t in terms)
            if self._term_map is not None
            else None
        )
        fields = [pa.field("doc_id", pa.int64())]
        if with_positions:
            fields.append(pa.field("positions", pa.list_(pa.int32())))
        n_parts = self._scorer_parts(est)
        segs = (
            segs.coalesce(1)  # one task holds every bucket — no exchange
            if n_parts == 1
            else segs.repartition(n_parts, "doc_bucket")
        )
        return segs.mapInArrow(
            _per_bucket_arrow(match, pa.schema(fields)), schema
        )

    def kwic(self, query: str, docs: DataFrame, width: int = 3) -> DataFrame:
        """Keyword-in-context concordance: every occurrence of ``query``
        (a single term or an exact phrase) with up to ``width`` tokens of
        context on each side. Returns (doc_id, pos, lctx, kw, rctx) — pos
        is the 0-based token offset of the match start, lctx/rctx are
        space-joined context windows (shorter at doc edges).

        This is reference parity with a corpus-concordancer front end
        over the n-gram service (the reference exposes per-n-gram rows
        plus document Args, service/search.go; a KonText-style client
        renders the context — here the engine computes it directly).

        Scale shape: hit positions come from the index (pushed-down
        postings scan for a term; the bucketed phrase matcher with free
        anchor positions for a phrase — never a corpus scan), then ONE
        join against the forward store restricted to (doc_id, text), with
        tokenization and window slicing AFTER the join so only matched
        docs are tokenized, all in JVM expressions (slice/array_join —
        no Python, no explode of full token streams). The hits side is
        tiny relative to the corpus for selective queries; AQE sizes it
        at runtime and picks a broadcast join, so the 100 TB forward
        store is never shuffled.
        """
        out_schema = "doc_id long, pos int, lctx string, kw string, rctx string"
        terms = tokenize(query, self.cfg)
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        n = len(terms)
        if n == 1:
            hits = self.postings_positions(terms[0]).select("doc_id", "positions")
        else:
            hits = self.phrase_match(query, with_positions=True)

        from ..functions.text import tokens_col

        w = F.lit(int(width))
        # _toks is materialized in a projection BELOW the explode: Generate
        # re-evaluates sibling expressions once per emitted element, so a
        # same-projection tokens_col would re-tokenize the doc once per hit
        # (tf(query, doc) times). A separate select keeps split() under the
        # Generate node (CollapseProject cannot merge across Generate — the
        # child projection is requiredChildOutput); pinned by
        # test_kwic_tokenizes_below_explode.
        joined = (
            docs.select("doc_id", "text")
            .join(hits, "doc_id")
            .select(
                "doc_id",
                "positions",
                tokens_col(F.col("text"), self.cfg).alias("_toks"),
            )
            .select("doc_id", F.explode("positions").alias("pos"), "_toks")
        )
        start1 = F.col("pos") + 1  # 1-based index of the match start
        return joined.select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.array_join(
                F.slice(
                    "_toks", F.greatest(F.lit(1), start1 - w), F.least(F.col("pos"), w)
                ),
                " ",
            ).alias("lctx"),
            F.array_join(F.slice("_toks", start1, n), " ").alias("kw"),
            F.array_join(F.slice("_toks", start1 + n, w), " ").alias("rctx"),
        )

    def collocations(self, node: str, docs: DataFrame, window: int = 3,
                     min_freq: int = 1) -> DataFrame:
        """Collocation extraction: tokens co-occurring with ``node``
        within ±``window`` positions, ranked by association strength.
        Returns (collocate, f_xy, f_y, log_dice, mi, t_score) with the
        standard corpus-linguistics measures (public formulas; the
        reference's ecosystem — KonText-style concordancers — computes
        these client-side from n-gram counts):

            log_dice = 14 + log2(2·f_xy / (f_x + f_y))
            mi       = log2(f_xy · N / (f_x · f_y))
            t_score  = (f_xy − f_x·f_y/N) / sqrt(f_xy)

        where f_x = corpus frequency of the node, f_y of the collocate,
        f_xy = window co-occurrence count (every node occurrence
        contributes its window; overlapping windows double-count, the
        standard convention), N = total corpus tokens.

        Scale shape: node positions from ONE pushed-down postings scan;
        forward store joined and tokenized only for matching docs (same
        plan as kwic — AQE broadcasts the hit side against a 100 TB
        store); window tokens sliced and exploded in JVM expressions;
        one groupBy(collocate) partial agg; marginals attached by ONE
        join against the term dictionary (f_xy side is vocabulary-
        bounded). f_x and N are driver scalars (dictionary lookups)."""
        out_schema = (
            "collocate string, f_xy long, f_y long, "
            "log_dice double, mi double, t_score double"
        )
        toks = tokenize(node, self.cfg)
        if len(toks) != 1:
            raise ValueError("collocations takes a single node token")
        node_term = toks[0]
        row = self.search_exact(node_term).collect()
        if not row:
            return self.spark.createDataFrame([], out_schema)
        f_x = int(row[0]["cf"])
        if self._total_cf is None:
            # one tiny dictionary agg, amortized across the index's life
            # (the dictionary is write-once, so the total never changes)
            self._total_cf = int(
                self.terms.agg(F.sum("cf").alias("n")).collect()[0]["n"]
            )
        n_tokens = self._total_cf

        from ..functions.text import tokens_col

        w = F.lit(int(window))
        hits = self.postings_positions(node_term).select("doc_id", "positions")
        # tokenize once per matched doc, not once per node occurrence — see
        # the kwic comment above (same Generate re-evaluation trap).
        j = (
            docs.select("doc_id", "text")
            .join(hits, "doc_id")
            .select("positions", tokens_col(F.col("text"), self.cfg).alias("_toks"))
            .select(F.explode("positions").alias("pos"), "_toks")
        )
        start1 = F.col("pos") + 1
        ctx = j.select(
            F.explode(
                F.concat(
                    F.slice("_toks", F.greatest(F.lit(1), start1 - w),
                            F.least(F.col("pos"), w)),
                    F.slice("_toks", start1 + 1, w),
                )
            ).alias("collocate")
        )
        fxy = ctx.groupBy("collocate").agg(
            F.count("*").cast("long").alias("f_xy")
        )
        if min_freq > 1:
            fxy = fxy.where(F.col("f_xy") >= min_freq)
        joined = fxy.join(
            self.terms.select(F.col("term").alias("collocate"),
                              F.col("cf").alias("f_y")),
            "collocate",
        )
        fxy_c, fy_c = F.col("f_xy"), F.col("f_y")
        return joined.select(
            "collocate",
            "f_xy",
            fy_c.cast("long").alias("f_y"),
            F.round(
                F.lit(14.0) + F.log2(F.lit(2.0) * fxy_c / (F.lit(f_x) + fy_c)), 4
            ).alias("log_dice"),
            F.round(
                F.log2(fxy_c * F.lit(float(n_tokens)) / (F.lit(f_x) * fy_c)), 4
            ).alias("mi"),
            F.round(
                (fxy_c - F.lit(f_x) * fy_c / F.lit(float(n_tokens)))
                / F.sqrt(fxy_c),
                4,
            ).alias("t_score"),
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
        est_postings: int | None = None
        idf_by_tid: dict[int, float] | None = None
        if self._term_map is not None:
            # cached-dictionary fast path: term lookup on the driver; idf
            # attached inside the python scorer (no terms scan AND no
            # per-query literal expressions in the plan — see
            # _partition_scorer)
            toks = [
                t
                for t in dict.fromkeys(tokenize(query, self.cfg))
                if t in self._term_map
            ]
            if not toks:
                return self.spark.createDataFrame([], TOPK_SCHEMA)
            est_postings = sum(self._term_df.get(t, 0) for t in toks)
            ids = [self._term_map[t][0] for t in toks]
            idf_by_tid = {
                int(self._term_map[t][0]): float(self._term_map[t][1])
                for t in toks
            }
            # NOTE: the single-query path deliberately does NOT use the
            # persisted serving view — measured SLOWER (0.45 s → 0.85 s at
            # 10 buckets / local[4]): a lone query leaves most bucket
            # partitions empty after the term filter, yet each still runs
            # a grouped-python task (~90 ms protocol overhead apiece),
            # while the pushed-down parquet scan reads only the query's
            # term blocks and AQE coalesces the tiny shuffle to 1-2 tasks.
            # The view wins exactly when most partitions carry real work —
            # the many-query batch path below.
            cand = self.segments.where(_in_longs("term_id", ids)).select(
                "doc_bucket", "term_id", "first_doc", "last_doc", "n_docs",
                "max_score", "docs", "tfs", "dls",
            )
        else:
            qterms = self.query_terms(query)
            cand = self.segments.join(F.broadcast(qterms), "term_id").select(
                "doc_bucket", "first_doc", "last_doc", "n_docs", "max_score",
                "docs", "tfs", "dls", "idf",
            )
        # hash-repartition by doc_bucket + mapInArrow instead of
        # groupBy().applyInPandas: same co-location guarantee (all of a
        # bucket's blocks land in one task), no Sort operator, one python
        # round trip per TASK instead of per bucket. Partition count is
        # DATA-derived (guide §2.2): the dictionary states the query's
        # posting volume up front, so tiny queries run 1-2 python tasks
        # while head queries fan out to the full shuffle width — a fixed
        # count of near-empty python tasks cost ~0.45 s/query at 64
        # partitions vs ~0.25 s at the derived width on the bench index.
        n_parts = self._scorer_parts(est_postings)
        # n_parts == 1 trivially co-locates every bucket in the one task,
        # so a narrow coalesce replaces the exchange outright (guide §2.4
        # "remove shuffles") — repartition(1) would still shuffle-write
        # and -read every candidate block.
        cand = (
            cand.coalesce(1)
            if n_parts == 1
            else cand.repartition(n_parts, "doc_bucket")
        )
        per_bucket = cand.mapInArrow(
            _partition_scorer(p, idf_by_tid), TOPK_SCHEMA
        )
        return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # facet-aware block-max (r4 verdict next #4): inside a bucket the
    # sweep only pays off when the allow set is dense enough for θ to
    # fill quickly (sparse facets leave θ at −inf while the sweep decodes
    # everything the exhaustive path would, plus sweep overhead) and
    # there are enough blocks for pruning to skip any. Density is
    # |allowed ∩ bucket| / bucket_width, known exactly per cogroup.
    _FACET_SWEEP_MIN_DENSITY = 0.05
    _FACET_SWEEP_MIN_BLOCKS = 8

    def bm25_topk_filtered(
        self, query: str, k: int, attr: str, values: list[str],
        use_blockmax: bool | None = None,
    ) -> DataFrame:
        """Faceted top-k BM25: rank only docs whose dimension attribute
        ``attr`` is in ``values`` (e.g. lang='en'). IDF/avgdl stay
        CORPUS-WIDE — the facet restricts the result set, not the
        collection statistics (the conventional faceted-search contract;
        scores equal the unfiltered scores of the surviving docs).

        Scale shape: the allowed doc set comes from ONE pushed-down
        docs-dimension scan (a dictionary-encoded parquet column filter
        — PushedFilters, no corpus scan), bucketed by the same
        doc_bucket as the segments, and COGROUPED with the query's
        posting blocks: one shuffle per side, and inside each bucket the
        scorer restricts decoded postings to the allowed ids before
        accumulation.

        ``use_blockmax=None`` (default) picks PER BUCKET between the
        exhaustive DAAT pass and a facet-aware block-max sweep: block
        max_score stays a valid upper bound under filtering (removal only
        lowers true scores), so the sweep is rank-exact with the
        allow-mask folded into block decode; it engages when the bucket's
        allowed-doc density and block count clear the thresholds above.
        Pass True/False to force one path (the differential test does)."""
        # attr arrives unvalidated from /bm25?filter=attr:v1,… — reject
        # anything that is not an actual docs-dimension column BEFORE it
        # reaches an expression builder (defense in depth on top of the
        # identifier quoting in _in_strings).
        if attr not in self.docs.columns:
            raise KeyError(
                f"unknown facet attribute {attr!r}; "
                f"available: {sorted(self.docs.columns)}"
            )
        p = _Bm25Params(
            k1=self.cfg.bm25.k1,
            b=self.cfg.bm25.b,
            avgdl=self.manifest.avgdl,
            k=k,
            use_blockmax=bool(use_blockmax),
        )
        qterms = self.query_terms(query)
        cand = self.segments.join(F.broadcast(qterms), "term_id").select(
            "doc_bucket", "first_doc", "last_doc", "n_docs", "max_score",
            "docs", "tfs", "dls", "idf",
        )
        w = int(self.cfg.doc_bucket_width)
        # exact int64 floor division (numpy // semantics, toward −∞) —
        # float floor() would lose precision past 2^53
        bucket = F.expr(
            f"(doc_id div {w}) - (CASE WHEN doc_id < 0 "
            f"AND doc_id % {w} != 0 THEN 1 ELSE 0 END)"
        )
        allowed = (
            self.docs.where(_in_strings(attr, list(values)))
            .select("doc_id", bucket.alias("doc_bucket"))
        )

        force = use_blockmax
        min_density = self._FACET_SWEEP_MIN_DENSITY
        min_blocks = self._FACET_SWEEP_MIN_BLOCKS

        def score(cand_pdf: pd.DataFrame, allow_pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"doc_id": [], "score": []})
            n_blocks = len(cand_pdf)
            if not n_blocks or not len(allow_pdf):
                return empty
            allow = np.sort(allow_pdf["doc_id"].to_numpy(np.int64))
            first = cand_pdf["first_doc"].to_numpy(np.int64)
            last = cand_pdf["last_doc"].to_numpy(np.int64)
            bmax = cand_pdf["max_score"].to_numpy(np.float64)
            docs_a = cand_pdf["docs"].to_numpy()
            tfs_a = cand_pdf["tfs"].to_numpy()
            dls_a = cand_pdf["dls"].to_numpy()
            nd_a = cand_pdf["n_docs"].to_numpy()
            idf_a = cand_pdf["idf"].to_numpy(np.float64)
            eint = np.empty(0, np.int64)
            efloat = np.empty(0, np.float64)

            def decode_block(i: int) -> tuple[np.ndarray, np.ndarray]:
                d, tf, dl = decode_posting_block(
                    docs_a[i], tfs_a[i], dls_a[i], int(nd_a[i])
                )
                m = np.isin(d, allow, assume_unique=True)
                if not m.any():
                    return eint, efloat
                s = _score_arrays(
                    tf[m].astype(np.float64), dl[m].astype(np.float64),
                    np.float64(idf_a[i]), p,
                )
                return d[m], s

            if force is None:
                sweep = (
                    n_blocks >= min_blocks
                    and len(allow) >= min_density * w
                )
            else:
                sweep = force
            if sweep:
                return _blockmax_sweep(first, last, bmax, decode_block, p)
            return _exhaustive_topk(n_blocks, decode_block, p.k)

        per_bucket = (
            cand.groupby("doc_bucket")
            .cogroup(allowed.groupby("doc_bucket"))
            .applyInPandas(score, TOPK_SCHEMA)
        )
        return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # driver-local serving fast path: total postings across the query's
    # terms must fit comfortably on the driver; heavier queries fall back
    # to the distributed scorer. 5M postings ≈ 120 MB decoded.
    _LOCAL_MAX_POSTINGS = 5_000_000
    _POSTING_CACHE_MAX = 20_000_000

    def bm25_serve(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Low-latency BM25 top-k: score on the DRIVER from a decoded-
        postings LRU (the reference keeps its first trie column in RAM,
        index.go:502-504 — this is the posting-list analog). Terms missing
        from the cache are fetched with one pushed-down segments scan;
        repeat terms cost no Spark job at all. Falls back to the
        distributed block-max scorer when the query's total df exceeds
        the driver budget — at 10¹² docs a head-term query MUST stay
        distributed. Returns [(doc_id, score)] (already exact-ordered,
        score desc / doc_id asc). Requires .cache()."""
        if self._term_map is None:
            raise ValueError("bm25_serve requires a cached index (.cache())")
        k1, b, avgdl = self.cfg.bm25.k1, self.cfg.bm25.b, self.manifest.avgdl
        toks = [
            t for t in dict.fromkeys(tokenize(query, self.cfg)) if t in self._term_map
        ]
        if not toks:
            return []
        if sum(self._term_df.get(t, 0) for t in toks) > self._LOCAL_MAX_POSTINGS:
            rows = self.bm25_topk(query, k).collect()  # distributed fallback
            return [(r["doc_id"], r["score"]) for r in rows]

        # grab references for cached terms UNDER the lock; entries are
        # immutable (np arrays) so holding a reference keeps them valid
        # even if another thread evicts the dict slot a microsecond later
        tids = [int(self._term_map[t][0]) for t in toks]
        with self._posting_cache_lock:
            entries = {}
            for tid in tids:
                if tid in self._posting_cache:
                    entries[tid] = self._posting_cache[tid]
                    # true LRU: a hit refreshes recency, so a hot head term
                    # fetched early can't be evicted ahead of cold tail terms
                    self._posting_cache.move_to_end(tid)
        missing = [tid for tid in tids if tid not in entries]
        if missing:
            # fetch OUTSIDE the lock (a Spark scan must not serialize other
            # threads' cache hits); two threads missing the same term just
            # fetch twice and the second insert is a no-op
            pdf = (
                self.segments.where(_in_longs("term_id", missing))
                .select("term_id", "n_docs", "docs", "tfs", "dls")
                .toPandas()
            )
            fetched: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for tid, g in pdf.groupby("term_id"):
                d, tf, dl = decode_posting_blocks_bulk(
                    g["docs"].tolist(), g["tfs"].tolist(),
                    g["dls"].tolist(), g["n_docs"].tolist(),
                )
                tf = tf.astype(np.float64)
                dl = dl.astype(np.float64)
                # cache tf-part of the score (idf applied at query time)
                part = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
                fetched[int(tid)] = (d, part)
            # score from the locally-fetched arrays DIRECTLY — the cache
            # is an optimization, never the source of truth, so a
            # cross-thread eviction between insert and use can't force a
            # fallback (results stay deterministic driver-local arithmetic)
            entries.update(fetched)
            with self._posting_cache_lock:
                for tid, ent in fetched.items():
                    if tid in self._posting_cache:
                        self._posting_cache.move_to_end(tid)
                    else:
                        self._posting_cache[tid] = ent
                # LRU eviction: drop least-recently-USED entries (hits
                # move_to_end above). Recompute the size from the dict — an
                # incrementally-drifted counter under concurrency
                # over-evicts forever.
                total = sum(len(v[0]) for v in self._posting_cache.values())
                while total > self._POSTING_CACHE_MAX and len(self._posting_cache) > 1:
                    old_tid = next(iter(self._posting_cache))
                    total -= len(self._posting_cache[old_tid][0])
                    del self._posting_cache[old_tid]

        docs_l, scores_l = [], []
        for t in toks:
            tid, idf = self._term_map[t]
            ent = entries.get(int(tid))
            if ent is None:
                # term indexed but zero blocks fetched (can only happen on
                # an empty postings anomaly) — skip it, contributes nothing
                continue
            docs_l.append(ent[0])
            scores_l.append(ent[1] * float(idf))
        if not docs_l:
            return []
        docs = np.concatenate(docs_l)
        scores = np.concatenate(scores_l)
        uniq, inv = np.unique(docs, return_inverse=True)
        tot = np.zeros(len(uniq))
        np.add.at(tot, inv, scores)
        top = _topk_df(uniq, tot, k)
        return list(zip(top["doc_id"].tolist(), top["score"].tolist()))

    def _perfect_scorer_partitioning(self, Q: int):
        """One shuffle partition per scoring group, exactly.

        With hash partitioning, 2×groups partitions still double-pack
        some group with ~99% probability at 19 groups (birthday bound:
        P(no collision) ≈ e^(−g²/2n)) — a structural 2-wave straggler
        the multi-core run pays every batch. The index is write-once and
        its doc_bucket values are known, so for small group counts we
        can do better than probabilistic placement: greedily pick a salt
        per (doc_bucket, qgrp) such that Spark's own shuffle hash
        (murmur3, seed 42 — exactly ``F.hash``) maps every group to a
        DISTINCT partition mod g. The candidate hashes are evaluated
        with the driver-side murmur3 replica above (no Spark job at
        all); the result is cached per (index, Q) forever.

        Returns (n_partitions, [(doc_bucket, qgrp, psalt), ...]) or None
        when it doesn't apply: uncached index, nb×Q > 64 (at that width
        per-task overhead amortizes and hash balance is fine), or the
        greedy search exhausts its salt budget (never observed; kept as
        a loud-free fallback to the capped hash path)."""
        import os

        nb = self._n_doc_buckets
        if not nb or nb * Q > 64:
            return None
        if os.environ.get("GLOOMY_PERFECT_PARTITIONING", "1") == "0":
            return None  # measurement escape hatch (bench A/B)
        cached = self._scorer_salt_cache.get(Q)
        if cached is not None:
            return cached or None  # False = previously gave up
        if self._bucket_values is None:
            self._bucket_values = sorted(
                int(r["doc_bucket"])
                for r in self.segments.select("doc_bucket").distinct().collect()
            )
        groups = [(b, q) for b in self._bucket_values for q in range(Q)]
        g = len(groups)
        n_salts = 8 * g
        used: set[int] = set()
        salt_rows: list[tuple[int, int, int]] = []
        for b, q in groups:
            for s in range(n_salts):
                slot = _spark_hash_bqs(b, q, s) % g
                if slot not in used:
                    used.add(slot)
                    salt_rows.append((b, q, s))
                    break
            else:
                self._scorer_salt_cache[Q] = False
                return None
        self._scorer_salt_cache[Q] = (g, salt_rows)
        return self._scorer_salt_cache[Q]

    def _batch_serving_view(self) -> tuple[DataFrame, list[str]] | None:
        """Persisted segments view pre-partitioned in the batch scorer's
        exact grouped layout (r4 verdict next #5: 'reuse what is reusable
        across batches').

        Every batch previously re-ran parquet scan → shuffle of the
        queried posting blocks; for serving workloads (many batches over
        one write-once index) that scan+shuffle is the dominant FIXED
        per-batch cost. The index's bucket layout is batch-independent
        when Q == 1 (the common regime: query-group salting only engages
        when cores > doc buckets), so the repartitioned block set can be
        persisted ONCE; each batch then runs a narrow in-memory filter on
        term_id and the grouped scorer directly — applyInPandas's
        ClusteredDistribution requirement is satisfied by the persisted
        hash partitioning, so the per-batch plan has NO exchange before
        scoring.

        Memory: comparable to the segments cache itself (MEMORY_AND_DISK,
        spills gracefully). At 10^12 docs a serving shard persists only
        its own buckets — exactly how the doc_bucket sharding splits the
        index. Built lazily on the first batch; requires .cache()."""
        with self._serving_view_lock:
            if self._serving_view is not None:
                return self._serving_view
            # the view carries ONLY real data columns: a constant key
            # column (qgrp≡0 at Q==1) is constant-folded out of the cached
            # partitioning expression, after which the scorer's clustering
            # requirement no longer matches and Spark re-inserts the
            # exchange — see _spark_hash_bs
            base = self.segments.select(
                "doc_bucket", "term_id", "first_doc", "last_doc", "n_docs",
                "docs", "tfs", "dls",
            )
            salts = self._view_salts()
            if salts:
                n_parts, salt_rows = salts
                sentries = ", ".join(f"{b}L, {s}" for b, s in salt_rows)
                psalt = F.expr(f"map({sentries})[doc_bucket]")
                view = base.withColumn("psalt", psalt).repartition(
                    n_parts, "doc_bucket", "psalt"
                )
                keys = ["doc_bucket", "psalt"]
            else:
                sp = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
                nb = self._n_doc_buckets
                sp_eff = min(sp, 2 * nb) if nb else sp
                view = base.repartition(sp_eff, "doc_bucket")
                keys = ["doc_bucket"]
            view = view.persist()
            view.count()  # materialize once, off the query path
            self._serving_view = (view, keys)
            return self._serving_view

    def _view_salts(self) -> tuple[int, list[tuple[int, int]]] | None:
        """Perfect (collision-free) bucket→partition placement for the
        serving view's 2-column (doc_bucket, psalt) layout; same greedy
        construction and applicability bounds as
        _perfect_scorer_partitioning, with the 2-column murmur3 replica."""
        nb = self._n_doc_buckets
        if not nb or nb > 64:
            return None
        if self._bucket_values is None:
            self._bucket_values = sorted(
                int(r["doc_bucket"])
                for r in self.segments.select("doc_bucket").distinct().collect()
            )
        g = len(self._bucket_values)
        used: set[int] = set()
        salt_rows: list[tuple[int, int]] = []
        for b in self._bucket_values:
            for s in range(8 * g):
                slot = _spark_hash_bs(b, s) % g
                if slot not in used:
                    used.add(slot)
                    salt_rows.append((b, s))
                    break
            else:
                return None
        return (g, salt_rows)

    def bm25_topk_batch(
        self, queries: list[str], k: int = 10, use_blockmax: bool = True
    ) -> DataFrame:
        """Score MANY queries in ONE Spark job → (query_id, doc_id, score).

        Serving-throughput path: per-query jobs pay Spark's scheduling
        floor (~0.3-1s) each; batching amortizes it — ONE segments scan
        over the union of all query terms, ONE shuffle of each block (no
        per-query payload duplication: idf is a term property, so each
        block is decoded and scored once per doc_bucket and every query
        just gathers its terms' (doc, score) arrays), then a PARTITIONED
        top-k window per query (never a global single-task sort).
        query_id is the queries-list index; queries with no indexed terms
        emit no rows. Exact scores (full DAAT per bucket — with many
        queries sharing terms, block-max pruning would save nothing since
        shared blocks must be decoded anyway; use_blockmax is accepted for
        signature parity)."""
        k1, b, avgdl = self.cfg.bm25.k1, self.cfg.bm25.b, self.manifest.avgdl
        toks_by_q = {
            qi: list(dict.fromkeys(tokenize(q, self.cfg))) for qi, q in enumerate(queries)
        }
        all_toks = list(dict.fromkeys(t for ts in toks_by_q.values() for t in ts))
        if self._term_map is not None:
            lookup = {t: self._term_map[t] for t in all_toks if t in self._term_map}
        else:
            lookup = {
                r["term"]: (r["term_id"], r["idf"])
                for r in self.terms.where(_in_strings("term", all_toks))
                .select("term", "term_id", "idf")
                .collect()
            }
        # query_id → [term_id]; idf is a TERM property (query-independent),
        # so each block is shuffled and decoded+scored ONCE per bucket, and
        # queries merely gather their terms' (doc, score) arrays — no
        # per-query payload duplication in the shuffle
        q_terms = {
            qi: [int(lookup[t][0]) for t in ts if t in lookup]
            for qi, ts in toks_by_q.items()
        }
        q_terms = {qi: ts for qi, ts in q_terms.items() if ts}
        if not q_terms:
            return self.spark.createDataFrame([], "query_id int, " + TOPK_SCHEMA)
        idf_by_tid = {int(tid): float(idf) for tid, idf in lookup.values()}
        ids = sorted(idf_by_tid)

        # scoring-parallelism policy: at web scale an index has ~10^6 doc
        # buckets and hash partitioning balances naturally, but a small
        # index (or a coarse bucket_width) can have FEWER buckets than
        # shuffle partitions — then per-bucket tasks are the parallelism
        # ceiling. Salt the scoring key with a query group: each bucket's
        # queries split into Q groups scored by separate tasks (blocks
        # shared by groups are duplicated in the shuffle — the honest
        # price of parallelism finer than the bucket grain).
        sp = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        nb = self._n_doc_buckets
        n_queries = len(q_terms)
        # A/B on the 19-bucket bench regime: Q=3 salting tripled the
        # shared-block decode (+45% single-core time) while the 4-core
        # wall stayed flat — duplicated decode exactly offsets the finer
        # tasks. Salt ONLY when buckets can't even fill the executor
        # slots once (the truly-starved case: a handful of buckets on a
        # wide cluster), never merely because buckets < partitions.
        cores = self.spark.sparkContext.defaultParallelism
        Q = max(1, min(8, cores // nb, n_queries)) if nb else 1

        def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            if Q > 1:
                grp = int(pdf["qgrp"].iloc[0])
                my_q_terms = {
                    qi: ts for qi, ts in q_terms.items() if qi % Q == grp
                }
            else:
                my_q_terms = q_terms
            tids = pdf["term_id"].to_numpy(np.int64)
            # column arrays ONCE: pdf.iloc per block costs ~50µs of pandas
            # machinery each — at 10⁴-10⁵ blocks per task that dwarfs the
            # actual varint decode work
            docs_a = pdf["docs"].to_numpy()
            tfs_a = pdf["tfs"].to_numpy()
            dls_a = pdf["dls"].to_numpy()
            nd_a = pdf["n_docs"].to_numpy()
            by_term: dict[int, list[int]] = {}
            for i, t in enumerate(tids.tolist()):
                by_term.setdefault(t, []).append(i)

            # ONE bulk decode for ALL of this task's needed terms (each
            # block stores its first docID absolute, so the segmented
            # delta reconstruction is per-block and term boundaries need
            # no special handling), then ONE vectorized BM25 pass with
            # the per-term idf repeated across term spans. Per-TERM
            # decode was numpy-call-dispatch bound: ~100k varint_decode
            # calls / 8.3 s for 1000 Zipf queries × 19 buckets, most on
            # tail terms far below vectorization break-even (profiled —
            # BENCH/BASELINE.md).
            needed = sorted(
                {t for ts in my_q_terms.values() for t in ts} & by_term.keys()
            )
            bufs_d: list = []
            bufs_t: list = []
            bufs_l: list = []
            cnts: list[int] = []
            spans: dict[int, tuple[int, int]] = {}
            p = 0
            for t in needed:
                rows = by_term[t]
                bufs_d += [docs_a[i] for i in rows]
                bufs_t += [tfs_a[i] for i in rows]
                bufs_l += [dls_a[i] for i in rows]
                c = [int(nd_a[i]) for i in rows]
                cnts += c
                n = sum(c)
                spans[t] = (p, p + n)
                p += n
            if needed:
                D, TF, DL = decode_posting_blocks_bulk(bufs_d, bufs_t, bufs_l, cnts)
                idf_rep = np.repeat(
                    np.array([idf_by_tid[t] for t in needed]),
                    np.array([spans[t][1] - spans[t][0] for t in needed]),
                )
                S = idf_rep * (TF * (k1 + 1.0)) / (
                    TF + k1 * (1.0 - b + b * (DL / avgdl))
                )
            _empty = (np.array([], np.int64), np.array([], np.float64))

            def term_postings(tid: int):
                span = spans.get(tid)
                if span is None:  # absent term → empty
                    return _empty
                return D[span[0]:span[1]], S[span[0]:span[1]]

            # doc_bucket = doc_id // width bounds this bucket's doc span,
            # so per-query aggregation can be a DENSE bincount over
            # bucket-relative offsets (C-speed, no per-query sort) instead
            # of unique+add.at. A fully-vectorized incidence variant
            # (global lexsort/reduceat) was A/B-measured ~1.6× SLOWER at
            # 1000 queries; the dense path replaces the per-query
            # O(n log n) unique with O(span + postings). Guard the span:
            # 4M-doc buckets cost a 32 MB accumulator — beyond that (or on
            # pathological sparse id spaces) fall back to the sort path.
            base = int(pdf["first_doc"].min())
            span = int(pdf["last_doc"].max()) - base + 1
            dense = 0 < span <= (1 << 22)

            # queries normalizing to the SAME indexed term-set share one
            # scoring pass (frequent in serving workloads)
            tset_groups: dict[tuple, list[int]] = {}
            for qi, terms in my_q_terms.items():
                tset_groups.setdefault(tuple(sorted(set(terms))), []).append(qi)

            out_qid: list[np.ndarray] = []
            out_doc: list[np.ndarray] = []
            out_score: list[np.ndarray] = []
            for tset, qis in tset_groups.items():
                parts = [term_postings(t) for t in tset]
                if len(parts) == 1:
                    # single-term query group: doc_ids are already unique
                    # within a term, so the aggregation pass (bincount +
                    # nonzero over the bucket span, ~2.3 s/1000 queries
                    # profiled) is a no-op — rank the postings directly
                    d, s = parts[0]
                    if len(d) == 0:
                        continue
                    td, ts_ = _topk_arrays(d, s, k)
                elif dense:
                    acc = None
                    for d, s in parts:
                        if len(d) == 0:
                            continue
                        v = np.bincount(d - base, weights=s, minlength=span)
                        acc = v if acc is None else acc + v
                    if acc is None:
                        continue
                    nz = np.nonzero(acc)[0]
                    if len(nz) == 0:
                        continue
                    td, ts_ = _topk_arrays(nz + np.int64(base), acc[nz], k)
                else:
                    docs = np.concatenate([p[0] for p in parts])
                    if len(docs) == 0:
                        continue
                    scores = np.concatenate([p[1] for p in parts])
                    uniq, inv = np.unique(docs, return_inverse=True)
                    tot = np.zeros(len(uniq))
                    np.add.at(tot, inv, scores)
                    td, ts_ = _topk_arrays(uniq, tot, k)
                # numpy accumulation only — ONE pandas frame per task at
                # the end (a frame per group × per query measured 7.5 s /
                # 23 s scoring pass; see _topk_arrays)
                for qi in qis:
                    out_qid.append(np.full(len(td), qi, np.int32))
                    out_doc.append(td)
                    out_score.append(ts_)
            if not out_qid:
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": []}
                )
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(out_qid),
                    "doc_id": np.concatenate(out_doc),
                    "score": np.concatenate(out_score),
                }
            )

        import os as _os

        if (
            Q == 1
            and self._n_doc_buckets
            and _os.environ.get("GLOOMY_SERVING_VIEW", "1") != "0"
        ):
            # serving fast path: filter the persisted pre-partitioned view
            # (narrow — no scan, no shuffle; see _batch_serving_view)
            view, keys = self._batch_serving_view()
            per = (
                view.where(_in_longs("term_id", ids))
                .groupBy(*keys)
                .applyInPandas(score_bucket, "query_id int, " + TOPK_SCHEMA)
            )
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
            return (
                per.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= k)
                .drop("_rn")
            )

        cand = self.segments.where(_in_longs("term_id", ids)).select(
            "doc_bucket", "term_id", "first_doc", "last_doc", "n_docs",
            "docs", "tfs", "dls",
        )
        if Q > 1:
            by_tid: dict[int, list[int]] = {}
            for qi, ts in q_terms.items():
                grp = qi % Q
                for tid in ts:
                    gs = by_tid.setdefault(tid, [])
                    if grp not in gs:
                        gs.append(grp)
            n_pairs = sum(len(gs) for gs in by_tid.values())
            if n_pairs <= 2048:
                # literal map term_id → array(qgrps), exploded: pure JVM
                # expressions. A createDataFrame dim here is a python-RDD
                # broadcast — one extra job with python-worker startup per
                # batch (~0.3-0.5 s), measured 2× the whole warm batch
                # wall at 40 queries / local[32] (BENCH/BASELINE.md r4
                # A/B). Large batches keep the broadcast join: a literal
                # map with tens of thousands of nodes slows analysis, and
                # 1000-query batches amortize the job anyway.
                # ONE py4j call: building the same map from F.lit/F.array
                # columns costs a py4j round-trip per literal (~0.3-0.5 s
                # of driver prep at 40 queries — measured), the SQL string
                # parses JVM-side in microseconds
                entries = ", ".join(
                    f"{tid}L, array({', '.join(str(g) for g in sorted(by_tid[tid]))})"
                    for tid in sorted(by_tid)
                )
                cand = cand.withColumn(
                    "qgrp", F.explode(F.expr(f"map({entries})[term_id]"))
                )
            else:
                pairs = sorted(
                    (tid, grp) for tid, gs in by_tid.items() for grp in gs
                )
                qdim = self.spark.createDataFrame(pairs, "term_id long, qgrp int")
                cand = cand.join(F.broadcast(qdim), "term_id")
        else:
            cand = cand.withColumn("qgrp", F.lit(0))
        # EXPLICIT repartition before the grouped scorer: AQE coalesces
        # shuffle partitions by BYTE size, but this stage's cost is
        # python scoring work ∝ buckets × queries, not bytes — byte-based
        # coalescing packs the scoring groups into a handful of tasks and
        # manufactures a straggler. A user repartition with an explicit
        # partition count is exempt from AQE coalescing, and the groupBy
        # reuses its hash partitioning (no extra exchange in the plan).
        # grouped-map python tasks are not free: ~90 ms/partition of
        # arrow/worker protocol overhead each, measured at local[1] (a
        # 1-query warm batch: 6.6 s at 64 partitions vs 2.1 s at 8 —
        # BENCH/BASELINE.md). Small bucket counts therefore get PERFECT
        # partitioning (one partition per scoring group via precomputed
        # salts — no empty partitions AND no double-packed straggler);
        # otherwise cap at 2× the scoring groups: partitions beyond nb×Q
        # are empty BY CONSTRUCTION (nothing else hashes there), so they
        # buy no parallelism, only protocol overhead. At web scale
        # (~10^6 buckets) neither path binds and the configured
        # shuffle_partitions wins.
        perfect = self._perfect_scorer_partitioning(Q)
        if perfect:
            n_parts, salt_rows = perfect
            # psalt via a literal map keyed by doc_bucket·Q + qgrp (≤64
            # entries by construction) — attaching it with a
            # createDataFrame dim costs a python-RDD broadcast job per
            # batch; a map literal is free. Placement is unchanged: the
            # repartition hashes the same three columns.
            sentries = ", ".join(f"{b * Q + q}L, {s}" for b, q, s in salt_rows)
            psalt_expr = F.expr(
                f"map({sentries})[doc_bucket * {Q}L + CAST(qgrp AS BIGINT)]"
            )
            per = (
                cand.withColumn("psalt", psalt_expr)
                .repartition(n_parts, "doc_bucket", "qgrp", "psalt")
                .groupBy("doc_bucket", "qgrp", "psalt")
                .applyInPandas(score_bucket, "query_id int, " + TOPK_SCHEMA)
            )
        else:
            sp_eff = min(sp, 2 * nb * Q) if nb else sp
            per = (
                cand.repartition(sp_eff, "doc_bucket", "qgrp")
                .groupBy("doc_bucket", "qgrp")
                .applyInPandas(score_bucket, "query_id int, " + TOPK_SCHEMA)
            )

        # A driver-side final merge (takeOrdered pattern: Arrow toPandas of
        # the ≤ buckets×queries×k per-bucket top-k rows + numpy lexsort)
        # was A/B-measured here and REJECTED: warm-session walls were
        # identical to the window path (5.9-6.1s vs 5.8-6.3s at 4 cores,
        # 1000 queries) — the window below is already map-side limited
        # (WindowGroupLimit) and its exchange moves only top-k rows, so
        # there is nothing to save.
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
