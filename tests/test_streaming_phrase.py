"""Streaming incremental build equivalence + phrase query tests."""

from __future__ import annotations

import numpy as np
import pytest

from gloomy_spark.build import IndexBuilder
from gloomy_spark.config import BM25Config, EngineConfig
from gloomy_spark.corpus import generate_pages_batch, pages_df
from gloomy_spark.oracle import OracleIndex
from gloomy_spark.query.engine import SearchIndex
from gloomy_spark.streaming.incremental import IncrementalIndexer
from gloomy_spark.textnorm import tokenize

CFG = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)


@pytest.mark.spark
def test_streaming_incremental_equals_batch(spark, tmp_path):
    n = 120
    input_dir = str(tmp_path / "in")
    work = str(tmp_path / "work")
    # three corpus files arriving over time
    for i, (lo, hi) in enumerate([(0, 40), (40, 90), (90, 120)]):
        pages_df(spark, hi, partitions=2).where(
            f"doc_id >= {lo}"
        ).select("doc_id", "text").write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(input_dir)

    inc = IncrementalIndexer(spark, work, CFG)
    q = inc.start(input_dir, "doc_id long, text string")
    q.awaitTermination(120)

    ledger = open(inc.run_ledger).read().strip().splitlines()
    assert len(ledger) >= 1

    idx_dir = str(tmp_path / "idx_stream")
    manifest = inc.compact(idx_dir, n_buckets=2)
    assert manifest.n_docs == n

    # batch-built reference over the same docs
    idx_batch = str(tmp_path / "idx_batch")
    docs = pages_df(spark, n, partitions=4).select("doc_id", "text")
    IndexBuilder(spark, CFG).build(docs, idx_batch, n_buckets=2)

    si_s = SearchIndex(spark, idx_dir)
    si_b = SearchIndex(spark, idx_batch)
    for q_ in ["the data of", "žluťoučký", "the"]:
        a = [(r.doc_id, round(r.score, 9)) for r in si_s.bm25_topk(q_, 10).collect()]
        b = [(r.doc_id, round(r.score, 9)) for r in si_b.bm25_topk(q_, 10).collect()]
        assert a == b, q_
    # dictionaries identical
    ta = sorted((r.term, r.df, r.cf) for r in si_s.terms.collect())
    tb = sorted((r.term, r.df, r.cf) for r in si_b.terms.collect())
    assert ta == tb


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("pidx"))
    docs = pages_df(spark, 150, partitions=4).select("doc_id", "text")
    IndexBuilder(spark, CFG).build(docs, idx, n_buckets=2)
    local = generate_pages_batch(np.arange(150))
    return SearchIndex(spark, idx), local


@pytest.mark.spark
def test_phrase_match_against_bruteforce(phrase_index):
    si, local = phrase_index
    # pick real bigrams/trigrams from doc texts + an absent phrase
    toks0 = tokenize(local.text.iloc[0], CFG)
    phrases = [
        " ".join(toks0[2:4]),
        " ".join(toks0[5:8]),
        "zzz qqq",
    ]
    for ph in phrases:
        want = set()
        p_toks = tokenize(ph, CFG)
        for _, row in local.iterrows():
            t = tokenize(row.text, CFG)
            for i in range(len(t) - len(p_toks) + 1):
                if t[i : i + len(p_toks)] == p_toks:
                    want.add(row.doc_id)
                    break
        got = {r.doc_id for r in si.phrase_match(ph).collect()}
        assert got == want, ph


@pytest.mark.spark
def test_postings_positions_roundtrip(phrase_index):
    si, local = phrase_index
    rows = {r.doc_id: list(r.positions) for r in si.postings_positions("the").collect()}
    oracle = OracleIndex(list(zip(local.doc_id, local.text)), CFG)
    want = {d: pos for d, pos in oracle.positions["the"].items()}
    assert rows == want
