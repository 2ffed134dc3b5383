"""Round-2 regression tests: batched BM25 serving, ANN multi-probe recall,
band-OR embedding pairs, scale-safe phrase/slice plans, service pagination."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest
from pyspark.sql import functions as F

from gloomy_spark.build import IndexBuilder
from gloomy_spark.config import EngineConfig
from gloomy_spark.corpus import pages_df
from gloomy_spark.ops import simsearch
from gloomy_spark.query.engine import SearchIndex

CFG = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("r2idx"))
    docs = pages_df(spark, 150, partitions=4).select("doc_id", "text")
    IndexBuilder(spark, CFG).build(docs, idx, n_buckets=2)
    return SearchIndex(spark, idx)


@pytest.mark.spark
def test_bm25_batch_equals_per_query(small_index):
    si = small_index
    queries = ["the data of", "spark table column", "nosuchword", "the"]
    batch = si.bm25_topk_batch(queries, k=7).collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qi, q in enumerate(queries):
        single = [
            (r["doc_id"], round(r["score"], 9)) for r in si.bm25_topk(q, k=7).collect()
        ]
        got = sorted(by_q.get(qi, []), key=lambda t: (-t[1], t[0]))
        assert got == single, q


@pytest.mark.spark
def test_bm25_batch_cached_dictionary_path(small_index):
    si = SearchIndex(small_index.spark, small_index.store.index_dir).cache()
    queries = ["the data of", "spark table column"]
    a = sorted(tuple(r) for r in si.bm25_topk_batch(queries, k=5).collect())
    b = sorted(tuple(r) for r in small_index.bm25_topk_batch(queries, k=5).collect())
    assert a == b


@pytest.mark.spark
def test_ann_lsh_multiprobe_recall(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    exact = {r["vec_id"] for r in simsearch.cosine_topk(emb, 0, 10).collect()}
    approx_rows = simsearch.ann_lsh_topk(emb, 0, 10).collect()
    approx = {r["vec_id"] for r in approx_rows}
    assert len(approx_rows) == 10  # a top-k that answers nothing is broken
    recall = len(exact & approx) / 10
    assert recall >= 0.8, f"recall@10 {recall}"


@pytest.mark.spark
def test_pairwise_above_finds_planted_near_dups(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 5 near-duplicates of vectors 0..4 (tiny perturbation → cos≈1)
    planted = set()
    for i in range(5):
        dup = base[i] + 0.01 * rng.standard_normal(32)
        rows.append((100 + i, [float(x) for x in dup]))
        planted.add((i, 100 + i))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_a"], r["vec_b"])
        for r in simsearch.pairwise_above(emb, 0.9).collect()
    }
    assert planted <= got, f"missed planted pairs: {planted - got}"


@pytest.mark.spark
def test_phrase_match_plan_has_no_explode(small_index):
    # the scale-safe plan never explodes corpus-wide position lists; a
    # Generate node in the physical plan would mean the old anchor-union
    df = small_index.phrase_match("of the")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan


@pytest.mark.spark
def test_slice_plan_has_no_window(small_index):
    df = small_index.slice(small_index.search_prefix("t*"), offset=2, limit=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert len(df.collect()) == 3


@pytest.mark.spark
def test_service_nonzero_offset(spark, tmp_path):
    from gloomy_spark.service import SearchService

    idx = str(tmp_path / "svcidx")
    docs = pages_df(spark, 80, partitions=2).select("doc_id", "text")
    IndexBuilder(spark, CFG).build(docs, idx, n_buckets=1)
    svc = SearchService(spark, {"main": idx})
    port = svc.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=60
            ) as r:
                return json.loads(r.read())

        full = get("/search?corpus=main&q=t*&qtype=prefix&limit=50")
        assert full["size"] > 12
        page = get("/search?corpus=main&q=t*&qtype=prefix&offset=10&limit=5")
        assert page["size"] == 5  # offset bug returned offset+limit rows
        all_terms = sorted(r["term"] for r in full["rows"])
        assert [r["term"] for r in page["rows"]] == all_terms[10:15]
    finally:
        svc.stop()
