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
def test_bm25_serve_rank_identical_and_cached(small_index):
    si = SearchIndex(small_index.spark, small_index.store.index_dir).cache()
    import time as _time

    for q in ["the data of", "spark table column", "the", "zzz missing"]:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in si.bm25_topk(q, 10).collect()
        ]
        got = [(d, round(s, 9)) for d, s in si.bm25_serve(q, 10)]
        assert got == want, q
    # repeat query: all terms cached → no Spark job, sub-50ms
    t0 = _time.time()
    si.bm25_serve("the data of", 10)
    assert _time.time() - t0 < 0.05


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
def test_ivf_store_partition_pruning_and_recall(spark, tmp_path):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    out = str(tmp_path / "ivf_store")
    simsearch.ivf_build(emb, out, n_lists=8)
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    res = simsearch.ivf_search(spark, out, qv, k=11, n_probe=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the probe filter must reach the file level, not a post-scan filter
    assert "PartitionFilters: [" in plan and "ivf_list" in plan.split("PartitionFilters")[1][:120], plan
    got = [r["vec_id"] for r in res.collect() if r["vec_id"] != 0][:10]
    exact = [r["vec_id"] for r in simsearch.cosine_topk(emb, 0, 10).collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, f"IVF recall@10 {recall}"


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
def test_bm25_batch_plan_shape(small_index):
    """The batched-serving plan must be: ONE parquet scan with the query
    terms' ids pushed down, ONE doc_bucket shuffle of compressed blocks
    (no per-query payload duplication), the pandas scorer, and a
    partitioned per-query top-k (map-side WindowGroupLimit, never a
    single-task global sort)."""
    import re

    df = small_index.bm25_topk_batch(["the data", "of the"], 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE segments read per batch: either a direct pushed-down parquet
    # scan or one cached-table scan. (The cached relation's own subtree —
    # everything from "InMemoryRelation" down, including the r6
    # degenerate-layout repartition whose AQE rendering prints its
    # FileScan twice, Final + Initial — is the one-time cache
    # materialization, not per-batch work.)
    per_batch = plan.split("InMemoryRelation")[0]
    n_scans = per_batch.count("FileScan parquet") + plan.count(
        "InMemoryTableScan"
    )
    assert n_scans == 1, plan
    # the query terms' id filter must reach that scan
    scan_at = (
        per_batch.find("InMemoryTableScan")
        if "InMemoryTableScan" in per_batch
        else per_batch.find("FileScan")
    )
    assert "term_id" in per_batch[scan_at : scan_at + 400], plan
    assert len(re.findall(r"Exchange hashpartitioning", per_batch)) == 2, plan
    assert "FlatMapGroupsInPandas" in per_batch
    assert "WindowGroupLimit" in per_batch  # per-query top-k pushed map-side


@pytest.mark.spark
def test_phrase_match_plan_has_no_explode(small_index):
    # the scale-safe plan never explodes corpus-wide position lists; a
    # Generate node in the physical plan would mean the old anchor-union
    df = small_index.phrase_match("of the")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    # r6: the bucketed matcher runs as repartition+MapInArrow (one python
    # round trip per task; no Sort) instead of FlatMapGroupsInPandas
    assert "MapInArrow" in plan, plan


@pytest.mark.spark
def test_slice_plan_has_no_window(small_index):
    df = small_index.slice(small_index.search_prefix("t*"), offset=2, limit=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert len(df.collect()) == 3


def test_vertical_structure_resets_ngram_windows():
    """Golden: bigrams never cross a mid-doc <s> boundary (the space-joined
    behavior would emit 'world again')."""
    from gloomy_spark.sources.vertical import parse_vertical
    from gloomy_spark.textnorm import ngrams, tokenize

    body = (
        '<doc file="a" n="1">\n'
        "<s>\nHello\tUH\nworld\tNN\n</s>\n"
        "<s>\nagain\tRB\nhello\tUH\n</s>\n"
        "</doc>\n"
    )
    (doc,) = parse_vertical(body)
    assert tokenize(doc["text"]) == ["hello", "world", "again", "hello"]
    assert ngrams(doc["text"], 2) == ["hello world", "again hello"]


@pytest.mark.spark
def test_segments_col_multichar_stop_parity(spark):
    """A token-level stop word (reference isStopWord, builder.go:91-98)
    resets windows identically in the pinned-Python and Spark column
    paths."""
    from gloomy_spark import textnorm
    from gloomy_spark.functions.text import ngrams_col, segments_col

    cfg = EngineConfig(stop_strings=(".", ":", "stopword"), ignore_strings=('"', ","))
    texts = [
        "alpha beta stopword gamma delta",
        "stopword alpha stopword",
        "Alpha STOPWORD beta. gamma stopword",
        "nostopword alpha stopwordx beta",  # substrings must NOT reset
        "a,stopword;b",
        "",
        "stopword",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        "text",
        segments_col(F.col("text"), cfg).alias("segs"),
        ngrams_col(F.col("text"), 2, cfg).alias("bi"),
    ).collect()
    for r in got:
        want_segs = textnorm.segments(r["text"], cfg)
        want_bi = textnorm.ngrams(r["text"], 2, cfg)
        assert [list(s) for s in r["segs"]] == want_segs, r["text"]
        assert list(r["bi"]) == want_bi, r["text"]


@pytest.mark.spark
def test_tokenization_parity_random_texts(spark):
    """Property-style: on 300 adversarial random texts (punctuation runs,
    unicode, token-exact and embedded multi-char stop words), the Spark
    column implementations must equal the pinned Python semantics for
    tokens, segments, bigrams and trigrams — batched into one Spark pass
    per config."""
    import random

    from gloomy_spark import textnorm
    from gloomy_spark.functions.text import ngrams_col, segments_col, tokens_col

    rng = random.Random(1234)
    atoms = list("abcd .,;?!:\"'\t") + ["stop", "stopx", "ž", "é", ".."]
    texts = [
        "".join(rng.choice(atoms) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    configs = [
        EngineConfig(),
        EngineConfig(stop_strings=(".", ":", "stop")),
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for cfg in configs:
        rows = df.select(
            "text",
            tokens_col(F.col("text"), cfg).alias("toks"),
            segments_col(F.col("text"), cfg).alias("segs"),
            ngrams_col(F.col("text"), 2, cfg).alias("bi"),
            ngrams_col(F.col("text"), 3, cfg).alias("tri"),
            ngrams_col(F.col("text"), 10, cfg).alias("deca"),  # MaxNgramSize
        ).collect()
        for r in rows:
            t = r["text"]
            assert list(r["toks"]) == textnorm.tokenize(t, cfg), repr(t)
            assert [list(s) for s in r["segs"]] == textnorm.segments(t, cfg), repr(t)
            assert list(r["bi"]) == textnorm.ngrams(t, 2, cfg), repr(t)
            assert list(r["tri"]) == textnorm.ngrams(t, 3, cfg), repr(t)
            assert list(r["deca"]) == textnorm.ngrams(t, 10, cfg), repr(t)


@pytest.mark.spark
def test_compact_last_run_wins_on_reingested_doc(spark, tmp_path):
    """A doc_id re-ingested in a later file must index its LATEST content
    (summing tf across runs double-counts dl and overlaps positions)."""
    from gloomy_spark.streaming.incremental import IncrementalIndexer

    input_dir = str(tmp_path / "in")
    old = [(0, "old words that vanish entirely"), (1, "stable other document")]
    new = [(0, "fresh replacement text appears here now")]
    spark.createDataFrame(old, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(input_dir)
    inc = IncrementalIndexer(spark, str(tmp_path / "work"), CFG)
    q = inc.start(input_dir, "doc_id long, text string")
    q.awaitTermination(60)
    spark.createDataFrame(new, "doc_id long, text string").write.mode(
        "append"
    ).parquet(input_dir)
    q = inc.start(input_dir, "doc_id long, text string")
    q.awaitTermination(60)

    idx_dir = str(tmp_path / "idx")
    manifest = inc.compact(idx_dir, n_buckets=1)
    assert manifest.n_docs == 2

    batch_dir = str(tmp_path / "idx_batch")
    latest = [(0, new[0][1]), (1, old[1][1])]
    IndexBuilder(spark, CFG).build(
        spark.createDataFrame(latest, "doc_id long, text string"),
        batch_dir, n_buckets=1,
    )
    si_s, si_b = SearchIndex(spark, idx_dir), SearchIndex(spark, batch_dir)
    ta = sorted((r.term, r.df, r.cf) for r in si_s.terms.collect())
    tb = sorted((r.term, r.df, r.cf) for r in si_b.terms.collect())
    assert ta == tb
    assert si_s.phrase_match("replacement text").count() == 1
    assert si_s.phrase_match("old words").count() == 0


@pytest.mark.spark
def test_attr_cols_metadata_on_ngram_hits(spark, tmp_path):
    """Per-n-gram structure attrs (reference metadata.go:25-28 args
    columns): carried via the docs dimension, recovered per hit."""
    from gloomy_spark.sources import read_vertical_docs

    p = tmp_path / "corp.vert"
    p.write_text(
        '<doc file="x.txt" n="1">\nred\tA\nfox\tB\n</doc>\n'
        '<doc file="y.txt" n="2">\nred\tA\nfox\tB\nred\tA\n</doc>\n'
    )
    docs = read_vertical_docs(spark, str(p), attrs=["file"])
    idx = str(tmp_path / "vidx")
    IndexBuilder(spark, CFG).build(
        docs, idx, n_buckets=1, ngram_size=2, attr_cols=["file"]
    )
    si = SearchIndex(spark, idx)
    hits = si.postings("red fox").select("doc_id", "tf")
    rows = si.with_doc_metadata(hits, attrs=["file"]).collect()
    assert sorted(r["file"] for r in rows) == ["x.txt", "y.txt"]


@pytest.mark.spark
def test_dup_clusters_planted_components(spark):
    """Min-label propagation finds exact components on a graph with a
    chain (needs >1 round), a triangle, an isolated pair, and a long path."""
    from gloomy_spark.ops.dedup import dup_clusters

    pairs = [
        (1, 2), (2, 3), (3, 4),          # chain {1,2,3,4}
        (10, 11), (11, 12), (10, 12),    # triangle {10,11,12}
        (20, 21),                        # pair
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),  # path of 6
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(df).collect()}
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
            30: 30, 31: 30, 32: 30, 33: 30, 34: 30, 35: 30}
    assert got == want


@pytest.mark.spark
def test_frame_sample_matches_python_golden(spark):
    """media_frame_sample is value-oracled in SQL since round 4, but the
    oracle reads md5(text) where Spark hashes the BINARY media column —
    this Python golden additionally pins that the binary path (media :=
    utf-8(text)) produces the same digests."""
    import hashlib

    from gloomy_spark.ops import multimodal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.media_table(docs)
    got = {
        (r["doc_id"], r["frame_ts_ms"]): r["frame_hash"]
        for r in multimodal.frame_sample(media).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        base = hashlib.md5(r["text"].encode()).hexdigest()
        h = int(base[:8], 16)
        if ["image/png", "audio/wav", "video/mp4"][h % 3] != "video/mp4":
            continue
        n = min(max(1, (h % 600000) // 1000), 32)
        for i in range(n):
            want[(r["doc_id"], i * 1000)] = hashlib.md5(
                f"{base}:{i}".encode()
            ).hexdigest()
    assert got == want and len(got) > 0


@pytest.mark.spark
def test_cli_roundtrip(spark, tmp_path, capsys):
    """CLI parity with the reference dispatch (gloomy.go:142-162):
    create-index → search → bm25 → extract-ngrams on a tiny corpus."""
    from gloomy_spark.cli import main

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("the quick brown fox\nthe slow red fox\nquick red dog\n")
    idx = str(tmp_path / "cli_idx")

    assert main(["create-index", "--input", str(corpus), "--out", idx,
                 "--buckets", "1", "--shuffle-partitions", "4"], spark=spark) == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert built["n_docs"] == 3 and built["n_terms"] == 7

    assert main(["search", "--index", idx, "--query", "qu*",
                 "--qtype", "prefix"], spark=spark) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [r["term"] for r in rows] == ["quick"] and rows[0]["cf"] == 2

    assert main(["bm25", "--index", idx, "--query", "quick fox", "-k", "2"],
                spark=spark) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(rows) == 2 and rows[0]["score"] >= rows[1]["score"]

    assert main(["stats", "--index", idx], spark=spark) == 0
    lines = capsys.readouterr().out.splitlines()
    stats = json.loads(lines[0])
    assert stats["n_docs"] == 3 and stats["n_terms"] == 7
    assert json.loads(lines[1])["bucket"] == 0  # ledger echoed

    out_tsv = str(tmp_path / "ngrams_tsv")
    assert main(["extract-ngrams", "--index", idx, "--out", out_tsv,
                 "--min-freq", "2"], spark=spark) == 0
    import glob

    lines = []
    for f in glob.glob(out_tsv + "/part-*"):
        lines += open(f).read().splitlines()
    assert {l.split("\t")[0] for l in lines} == {"the", "quick", "red", "fox"}


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

        # write-once index → result cache: repeat request is a hit and fast
        a = get("/bm25?corpus=main&q=the%20data&k=3")
        b = get("/bm25?corpus=main&q=the%20data&k=3")
        assert a["cached"] is False and b["cached"] is True
        assert b["rows"] == a["rows"]
        assert b["searchTime"] < 0.1
    finally:
        svc.stop()
