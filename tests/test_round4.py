"""Round-4 closures: true-LRU posting cache, doc_attrs race contract,
read_pages dispatch, segment-writer loud bounds, inverter-backed
incremental ingest, LSH store fingerprint, doc_id collision check."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gloomy_spark.config import EngineConfig


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)
    idx = str(tmp_path_factory.mktemp("r4idx") / "idx")
    docs = pages_df(spark, 120, partitions=4).select("doc_id", "text", "url")
    IndexBuilder(spark, cfg).build(docs, idx, n_buckets=2, url_col="url")
    return SearchIndex(spark, idx).cache()


@pytest.mark.spark
def test_posting_cache_true_lru(small_index):
    """A hit must refresh recency: after q1, q2, q1-again, inserting q3
    under a tight budget evicts q2's terms first — q1's survive."""
    si = small_index
    q1, q2, q3 = "the data", "and to", "that was"

    # measure per-query cached postings with an unbounded budget
    si._POSTING_CACHE_MAX = 10**9
    with si._posting_cache_lock:
        si._posting_cache.clear()
    si.bm25_serve(q1, 5)
    tids1 = set(si._posting_cache)
    si.bm25_serve(q2, 5)
    tids2 = set(si._posting_cache) - tids1
    si.bm25_serve(q3, 5)
    tids3 = set(si._posting_cache) - tids1 - tids2
    assert tids1 and tids2 and tids3
    sizes = {t: len(v[0]) for t, v in si._posting_cache.items()}
    s1 = sum(sizes[t] for t in tids1)
    s3 = sum(sizes[t] for t in tids3)

    # replay with a budget that fits q1+q3 but NOT q2 as well
    with si._posting_cache_lock:
        si._posting_cache.clear()
    si._POSTING_CACHE_MAX = s1 + s3
    si.bm25_serve(q1, 5)
    si.bm25_serve(q2, 5)
    si.bm25_serve(q1, 5)  # the hit that must refresh q1's recency
    si.bm25_serve(q3, 5)
    with si._posting_cache_lock:
        cached = set(si._posting_cache)
    assert tids1 <= cached, "recently-HIT q1 terms were evicted (FIFO, not LRU)"
    assert not (tids2 <= cached), "oldest-unused q2 terms should evict first"
    si._POSTING_CACHE_MAX = type(si)._POSTING_CACHE_MAX


@pytest.mark.spark
def test_doc_attrs_more_ids_than_cache_cap(small_index):
    """Requesting more ids than the cache cap must still return real
    attrs for every existing doc — the cache is an optimization, never
    the source of truth (round-4 ADVICE race)."""
    si = small_index
    ids = [r["doc_id"] for r in si.docs.select("doc_id").limit(10).collect()]
    si._doc_attr_cache.clear()
    old_max = si._DOC_ATTR_CACHE_MAX
    si._DOC_ATTR_CACHE_MAX = 3  # instance attr shadows the class constant
    try:
        got = si.doc_attrs(ids, ["url", "doclen"])
    finally:
        si._DOC_ATTR_CACHE_MAX = old_max
        si._doc_attr_cache.clear()
    assert set(got) == set(int(i) for i in ids)
    for d, row in got.items():
        assert row.get("url"), f"doc {d} lost its attrs to cache eviction"


@pytest.mark.spark
def test_read_pages_dispatch(spark, tmp_path, monkeypatch):
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.sources.pages import read_pages

    fixture = tmp_path / "pages_data"  # no slash when referenced relatively
    pages_df(spark, 5, partitions=1).write.mode("overwrite").parquet(str(fixture))

    # a relative existing dir must go to the parquet branch, not a catalog
    monkeypatch.chdir(tmp_path)
    assert read_pages(spark, "pages_data").count() == 5
    # explicit prefixes force the branch
    assert read_pages(spark, f"path:{fixture}").count() == 5
    spark.read.parquet(str(fixture)).createOrReplaceTempView("r4_pages_tbl")
    try:
        assert read_pages(spark, "table:r4_pages_tbl").count() == 5
        # bare identifier with no such file → table branch
        assert read_pages(spark, "r4_pages_tbl").count() == 5
    finally:
        spark.catalog.dropTempView("r4_pages_tbl")


@pytest.mark.spark
def test_segment_writer_partition_bound_raises(spark, tmp_path, monkeypatch):
    """The writer's in-memory sort must fail LOUDLY when a shuffle
    partition exceeds its bounds, instead of corrupting offsets/OOMing."""
    import gloomy_spark.build as build_mod
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df

    monkeypatch.setattr(build_mod, "_SEGMENT_PARTITION_MAX_ROWS", 10)
    cfg = EngineConfig(shuffle_partitions=1, doc_bucket_width=64)
    docs = pages_df(spark, 30, partitions=1).select("doc_id", "text")
    with pytest.raises(Exception, match="exceeds the in-memory sort bound"):
        IndexBuilder(spark, cfg).build(
            docs, str(tmp_path / "idx"), n_buckets=1, resume=False
        )


@pytest.mark.spark
def test_incremental_runs_use_inverter_binary_positions(spark, tmp_path):
    """Micro-batch runs now come from the shared _partition_inverter:
    positions land PRE-ENCODED (binary postings_raw contract) and compact
    consumes them without the legacy array<int> conversion."""
    from gloomy_spark.streaming.incremental import IncrementalIndexer
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(shuffle_partitions=4, doc_bucket_width=64)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(src)

    inc = IncrementalIndexer(spark, str(tmp_path / "work"), cfg)
    inc.start(src, "doc_id long, text string").awaitTermination(120)

    runs = spark.read.option("basePath", inc.runs_dir).parquet(
        os.path.join(inc.runs_dir, "run=*")
    )
    ptype = dict((f.name, f.dataType.simpleString()) for f in runs.schema.fields)
    assert ptype["positions"] == "binary"

    idx = str(tmp_path / "idx")
    inc.compact(idx, n_buckets=1)
    si = SearchIndex(spark, idx)
    pos = {
        r["doc_id"]: list(r["positions"])
        for r in si.postings_positions("alpha").collect()
    }
    assert pos == {1: [0, 2]}
    pos_b = {
        r["doc_id"]: list(r["positions"])
        for r in si.postings_positions("beta").collect()
    }
    assert pos_b == {1: [1], 2: [0]}


def test_lsh_store_fingerprint_changes_on_rewrite(tmp_path):
    from gloomy_spark.entry_queries import _emb_fingerprint

    emb = tmp_path / "embeddings.parquet"
    emb.mkdir()
    f = emb / "part-0.parquet"
    f.write_bytes(b"AAAA")
    fp1 = _emb_fingerprint(str(tmp_path))
    assert fp1 == _emb_fingerprint(str(tmp_path))  # stable
    os.utime(f, ns=(1, 1))  # same bytes, regenerated file → new mtime
    assert _emb_fingerprint(str(tmp_path)) != fp1
    f.write_bytes(b"AAAABBBB")
    assert _emb_fingerprint(str(tmp_path)) not in (fp1,)


@pytest.mark.spark
def test_verify_unique_doc_ids(spark, tmp_path):
    from gloomy_spark.build import IndexBuilder

    cfg = EngineConfig(shuffle_partitions=2, doc_bucket_width=64)
    dup = spark.createDataFrame(
        [(7, "one two"), (7, "three four"), (9, "five")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="doc_id collision"):
        IndexBuilder(spark, cfg).build(
            dup, str(tmp_path / "idx_dup"), n_buckets=1,
            resume=False, verify_unique_doc_ids=True,
        )
    ok = spark.createDataFrame(
        [(7, "one two"), (8, "three four")], "doc_id long, text string"
    )
    m = IndexBuilder(spark, cfg).build(
        ok, str(tmp_path / "idx_ok"), n_buckets=1,
        resume=False, verify_unique_doc_ids=True,
    )
    assert m.n_docs == 2
