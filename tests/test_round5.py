"""Round-5 closures: kwic/collocations tokenize-once plan pin (r4 verdict
wrong #1), positions guard on the postings_positions family (ADVICE),
facet-attr validation + identifier quoting in the IN-expression builders
(ADVICE medium), micro-batcher max_batch as a real size cap + per-caller
error wrapping (ADVICE), and the term_attr_counts broadcast size guard
(r4 verdict next #6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gloomy_spark.config import EngineConfig


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(block_size=64, doc_bucket_width=64, shuffle_partitions=8)
    idx = str(tmp_path_factory.mktemp("r5idx") / "idx")
    docs = pages_df(spark, 120, partitions=4).select("doc_id", "text", "url", "lang")
    IndexBuilder(spark, cfg).build(
        docs, idx, n_buckets=2, url_col="url", lang_col="lang"
    )
    return SearchIndex(spark, idx).cache()


@pytest.fixture(scope="module")
def docs120(spark):
    from gloomy_spark.corpus import pages_df

    return pages_df(spark, 120, partitions=4).select("doc_id", "text")


# --------------------------------------------------- tokenize-once plan pin --


@pytest.mark.spark
def test_kwic_tokenizes_below_explode(small_index, docs120):
    """Generate re-evaluates sibling projection expressions once per
    emitted element, so tokens_col in the SAME projection as
    explode(positions) re-tokenizes a doc tf times (r4 verdict wrong #1).
    Pin the optimized plan: split(lower(text)) must sit in the Project
    BELOW the Generate node (plans print top-down, parent first)."""
    plan = (
        small_index.kwic("a", docs120, width=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    gen = plan.index("Generate explode(positions")
    assert "split(lower" not in plan[:gen], (
        "tokenization re-collapsed ABOVE the explode — per-hit re-tokenization"
    )
    assert "split(lower" in plan[gen:], "tokenization missing below the Generate"


@pytest.mark.spark
def test_collocations_tokenize_below_explode(small_index, docs120):
    plan = (
        small_index.collocations("a", docs120, window=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    gen = plan.index("Generate explode(positions")
    assert "split(lower" not in plan[:gen]
    assert "split(lower" in plan[gen:]


@pytest.mark.spark
def test_kwic_rows_unchanged_by_plan_fix(small_index, docs120):
    """The two-stage select is a pure plan change: every occurrence of a
    head term still yields one row, pos-consistent with tf."""
    got = small_index.kwic("a", docs120, width=2).count()
    cf = int(small_index.search_exact("a").collect()[0]["cf"])
    assert got == cf > 0


# --------------------------------------------------------- positions guard --


@pytest.mark.spark
def test_positions_family_guard_without_positions(spark, tmp_path, docs120):
    """kwic / collocations / postings_positions on an index built with
    store_positions=False must fail with the clear ValueError, not a
    missing-column AnalysisException (ADVICE low)."""
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(
        block_size=64, doc_bucket_width=64, shuffle_partitions=8,
        store_positions=False,
    )
    idx = str(tmp_path / "nopos")
    docs = pages_df(spark, 40, partitions=2).select("doc_id", "text", "url")
    IndexBuilder(spark, cfg).build(docs, idx, n_buckets=1, url_col="url")
    si = SearchIndex(spark, idx)
    for call in (
        lambda: si.postings_positions("a"),
        lambda: si.kwic("a", docs120),
        lambda: si.collocations("a", docs120),
    ):
        with pytest.raises(ValueError, match="store_positions=True"):
            call()


# ------------------------------------------------- identifier safety (ADVICE) --


@pytest.mark.spark
def test_bm25_filtered_rejects_unknown_attr(small_index):
    """/bm25?filter= forwards a caller-supplied attr name; anything not a
    docs-dimension column must be rejected before expression building."""
    hostile = "lang) IN ('x')) OR true --"
    with pytest.raises(KeyError, match="unknown facet attribute"):
        small_index.bm25_topk_filtered("a", 5, hostile, ["en"])


@pytest.mark.spark
def test_in_strings_identifier_backtick_quoted(spark):
    """The >64-value path parses an SQL expression; the identifier must be
    backtick-quoted so a crafted column name cannot splice expressions.
    A hostile name therefore resolves (and fails) as a COLUMN LOOKUP."""
    from pyspark.errors import AnalysisException

    from gloomy_spark.query.engine import _in_longs, _in_strings

    df = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    many = [f"v{i}" for i in range(70)]
    hostile = "lang) IN ('x')) OR (true"  # would parse if spliced raw
    with pytest.raises(AnalysisException):
        df.where(_in_strings(hostile, many)).collect()
    with pytest.raises(AnalysisException):
        df.where(_in_longs(hostile, list(range(70)))).collect()
    # and the legit >64-value path still works on a real column
    got = df.where(_in_strings("lang", many + ["en"])).count()
    assert got == 3
    assert df.where(_in_longs("doc_id", list(range(100, 200)))).count() == 0


# ------------------------------------------------------- micro-batcher caps --


@pytest.mark.spark
def test_microbatch_max_batch_is_a_size_cap(small_index):
    """A burst larger than max_batch must split into ceil(n/max_batch)
    batches (ADVICE low: the drain previously took the whole queue)."""
    import threading

    from gloomy_spark.query.microbatch import Bm25MicroBatcher

    si = small_index
    mb = Bm25MicroBatcher(si, window_ms=200, max_batch=4)
    sizes = []
    real = si.bm25_topk_batch

    def spy(queries, k):
        sizes.append(len(queries))
        return real(queries, k)

    si.bm25_topk_batch = spy
    results: dict[int, list] = {}
    try:
        # distinct queries so dedup can't shrink the batch under the cap
        qs = [f"data merge q{i}" for i in range(10)]
        barrier = threading.Barrier(10)

        def client(i):
            barrier.wait()
            results[i] = mb.query(qs[i], 3)

        ts = [threading.Thread(target=client, args=(i,)) for i in range(10)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        si.bm25_topk_batch = real
        mb.close()
    assert len(results) == 10
    assert max(sizes) <= 4, f"oversized batch ran: {sizes}"
    assert mb.batches_run >= 3


@pytest.mark.spark
def test_microbatch_error_wrapped_per_caller(small_index):
    """Each waiting caller re-raises its OWN wrapper (chained to the
    shared batch error), not the single shared exception object."""
    import threading

    from gloomy_spark.query.microbatch import Bm25MicroBatcher

    si = small_index
    mb = Bm25MicroBatcher(si, window_ms=100)
    real = si.bm25_topk_batch
    boom = ValueError("injected shared failure")

    def flaky(queries, k):
        raise boom

    si.bm25_topk_batch = flaky
    errs: dict[int, BaseException] = {}
    try:
        barrier = threading.Barrier(4)

        def client(i):
            barrier.wait()
            try:
                mb.query(f"data q{i}", 3)
            except BaseException as ex:  # noqa: BLE001
                errs[i] = ex

        ts = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        si.bm25_topk_batch = real
        mb.close()
    assert len(errs) == 4
    assert len({id(e) for e in errs.values()}) == 4, "shared exception object"
    for e in errs.values():
        assert isinstance(e, RuntimeError) and e.__cause__ is boom


# ------------------------------------------- term_attr_counts broadcast guard --


@pytest.mark.spark
def test_term_attr_counts_shuffle_fallback(small_index, monkeypatch, tmp_path):
    """Without a rollup, a page whose terms' summed df exceeds the guard
    must NOT broadcast the postings side; results are identical on both
    paths (r4 verdict next #6)."""
    si = small_index
    import gloomy_spark.query.engine as eng

    # force the no-rollup path by pointing the rollup probe at nothing
    monkeypatch.setattr(si.store, "attr_rollup_path", str(tmp_path / "no_rollup"))

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    base = si.term_attr_counts(["a", "data"], ["lang"])
    assert "ResolvedHint" in base._jdf.queryExecution().analyzed().toString()
    want = canon(base)

    monkeypatch.setattr(eng.SearchIndex, "_ATTR_COUNT_BROADCAST_MAX_DF", 0)
    guarded = si.term_attr_counts(["a", "data"], ["lang"])
    plan = guarded._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan, "head-term page still broadcast"
    assert canon(guarded) == want
    assert len(want) > 0


# ------------------------------------------------ facet-aware block-max --


@pytest.mark.spark
def test_bm25_filtered_sweep_differential(small_index):
    """The facet-aware block-max sweep must be rank-identical to the
    exhaustive filtered pass (block bounds stay valid upper bounds under
    the allow-mask) across facet selectivities, including a facet that
    matches everything and one that matches nothing."""
    si = small_index
    langs = [r["lang"] for r in si.docs.select("lang").distinct().collect()]
    cases = [
        ("a the data", 10, "lang", langs),        # everything allowed
        ("a the data", 10, "lang", langs[:1]),    # one language
        ("merge join scan", 5, "lang", langs[1:2] if len(langs) > 1 else langs),
        ("a", 3, "lang", ["zz_absent"]),          # nothing allowed
    ]
    for q, k, attr, vals in cases:
        def canon(df):
            return [
                (r["doc_id"], round(r["score"], 9)) for r in df.collect()
            ]
        exhaustive = canon(si.bm25_topk_filtered(q, k, attr, vals, use_blockmax=False))
        sweep = canon(si.bm25_topk_filtered(q, k, attr, vals, use_blockmax=True))
        auto = canon(si.bm25_topk_filtered(q, k, attr, vals))
        assert sweep == exhaustive, (q, vals)
        assert auto == exhaustive, (q, vals)


@pytest.mark.spark
def test_bm25_filtered_matches_unfiltered_on_full_facet(small_index):
    """With every doc allowed, both filtered paths must equal plain
    bm25_topk scores exactly (corpus-wide stats contract)."""
    si = small_index
    langs = [r["lang"] for r in si.docs.select("lang").distinct().collect()]
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in si.bm25_topk("scan filter window the", 10).collect()
    ]
    for bm in (False, True):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in si.bm25_topk_filtered(
                "scan filter window the", 10, "lang", langs, use_blockmax=bm
            ).collect()
        ]
        assert got == want, bm


# ----------------------------------------------------- batch serving view --


@pytest.fixture(scope="module")
def view_index(spark, tmp_path_factory):
    """Index with MORE doc buckets than cores so the batch scorer's
    query-group salting stays off (Q == 1) and the serving view engages
    — the regime of real corpora (buckets >> executors)."""
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    cfg = EngineConfig(block_size=64, doc_bucket_width=16, shuffle_partitions=8)
    idx = str(tmp_path_factory.mktemp("r5vidx") / "idx")
    docs = pages_df(spark, 150, partitions=4).select("doc_id", "text", "url")
    IndexBuilder(spark, cfg).build(docs, idx, n_buckets=2, url_col="url")
    return SearchIndex(spark, idx).cache()


@pytest.mark.spark
def test_batch_serving_view_rank_identical(view_index, monkeypatch):
    """bm25_topk_batch through the persisted pre-partitioned view must be
    rank-identical to the scan+shuffle path for every query."""
    si = view_index
    qs = ["the data merge", "scan filter", "a", "zzz_absent",
          "merge group table", "a the"]

    def canon(df):
        return sorted(
            (int(r["query_id"]), int(r["doc_id"]), round(float(r["score"]), 9))
            for r in df.collect()
        )

    monkeypatch.setenv("GLOOMY_SERVING_VIEW", "0")
    off = canon(si.bm25_topk_batch(qs, 10))
    monkeypatch.setenv("GLOOMY_SERVING_VIEW", "1")
    on = canon(si.bm25_topk_batch(qs, 10))
    assert on == off and len(on) > 0


@pytest.mark.spark
def test_batch_serving_view_no_exchange(view_index, monkeypatch):
    """The per-batch plan through the view must have NO exchange between
    the cached scan and the grouped scorer — that shuffle (plus the
    parquet scan below it) is the fixed per-batch cost the view removes.
    A constant qgrp column would silently re-insert it (constant-folded
    out of the cached partitioning), hence the 2-column layout pin."""
    monkeypatch.setenv("GLOOMY_SERVING_VIEW", "1")
    df = view_index.bm25_topk_batch(["the data", "a merge"], 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    s = plan.find("FlatMapGroupsInPandas")
    e = plan.find("InMemoryRelation", s)
    assert s != -1 and e != -1
    assert plan[s:e].count("Exchange ") == 0, plan[s:e]


@pytest.mark.spark
def test_view_salts_collision_free(view_index):
    """The 2-column murmur3 replica must place every doc_bucket in a
    distinct partition (that is the whole point of the perfect layout)."""
    from gloomy_spark.query.engine import _spark_hash_bs

    salts = view_index._view_salts()
    assert salts is not None
    g, rows = salts
    slots = [_spark_hash_bs(b, s) % g for b, s in rows]
    assert len(set(slots)) == len(rows) == g


@pytest.mark.spark
def test_spark_hash_bs_parity(spark):
    """Driver murmur3 replica == F.hash(bigint, int) for the 2-column
    serving-view layout, across sign/width edges."""
    from gloomy_spark.query.engine import _spark_hash_bs

    cases = [(0, 0), (1, 7), (-1, 3), (2**40, 63), (-(2**40), 1),
             (2**62, 5), (17, 0), (123456789, 42)]
    df = spark.createDataFrame(cases, "b long, s int").select(
        F.hash(F.col("b"), F.col("s")).alias("h")
    )
    got = [int(r["h"]) for r in df.collect()]
    want = [_spark_hash_bs(b, s) for b, s in cases]
    assert got == want
