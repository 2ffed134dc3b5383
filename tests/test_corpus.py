import numpy as np
import pytest

from gloomy_spark.corpus import (
    build_vocab,
    extract_text,
    generate_pages_batch,
    pages_df,
)


def test_vocab_deterministic_and_sized():
    v1, v2 = build_vocab(), build_vocab()
    assert v1 == v2
    assert len(v1) == 10_000
    assert v1[0] == "the"


def test_batch_deterministic_and_partition_independent():
    a = generate_pages_batch(np.arange(0, 50))
    b = generate_pages_batch(np.arange(0, 50))
    assert a.equals(b)
    # splitting the id range differently must not change any row
    c1 = generate_pages_batch(np.arange(0, 20))
    c2 = generate_pages_batch(np.arange(20, 50))
    import pandas as pd

    c = pd.concat([c1, c2], ignore_index=True)
    assert a.equals(c)


def test_extraction_byte_identical():
    pdf = generate_pages_batch(np.arange(0, 300))
    boiler_seen = 0
    for _, row in pdf.iterrows():
        assert extract_text(row.html) == row.text, row.url
        if b"<nav>" in row.html:
            boiler_seen += 1
            assert "sitemap" not in row.text  # boilerplate dropped
    assert boiler_seen > 10  # ~10% of pages carry boilerplate


def test_lang_mix_and_urls():
    pdf = generate_pages_batch(np.arange(0, 2000))
    frac_en = (pdf.lang == "en").mean()
    assert 0.85 < frac_en < 0.95
    assert pdf.url.is_unique
    assert pdf.url.str.match(r"https://example-\d{4}\.test/page/\d{6}").all()


def test_head_term_skew_present():
    # "the" (vocab rank 1, Zipf s=1.07) must hit most docs → skew driver
    pdf = generate_pages_batch(np.arange(0, 500))
    hit = pdf.text.str.lower().str.contains(r"\bthe\b").mean()
    assert hit > 0.8


@pytest.mark.spark
def test_pages_df_matches_local_batch(spark):
    df = pages_df(spark, 40, partitions=7)
    rows = {r.doc_id: r for r in df.collect()}
    local = generate_pages_batch(np.arange(0, 40))
    assert len(rows) == 40
    for _, lr in local.iterrows():
        r = rows[lr.doc_id]
        assert r.url == lr.url
        assert bytes(r.html) == lr.html
        assert r.text == lr.text
        assert r.lang == lr.lang
