"""Golden + parity tests for the pinned tokenization semantics.

Golden values are ported from the reference's test expectations
(tokenizer/simple_test.go:26-35 loremipsum token list; window semantics
ngram.go:48-55; stop/ignore semantics builder.go:117-145). Values inlined,
no reference files copied.
"""

from __future__ import annotations

import random

import pytest

from gloomy_spark.config import EngineConfig
from gloomy_spark.textnorm import ngrams, segments, tokenize

# The reference's own fixture text (public-domain lorem ipsum filler with a
# mid-line ':' and '...' exercising stop chars), inlined.
LOREM = (
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do eiusmod\n"
    "tempor incididunt ut labore et dolore magna:aliqua. Ut enim ad minim\n"
    "veniam, quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea\n"
    "commodo consequat... Duis aute irure dolor in reprehenderit in voluptate\n"
    "velit esse cillum dolore eu fugiat nulla pariatur? Excepteur sint occaecat\n"
    "cupidatat non proident, sunt in culpa qui officia; deserunt mollit anim id\n"
    "est laborum."
)

# 69 expected lowercase tokens (simple_test.go:26-35, lowercased per
# importString semantics simple.go:84-90)
LOREM_TOKENS = [t.lower() for t in [
    "Lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
    "et", "dolore", "magna", "aliqua", "Ut", "enim", "ad", "minim", "veniam",
    "quis", "nostrud", "exercitation", "ullamco", "laboris", "nisi", "ut",
    "aliquip", "ex", "ea", "commodo", "consequat", "Duis", "aute", "irure",
    "dolor", "in", "reprehenderit", "in", "voluptate", "velit", "esse",
    "cillum", "dolore", "eu", "fugiat", "nulla", "pariatur", "Excepteur",
    "sint", "occaecat", "cupidatat", "non", "proident", "sunt", "in", "culpa",
    "qui", "officia", "deserunt", "mollit", "anim", "id", "est", "laborum",
]]


def test_lorem_golden_tokens():
    assert tokenize(LOREM) == LOREM_TOKENS


def test_diacritics_lowercase():
    # charset golden (simple_test.go:83-95); input already utf-8 here
    assert tokenize("Žluťoučký kůň úpěl ďábelské ódy") == [
        "žluťoučký", "kůň", "úpěl", "ďábelské", "ódy"
    ]


def test_empty_input():
    assert tokenize("") == []
    assert segments("") == []
    assert ngrams("", 2) == []


def test_stop_string_resets_window():
    # ':' is a stop string → no bigram spans it (builder.go:120-122)
    text = "magna:aliqua ut"
    assert tokenize(text) == ["magna", "aliqua", "ut"]
    assert ngrams(text, 2) == ["aliqua ut"]


def test_ignore_string_window_continues():
    # '"' is an ignore string: dropped, window NOT reset (builder.go:124)
    cfg = EngineConfig()
    text = 'alpha " beta'
    assert tokenize(text, cfg) == ["alpha", "beta"]
    assert ngrams(text, 2, cfg) == ["alpha beta"]


def test_incomplete_windows_suppressed():
    # segment shorter than n yields nothing (ngram.go:48-55)
    assert ngrams("one. two three. four", 2) == ["two three"]
    assert ngrams("one two. three", 3) == []


def test_trigrams_within_segments():
    text = "a b c d. e f g"
    assert ngrams(text, 3) == ["a b c", "b c d", "e f g"]


def _random_text(rng: random.Random) -> str:
    vocab = ["lorem", "ipsum", "Alpha", "beta", "GAMMA", "kůň", '"', "x1",
             "the", "of"]
    punct = [" ", " ", ", ", ". ", "; ", "? ", "! ", ": ", "\n", "...", '" ']
    parts = []
    for _ in range(rng.randint(0, 60)):
        parts.append(rng.choice(vocab))
        parts.append(rng.choice(punct))
    return "".join(parts)


@pytest.mark.spark
def test_spark_exprs_match_pure_python(spark):
    from pyspark.sql import functions as F
    from gloomy_spark.functions.text import ngrams_col, tokens_col, segments_col

    rng = random.Random(42)
    texts = [LOREM, "", "magna:aliqua ut", 'alpha " beta'] + [
        _random_text(rng) for _ in range(60)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = (
        df.select(
            "id",
            tokens_col(F.col("text")).alias("toks"),
            segments_col(F.col("text")).alias("segs"),
            ngrams_col(F.col("text"), 2).alias("bi"),
            ngrams_col(F.col("text"), 3).alias("tri"),
        )
        .orderBy("id")
        .collect()
    )
    for row, text in zip(out, texts):
        assert row.toks == tokenize(text), text
        assert row.segs == segments(text), text
        assert row.bi == ngrams(text, 2), text
        assert row.tri == ngrams(text, 3), text
