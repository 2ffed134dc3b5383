"""Tokenization / n-gram formation as Spark Column expressions.

Everything here is built-in `pyspark.sql.functions` — no Python UDFs — so
tokenization stays inside whole-stage codegen on the JVM and scales to
100 TB without Python-worker round trips. Semantics are pinned by
``gloomy_spark.textnorm`` (tested equal on golden fixtures and
property-style random inputs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import EngineConfig, DEFAULT_CONFIG
from ..textnorm import FULL_SPLIT_PATTERN, non_stop_split_pattern, stop_char_class


def _drop_noise(arr: Column, cfg: EngineConfig) -> Column:
    ignore = F.array(*[F.lit(s) for s in cfg.ignore_strings])
    return F.filter(arr, lambda t: (t != F.lit("")) & ~F.array_contains(ignore, t))


def tokens_col(text: Column, cfg: EngineConfig = DEFAULT_CONFIG) -> Column:
    """array<string> of unigram tokens (lowercase, split, noise dropped)."""
    return _drop_noise(F.split(F.lower(text), FULL_SPLIT_PATTERN), cfg)


def doclen_col(text: Column, cfg: EngineConfig = DEFAULT_CONFIG) -> Column:
    return F.size(tokens_col(text, cfg))


def segments_col(text: Column, cfg: EngineConfig = DEFAULT_CONFIG) -> Column:
    """array<array<string>>: token lists per stop-delimited segment (empty
    segments removed). N-gram windows never cross segments."""
    segs = F.split(F.lower(text), stop_char_class(cfg))
    tok = non_stop_split_pattern(cfg)
    per_seg = F.transform(segs, lambda s: _drop_noise(F.split(s, tok), cfg))
    return F.filter(per_seg, lambda a: F.size(a) > 0)


def ngrams_col(text: Column, n: int, cfg: EngineConfig = DEFAULT_CONFIG) -> Column:
    """array<string> of complete n-token windows (space-joined), windows
    confined to segments (stop-string reset semantics)."""
    if n == 1:
        return tokens_col(text, cfg)

    empty = F.array().cast("array<string>")

    def seg_ngrams(seg: Column) -> Column:
        # windows i = 1 .. size-n+1 (1-based element_at). sequence(1, k)
        # DESCENDS when k < 1, so short segments must short-circuit to [].
        windows = F.transform(
            F.sequence(F.lit(1), F.size(seg) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(seg, (i + j).cast("int")) for j in range(n)]
            ),
        )
        return F.when(F.size(seg) >= n, windows).otherwise(empty)

    return F.flatten(F.transform(segments_col(text, cfg), seg_ngrams))
