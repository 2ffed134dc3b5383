"""Tokenization / n-gram formation as Spark Column expressions.

Everything here is built-in `pyspark.sql.functions` — no Python UDFs — so
tokenization stays inside whole-stage codegen on the JVM and scales to
100 TB without Python-worker round trips. Semantics are pinned by
``gloomy_spark.textnorm`` (tested equal on golden fixtures and
property-style random inputs).
"""

from __future__ import annotations

import re

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


_BOUNDARY = "[,.\\s;?!:]"  # full split class, for token-exact lookaround
# segment marker injected for multi-char stop words: must be OUTSIDE the
# token split class (a plain space would only split tokens, not segments)
_MARKER = "\x00"


def segments_col(text: Column, cfg: EngineConfig = DEFAULT_CONFIG) -> Column:
    """array<array<string>>: token lists per stop-delimited segment (empty
    segments removed). N-gram windows never cross segments.

    Multi-char stop strings are TOKEN-level window resets (the reference's
    isStopWord, builder.go:91-98): each occurrence bounded by split
    characters (or string edges) is rewritten to a reserved segment-marker
    char before the split, matching ``textnorm.segments`` exactly (the two
    are property-tested equal)."""
    lowered = F.lower(text)
    seg_class = stop_char_class(cfg)
    # pinned semantics (textnorm.segments): the raw stop string is compared
    # against ALREADY-LOWERCASED tokens, so a stop string containing
    # uppercase can never match — skip it (don't lowercase it into
    # matching). A stop string containing a split char can never appear as
    # one token, so it never resets either. And ignore-strings are filtered
    # BEFORE the reset check, so a stop string that is also an
    # ignore-string is dropped without resetting — skip those too.
    multi = [
        s for s in cfg.stop_strings
        if len(s) > 1
        and s == s.lower()
        and not re.search(FULL_SPLIT_PATTERN, s)
        and s not in cfg.ignore_strings
    ]
    if multi:
        for s in multi:
            pat = f"(?<=^|{_BOUNDARY}){re.escape(s)}(?=$|{_BOUNDARY})"
            lowered = F.regexp_replace(lowered, pat, _MARKER)
        seg_class = seg_class[:-1] + _MARKER + "]"
    segs = F.split(lowered, seg_class)
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
