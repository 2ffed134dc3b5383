"""Pinned text-normalization / tokenization / n-gram semantics.

This module is the single source of truth for what a "token" and an
"n-gram" are. Three other implementations mirror it exactly and are tested
against it:

- ``gloomy_spark.functions.text`` — the same semantics as Spark Column
  expressions (JVM-side, whole-stage-codegen friendly);
- the DuckDB oracle SQL in ``__spark_entry__.oracle_sql``;
- the pure-Python BM25 oracle in ``gloomy_spark.oracle``.

Reference semantics being reproduced (behavior, not code):
- tokens are produced by splitting on the class ``[,.\\s;?!:]+`` and
  lowercasing (reference tokenizer regex, simple.go:98, importString
  simple.go:84-90); empty strings are dropped;
- *stop strings* kill the current n-gram window — an n-gram never spans a
  stop boundary (builder.go:120-122). With text input the stop strings
  ('.' and ':') are split characters, so we model them as **segment
  delimiters**: the text is first split on stop characters, and n-gram
  windows live entirely inside one segment;
- *ignore strings* are dropped from the stream but the window continues
  across them (builder.go:124);
- only complete windows are emitted — no partial n-grams at segment starts
  (ngram.go:48-55 IsValid).
"""

from __future__ import annotations

import re

from .config import EngineConfig, DEFAULT_CONFIG

# The reference tokenizer's split class (simple.go:98). Written without
# needless escapes so the *same literal string* is valid in Python re, Java
# regex (Spark) and RE2 (DuckDB).
FULL_SPLIT_PATTERN = r"[,.\s;?!:]+"

# Split class with the stop characters ('.' ':') removed — used to tokenize
# *within* a stop-delimited segment.
def non_stop_split_pattern(cfg: EngineConfig = DEFAULT_CONFIG) -> str:
    cls = ",.\\s;?!:"
    for s in cfg.stop_strings:
        if len(s) == 1:
            cls = cls.replace(s, "")
    return f"[{cls}]+"


def stop_char_class(cfg: EngineConfig = DEFAULT_CONFIG) -> str:
    chars = "".join(s for s in cfg.stop_strings if len(s) == 1)
    return f"[{re.escape(chars)}]"


_FULL_RE = re.compile(FULL_SPLIT_PATTERN)


def tokenize(text: str, cfg: EngineConfig = DEFAULT_CONFIG) -> list[str]:
    """Unigram token stream: lowercase, split on the full class, drop empty
    tokens and ignore-strings. Document length for BM25 = len(tokenize(t))."""
    toks = _FULL_RE.split(text.lower())
    ignore = set(cfg.ignore_strings)
    return [t for t in toks if t and t not in ignore]


def segments(text: str, cfg: EngineConfig = DEFAULT_CONFIG) -> list[list[str]]:
    """Token lists per stop-delimited segment. N-gram windows never cross
    segment boundaries (stop-string window-reset semantics)."""
    seg_re = re.compile(stop_char_class(cfg))
    tok_re = re.compile(non_stop_split_pattern(cfg))
    ignore = set(cfg.ignore_strings)
    # multi-char stop strings (none in the default config) reset at token level
    multi_stop = {s for s in cfg.stop_strings if len(s) > 1}
    out: list[list[str]] = []
    for seg in seg_re.split(text.lower()):
        toks = [t for t in tok_re.split(seg) if t and t not in ignore]
        if multi_stop:
            cur: list[str] = []
            for t in toks:
                if t in multi_stop:
                    out.append(cur)
                    cur = []
                else:
                    cur.append(t)
            out.append(cur)
        else:
            out.append(toks)
    return [s for s in out if s]


def ngrams(text: str, n: int, cfg: EngineConfig = DEFAULT_CONFIG) -> list[str]:
    """Complete n-token windows within segments, joined by a single space
    (the reference renders n-grams space-joined; ngram.go Stringer)."""
    if n == 1:
        return tokenize(text, cfg)
    out: list[str] = []
    for seg in segments(text, cfg):
        for i in range(len(seg) - n + 1):
            out.append(" ".join(seg[i : i + n]))
    return out


def tokenize_with_positions(
    text: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> list[tuple[int, str]]:
    """(position, token) pairs; positions are 0-based over the unigram
    stream (used for positional postings)."""
    return list(enumerate(tokenize(text, cfg)))
