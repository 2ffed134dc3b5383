"""Vertical-format corpus source (reference S3).

The reference's primary input is the "vertical" corpus format parsed by
the external vertigo library (builder.go:219-232): one token per line,
tab-separated positional attributes, SGML-ish structure tags like
``<doc file="x" n="1">`` opening a document and ``</doc>`` closing it.
Structure boundaries reset the n-gram window (builder.go:142-144), and
structure attributes become per-n-gram metadata (builder.go:131-139).

This implementation parses whole vertical files (optionally .gz) into
documents: (doc_id, text, <struct attrs...>). Tokens inside one structure
are space-joined; every NON-doc structure tag (<s>, <p>, …, opening or
closing) injects a stop-character boundary marker into the token stream,
so the engine tokenizer reproduces the reference's window reset
(builder.go:142-144 ProcToken(nil)): unigram stream and doclen are
unchanged (the marker is a split character and vanishes), but n-gram
windows never cross the structure boundary.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OPEN_RE = re.compile(r"<(\w+)((?:\s+\w+=\"[^\"]*\")*)\s*/?>")
_ATTR_RE = re.compile(r"(\w+)=\"([^\"]*)\"")


def parse_vertical(
    body: str, doc_tag: str = "doc", boundary_marker: str = "."
) -> list[dict]:
    """Pure-Python vertical parser (pinned semantics, reused in tests).

    `boundary_marker` is injected between token runs at every non-doc
    structure tag; it must be one of the engine's stop characters
    (default '.'), which makes the tokenizer reset the n-gram window at
    the boundary exactly like the reference's ProcToken(nil)
    (builder.go:142-144) while leaving the unigram stream unchanged."""
    docs: list[dict] = []
    cur_tokens: list[str] = []
    cur_attrs: dict[str, str] = {}
    in_doc = False

    def mark_boundary() -> None:
        if cur_tokens and cur_tokens[-1] != boundary_marker:
            cur_tokens.append(boundary_marker)

    def finish_doc() -> dict:
        toks = cur_tokens[:-1] if cur_tokens and cur_tokens[-1] == boundary_marker else cur_tokens
        return {"attrs": dict(cur_attrs), "text": " ".join(toks)}

    for line in body.splitlines():
        line = line.rstrip("\n")
        if not line:
            continue
        if line.startswith("</"):
            tag = line[2:].rstrip(">").strip()
            if tag == doc_tag and in_doc:
                docs.append(finish_doc())
                cur_tokens, cur_attrs, in_doc = [], {}, False
            else:
                mark_boundary()
            continue
        if line.startswith("<"):
            m = _OPEN_RE.match(line)
            if m and m.group(1) == doc_tag:
                if in_doc and cur_tokens:
                    docs.append(finish_doc())
                cur_attrs = dict(_ATTR_RE.findall(m.group(2) or ""))
                cur_tokens = []
                in_doc = True
            else:
                # non-doc structure (<s>, <p>, …): n-gram window boundary
                mark_boundary()
            continue
        # token line: first tab-separated column is the word form
        cur_tokens.append(line.split("\t", 1)[0])
    if in_doc and cur_tokens:
        docs.append(finish_doc())
    return docs


def read_vertical_docs(
    spark: SparkSession,
    path: str,
    doc_tag: str = "doc",
    attrs: list[str] | None = None,
    charset: str = "utf-8",
) -> DataFrame:
    """Vertical files → (doc_id, text, <attr columns>).

    UTF-8 input (plain, .gz or .bz2 — Hadoop decompresses by extension,
    files/util.go:43-54 parity) goes through a SPLITTABLE reader: the text
    source with lineSep=``</doc>`` makes each record one document chunk,
    so a single multi-GB plain ``.vert`` file parallelizes across tasks at
    exact document boundaries (and bz2, being a splittable codec, does
    too; gzip stays one-task-per-file — the codec's constraint, same as
    the reference). Non-UTF8 input falls back to whole-file binary decode
    (gz/bz2 by extension), matching the plaintext reader.

    doc_ids are CONTENT-stable: xxhash64(path, doc-content-hash,
    occurrence) — re-reading at any parallelism yields the identical
    (doc_id, text) set (see sources/text.py for the occurrence-window
    rationale). Assumes no other structure tag name has ``doc_tag`` as a
    prefix ending in '>' (true for SGML-ish verticals: ``</docs>`` does
    not contain ``</doc>`` as a substring)."""
    attrs = attrs or []
    if charset.lower() in ("utf-8", "utf8"):
        return _read_vertical_chunked(spark, path, doc_tag, attrs)
    return _read_vertical_wholefile(spark, path, doc_tag, attrs, charset)


def _read_vertical_chunked(
    spark: SparkSession, path: str, doc_tag: str, attrs: list[str]
) -> DataFrame:
    from ..session import ship_package

    ship_package(spark)
    close = f"</{doc_tag}>"
    chunks = spark.read.option("lineSep", close).text(path).select(
        F.input_file_name().alias("path"), F.col("value").alias("chunk")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for p, chunk in zip(pdf["path"], pdf["chunk"]):
                # re-append the close tag the delimiter consumed; a chunk
                # holds at most one <doc> (text between two </doc>s)
                for d in parse_vertical(chunk + "\n" + close, doc_tag):
                    ident = "\x1f".join(
                        [d["text"]]
                        + [f"{k}\x1e{v}" for k, v in sorted(d["attrs"].items())]
                    )
                    key = hashlib.md5(ident.encode()).hexdigest()
                    rows.append(
                        (p, key, d["text"], *[d["attrs"].get(a) for a in attrs])
                    )
            cols = ["path", "key", "text", *attrs]
            yield pd.DataFrame(rows, columns=cols)

    schema = "path string, key string, text string" + "".join(
        f", {a} string" for a in attrs
    )
    parsed = chunks.mapInPandas(run, schema)
    from pyspark.sql import Window

    w = Window.partitionBy("path", "key").orderBy(F.monotonically_increasing_id())
    return parsed.select(
        F.xxhash64("path", "key", F.row_number().over(w)).alias("doc_id"),
        "text",
        *attrs,
    )


def _read_vertical_wholefile(
    spark: SparkSession, path: str, doc_tag: str, attrs: list[str], charset: str
) -> DataFrame:
    from ..session import ship_package

    ship_package(spark)
    bf = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                body = bytes(r["content"])
                if r["path"].endswith(".gz"):
                    import gzip

                    body = gzip.decompress(body)
                elif r["path"].endswith(".bz2"):
                    import bz2

                    body = bz2.decompress(body)
                for i, d in enumerate(parse_vertical(body.decode(charset), doc_tag)):
                    rows.append(
                        (r["path"], i, d["text"], *[d["attrs"].get(a) for a in attrs])
                    )
            cols = ["path", "seq", "text", *attrs]
            yield pd.DataFrame(rows, columns=cols)

    schema = "path string, seq long, text string" + "".join(
        f", {a} string" for a in attrs
    )
    parsed = bf.mapInPandas(run, schema)
    # 64-bit (path, seq) hash — see sources/text.py doc_id rationale
    return parsed.select(
        F.xxhash64("path", "seq").alias("doc_id"),
        "text",
        *attrs,
    )
