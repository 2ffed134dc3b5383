"""Engine configuration.

Mirrors the reference's build config surface
(/root/reference/conf-sample.json, /root/reference/index/gconf/gconf.go:64-92)
plus the new BM25/segment knobs mandated by BASELINE.json's north rule.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class EngineConfig:
    # n-gram formation (reference: gconf.go:73, index.go:30-34 MaxNgramSize=10)
    ngram_sizes: tuple[int, ...] = (1, 2, 3)
    max_ngram_size: int = 10
    # HAVING count >= min_ngram_freq (reference: conf-sample.json:11,
    # builder.go:199)
    min_ngram_freq: int = 4
    # stop strings RESET the n-gram window (reference: builder.go:120-122);
    # ignore strings are dropped, window continues (builder.go:124)
    stop_strings: tuple[str, ...] = (".", ":")
    ignore_strings: tuple[str, ...] = ('"', ",")
    # BM25 scoring (new capability per BASELINE.json:6)
    bm25: BM25Config = field(default_factory=BM25Config)
    # posting-segment block structure: docs per block; per-block max_score
    # powers block-max WAND skipping
    block_size: int = 128
    # terms with df/N above this ratio get salted/str striped partitioning
    salt_threshold_df: float = 0.05
    # store per-posting position lists in segments (needed for phrase
    # queries; BM25/WAND does not read them)
    store_positions: bool = True
    # fixed doc-range width for posting blocks: blocks never cross a
    # doc_bucket boundary so the query side can co-locate all query terms'
    # blocks for a doc range with a single groupBy(doc_bucket)
    doc_bucket_width: int = 1 << 20
    # SPIMI spill-chunk analog (reference: conf-sample.json:13); in Spark this
    # sizes Arrow batches / target rows per build partition
    proc_chunk_size: int = 1_000_000
    # Arrow batch rows for the INVERTER stage only (doc rows in, heavy
    # numpy per batch). Small batches pipeline JVM tokenization with
    # python inversion and keep the sort keys cache-resident; measured at
    # 300k docs / 4 cores: 1M-row batches 32 s, 30k 18-23 s, 10k 13 s,
    # 4k 10.3 s, 2k 10.4 s (knee ≈ 4k ≈ 1M tokens at avgdl 240). The
    # WRITER stage keeps proc_chunk_size-row batches — its input is
    # posting rows and its python work per batch is O(1), so there big
    # batches win (the round-2 measurement that set 1M globally).
    inverter_batch_rows: int = 4096
    # shuffle parallelism used by the build pipeline
    shuffle_partitions: int = 32
    # floor on postings per segment-writer chunk: the dictionary tiler
    # targets bucket_postings/(shuffle_partitions*4) postings per chunk,
    # which for small buckets degenerates into hundreds of near-empty
    # grouped-python tasks (~90 ms protocol overhead each, guide §2.2
    # "fewer, larger partitions"). Chunk count therefore derives from
    # data volume: at 100 TB the slot-based target is far above this
    # floor and the tiling is unchanged.
    segment_chunk_min_postings: int = 1 << 18

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, default=list)

    @staticmethod
    def from_json(s: str) -> "EngineConfig":
        d = json.loads(s)
        if "bm25" in d and isinstance(d["bm25"], dict):
            d["bm25"] = BM25Config(**d["bm25"])
        for k in ("ngram_sizes", "stop_strings", "ignore_strings"):
            if k in d:
                d[k] = tuple(d[k])
        return EngineConfig(**d)


DEFAULT_CONFIG = EngineConfig()
