"""On-disk index layout, manifest, per-bucket checkpoint ledger.

Layout (all parquet + JSON; Iceberg-ready — the same tables map 1:1 onto
Iceberg tables, but the sandbox has no Iceberg jars, so the store uses
parquet directories with explicit manifest/ledger files, which is also
what makes resume observable in tests):

    <index_dir>/
        manifest.json            corpus stats, config, build metrics
        ledger.jsonl             one line per completed build bucket (lineage)
        terms/                   (term, term_id, df, cf, idf)
        docs/                    (doc_id, url, doclen, lang)
        segments/bucket=K/       posting blocks (see build.SEGMENT_SCHEMA)

Behavioral analog of the reference's index directory
(index/index.go:462-507 Save/Load; wdict/writer.go:63-93), re-expressed as
columnar tables instead of bespoke binary files.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, asdict
from typing import Any

from .config import EngineConfig


@dataclass
class BucketRecord:
    """Per-bucket lineage + metrics (north rule: resumable builds with
    per-partition lineage and terms/sec / postings/sec / bytes metrics)."""

    bucket: int
    term_id_lo: int
    term_id_hi: int
    n_terms: int
    n_blocks: int
    n_postings: int
    bytes_payload: int
    elapsed_sec: float
    terms_per_sec: float
    postings_per_sec: float
    input_snapshot: str = ""
    finished_at: float = field(default_factory=time.time)


@dataclass
class Manifest:
    n_docs: int
    avgdl: float
    n_terms: int
    config: dict[str, Any]
    build_seconds: float = 0.0
    docs_per_sec: float = 0.0
    postings_total: int = 0
    input_snapshot: str = ""
    stages: dict[str, float] = field(default_factory=dict)

    def save(self, index_dir: str) -> None:
        with open(os.path.join(index_dir, "manifest.json"), "w") as f:
            json.dump(asdict(self), f, indent=2)

    @staticmethod
    def load(index_dir: str) -> "Manifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return Manifest(**json.load(f))


class IndexStore:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.terms_path = os.path.join(index_dir, "terms")
        self.docs_path = os.path.join(index_dir, "docs")
        self.segments_path = os.path.join(index_dir, "segments")
        self.ledger_path = os.path.join(index_dir, "ledger.jsonl")

    def ensure_dirs(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        os.makedirs(self.segments_path, exist_ok=True)

    # ------------------------------------------------------------- ledger
    def completed_buckets(self) -> dict[int, BucketRecord]:
        out: dict[int, BucketRecord] = {}
        if os.path.exists(self.ledger_path):
            with open(self.ledger_path) as f:
                for line in f:
                    if line.strip():
                        rec = BucketRecord(**json.loads(line))
                        out[rec.bucket] = rec
        return out

    def append_bucket(self, rec: BucketRecord) -> None:
        # append-only ledger: a bucket line is written only after its
        # segment files are fully committed → crash-safe resume point
        with open(self.ledger_path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")

    def bucket_dir(self, bucket: int) -> str:
        return os.path.join(self.segments_path, f"bucket={bucket}")

    # ----------------------------------------------------------- staging
    def stage_done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.index_dir, name, "_SUCCESS"))

    def manifest(self) -> Manifest:
        return Manifest.load(self.index_dir)

    def save_config(self, cfg: EngineConfig) -> None:
        with open(os.path.join(self.index_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())
