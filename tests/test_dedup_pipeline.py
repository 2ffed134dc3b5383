"""LSH+rerank pipeline vs exact all-pairs jaccard (candidate-recall aware)."""

import os

import pytest

from gloomy_spark.ops.dedup import (
    jaccard_pairs,
    lsh_jaccard_pipeline,
    minhash_lsh_pairs,
)


@pytest.mark.spark
def test_lsh_jaccard_pipeline_subset_and_exact_values(spark):
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, shingle_k=2, threshold=0.3).collect()
    }
    piped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in lsh_jaccard_pipeline(
            docs, num_hashes=24, bands=6, shingle_k=2, threshold=0.3
        ).collect()
    }
    # every piped pair is exact-correct (same jaccard value)
    for k, v in piped.items():
        assert k in exact and exact[k] == v
    # recall: LSH with 6 bands x 4 rows at j>=0.3... candidates must cover
    # the high-similarity pairs (j >= 0.8 pairs are near-certain hits)
    high = {k for k, v in exact.items() if v >= 0.8}
    assert high <= set(piped), "missed near-certain near-dups"
    # overall recall sanity
    assert len(piped) >= max(1, int(0.5 * len(exact)))
