"""Sharded-corpus path: with many input files, extraction needs NO fan-out
shim and matches the single-file path byte-exactly.

README/NOTES claim "a real sharded corpus reads in parallel natively —
remove the repartition"; this test evidences it: the documents table split
into 8 parquet shards, read with plain read_parquet (no repartition), runs
the full extraction with ≥8 input blocks and produces the identical
(url, extracted_text, status) rows as the single-file path.
"""

from __future__ import annotations

import pyarrow.parquet as pq


def test_sharded_read_extracts_identically_without_fanout(sf_dir, tmp_path):
    import ray.data as rd

    from pdf_extractor_ray import corpus
    from pdf_extractor_ray.pipelines.extract import extract_pages

    # shard the documents table into 8 files (round-robin slices)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    n_shards = 8
    for i in range(n_shards):
        pq.write_table(t.slice(i * len(t) // n_shards, (i + 1) * len(t) // n_shards - i * len(t) // n_shards), shard_dir / f"part-{i:02d}.parquet")

    docs = rd.read_parquet(str(shard_dir))  # NO repartition — native file parallelism
    # one read task per shard minimum (num_blocks needs a materialized view)
    assert docs.materialize().num_blocks() >= n_shards
    pages = corpus.pages_from_documents(docs)
    sharded = (
        extract_pages(pages)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "extracted_text", "status"]]
    )

    single = (
        extract_pages(corpus.read_pages(sf_dir, fanout_blocks=16))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "extracted_text", "status"]]
    )
    assert sharded.equals(single)  # byte-identical, partitioning-independent
