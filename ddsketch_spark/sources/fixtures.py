"""Deterministic fixture generators (FIXTURES.md).

F1: the north-rule ``tokens`` table -- (doc_id:string, tokens:array<int32>,
n_tok:int32, source:string), Zipf token values over a 50257 vocab,
lognormal sequence lengths, zipfian-skewed sources (web ~ 37%).

F2: value-stream tables reproducing the reference harness distributions
(main.cpp:175-181) for Spark-side parity tests.

Everything is seeded numpy; generation is chunked so the bench tier
(~10^8 tokens) builds in seconds and never materializes on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = ("web", "code", "books", "wiki", "news", "forums", "papers", "chat")
VOCAB = 50257
FIXTURE_DIR = os.environ.get("DDSKETCH_FIXTURE_DIR", "/tmp/ddsketch_fixtures")


def _source_weights() -> np.ndarray:
    w = 1.0 / np.arange(1, len(SOURCES) + 1)
    return w / w.sum()


def generate_tokens_table(
    n_docs: int,
    seed: int = 42,
    out_dir: str | None = None,
    chunk_docs: int = 50_000,
) -> str:
    """Write the tokens table as parquet partitioned by source; returns path.

    Deterministic for a given (n_docs, seed): one master RNG drives per-chunk
    child seeds, so chunking does not change content. Cached: if the output
    exists with a matching _META marker it is reused.
    """
    out_dir = out_dir or os.path.join(FIXTURE_DIR, f"tokens_n{n_docs}_s{seed}")
    meta_path = os.path.join(out_dir, "_META")
    marker = f"n_docs={n_docs} seed={seed} v2"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if f.read().strip() == marker:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    master = np.random.default_rng(seed)
    weights = _source_weights()
    writer = None
    doc0 = 0
    try:
        while doc0 < n_docs:
            m = min(chunk_docs, n_docs - doc0)
            rng = np.random.default_rng(master.integers(0, 2**63))
            n_tok = np.clip(
                np.rint(rng.lognormal(mean=6.0, sigma=1.0, size=m)), 1, 4096
            ).astype(np.int32)
            src_idx = rng.choice(len(SOURCES), size=m, p=weights)
            total = int(n_tok.sum())
            flat = rng.zipf(1.1, size=total)
            flat = np.minimum(flat, VOCAB - 1).astype(np.int32)
            offsets = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(n_tok, out=offsets[1:])
            src_arr = np.array(SOURCES, dtype=object)[src_idx]
            doc_ids = np.array(
                [f"{src_arr[i]}-{doc0 + i:012d}" for i in range(m)], dtype=object
            )
            tokens = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()).cast(pa.int32()),
                pa.array(flat, type=pa.int32()),
            )
            batch = pa.table(
                {
                    "doc_id": pa.array(doc_ids, type=pa.string()),
                    "tokens": tokens,
                    "n_tok": pa.array(n_tok, type=pa.int32()),
                    "source": pa.array(src_arr, type=pa.string()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(out_dir, "part-0.parquet"), batch.schema
                )
            # small row groups so Spark can split a single file into many
            # input partitions (maxPartitionBytes-aligned scan parallelism)
            writer.write_table(batch, row_group_size=2048)
            doc0 += m
    finally:
        if writer is not None:
            writer.close()
    with open(meta_path, "w") as f:
        f.write(marker)
    return out_dir


def generate_value_streams(n_per_stream: int, seed: int = 42, out_dir: str | None = None) -> str:
    """F2: one table with (stream_id, value) over the six reference
    distributions (main.cpp:175-181)."""
    out_dir = out_dir or os.path.join(FIXTURE_DIR, f"streams_n{n_per_stream}_s{seed}")
    meta_path = os.path.join(out_dir, "_META")
    marker = f"n={n_per_stream} seed={seed} v1"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if f.read().strip() == marker:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    streams = {
        "normal_2_3": rng.normal(2, 3, n_per_stream),
        "normal_10_3": rng.normal(10, 3, n_per_stream),
        "exponential_17": rng.exponential(1 / 17, n_per_stream),
        "uniform_neg": rng.uniform(-50, 0, n_per_stream),
        "uniform_wide": rng.uniform(10, 4e5, n_per_stream),
        "gamma_2_2": rng.gamma(2, 2, n_per_stream),
    }
    ids = np.concatenate([[k] * n_per_stream for k in streams]).astype(object)
    vals = np.concatenate(list(streams.values()))
    pq.write_table(
        pa.table({"stream_id": pa.array(ids, type=pa.string()),
                  "value": pa.array(vals, type=pa.float64())}),
        os.path.join(out_dir, "part-0.parquet"),
    )
    with open(meta_path, "w") as f:
        f.write(marker)
    return out_dir
