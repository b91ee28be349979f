"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extraction as Arrow-batched pandas UDFs over mapInPandas.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns beside them -- the schema pattern a 100 TB multimodal
table uses (payload never parsed by Catalyst; metadata prunable/filterable
JVM-side). The decode stage is the canonical Python-boundary operator:
``mapInPandas`` over Arrow batches, one vectorized numpy pass per batch,
output schema fixed up front.

The actual image/audio codecs are NOT in this container, so ``decode_*``
ships a clearly-marked deterministic stand-in (byte-sum derived features)
behind the same signature, and ``decode_image_real`` raises
NotImplementedError with the intended PIL call -- swapping the stub for
the real decoder changes one function body, none of the Spark plumbing.
The stub is deterministic integer math, so these queries still get exact
DuckDB value-level oracles (plans.multimodal_suite).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAKE_W, FAKE_H = 640, 480


def attach_binary_payload(
    df: DataFrame, text: str = "text", mime: str = "image/fake"
) -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as the opaque
    ``payload`` binary + typed metadata (mime, n_bytes). A real table loads
    payload bytes from the lake instead; everything downstream is
    identical."""
    return df.withColumn("payload", F.encode(F.col(text), "utf-8")).withColumn(
        "mime", F.lit(mime)
    ).withColumn("n_bytes", F.octet_length("payload").cast("long"))


def binary_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """JVM-side metadata extraction: no Python touches the payload."""
    return df.select(
        F.col(id_col),
        "mime",
        "n_bytes",
        F.octet_length("payload").cast("long").alias("payload_len"),
    )


def _stub_features(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC STUB for the absent image codec: derives (checksum,
    width, height, mean_intensity) from the raw bytes. Replace with a real
    decoder (see decode_image_real) in production."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    checksum = int(arr.astype(np.int64).sum())
    width = checksum % FAKE_W + 1
    height = (checksum // FAKE_W) % FAKE_H + 1
    mean = float(arr.mean()) if arr.size else 0.0
    return checksum, width, height, mean


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, checksum, width, height, mean_intensity): the decode stage.

    Real Spark plumbing -- Arrow batches into mapInPandas, one numpy pass
    per batch, fixed output schema -- with the codec stubbed (see
    _stub_features)."""
    src = df.select(id_col, "payload")
    id_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[id_col]
    schema = (
        f"{id_col} {id_type}, checksum long, width int, height int, mean_intensity double"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_stub_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["checksum", "width", "height", "mean_intensity"]
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return src.mapInPandas(decode, schema=schema)


def decode_image_real(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The production decode path. Requires an image codec (PIL/opencv),
    which this container does not ship."""
    raise NotImplementedError(
        "image codec not available in this environment; production body: "
        "PIL.Image.open(io.BytesIO(payload)) per row inside the same "
        "mapInPandas plumbing as decode_features"
    )


def frame_sample(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling stub: splits the payload into n_frames
    equal byte slices ('frames') and emits one row per frame with its
    checksum -- the explode-shaped decode stage (one input row -> N output
    rows), again with real plumbing and a stubbed codec."""
    src = df.select(id_col, "payload")
    id_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[id_col]
    schema = f"{id_col} {id_type}, frame int, frame_bytes long, frame_checksum long"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                for f_i, chunk in enumerate(np.array_split(arr, n_frames)):
                    rows.append((did, f_i, int(chunk.size), int(chunk.sum())))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame", "frame_bytes", "frame_checksum"]
            )

    return src.mapInPandas(sample, schema=schema)
