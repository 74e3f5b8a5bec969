"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not available in
this environment — marked explicitly below); everything Spark-side is
real and tested: schemas, UDF signatures, batch shapes, partitioning.
Swap ``_decode_image_stub`` for a real decoder (PIL/torchvision/ffmpeg)
when deploying; nothing else changes.

Scale notes: media blobs are large — the operators select only the blob
+ id (column pruning keeps sibling text columns out of the scan), and
``maxRecordsPerBatch`` bounds per-batch Python memory. Feature vectors
come back as fixed-size ``array<float>`` ready for the similarity ops.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


def _decode_image_stub(blob: bytes) -> tuple[int, int, int, str]:
    """STUB decoder — deterministic fake driven by the blob's bytes.

    Real implementation would be ``PIL.Image.open(io.BytesIO(blob))``;
    PIL is not installed here, so we derive plausible metadata from a
    hash of the content. Deterministic => testable plumbing.
    """
    h = hashlib.md5(blob).digest()
    width = 64 + (struct.unpack("<H", h[0:2])[0] % 1985)
    height = 64 + (struct.unpack("<H", h[2:4])[0] % 1985)
    channels = 3 if h[4] % 4 else 1
    fmt = ("jpeg", "png", "webp")[h[5] % 3]
    return width, height, channels, fmt


def _col_type(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()


def decode_image_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """binary -> typed metadata via one mapInPandas stage."""
    schema = f"{id_col} {_col_type(df, id_col)}, {IMAGE_META_SCHEMA}"
    pruned = df.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(b or b"") for b in pdf[blob_col]]
            out = pd.DataFrame(metas, columns=["width", "height", "channels", "format"])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return pruned.mapInPandas(run, schema=schema)


def image_feature_udf(dim: int = 64):
    """binary -> deterministic feature vector (array<float>).

    STUB featurizer: bytes of md5-keyed pseudo-projection (stands in for a
    CNN embedding). Whole batch vectorized via numpy; signature/batch
    shape identical to a real model's."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def featurize(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            h = hashlib.md5(b or b"").digest()
            seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
            vec = np.resize(seed, dim) / 255.0  # deterministic fake embedding
            out.append(vec)
        return pd.Series(out)

    return featurize


def frame_sample(df: DataFrame, id_col: str, blob_col: str,
                 every_n: int = 30) -> DataFrame:
    """video binary -> one row per sampled frame (frame_no, frame_hash).

    STUB: frame boundaries derived deterministically from the blob hash
    (real impl: ffmpeg keyframe extraction). Demonstrates the 1->N
    ``mapInPandas`` expansion shape (UDTF-style) used for frame tables."""
    schema = f"{id_col} {_col_type(df, id_col)}, frame_no int, frame_hash string"
    pruned = df.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, hashes = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b or b""
                n_frames = 1 + len(blob) % 271
                for f in range(0, n_frames, every_n):
                    ids.append(i)
                    frames.append(f)
                    hashes.append(
                        hashlib.md5(blob + f.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_no": frames, "frame_hash": hashes}
            )

    return pruned.mapInPandas(run, schema=schema)
