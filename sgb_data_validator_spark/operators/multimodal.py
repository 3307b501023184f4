"""Multimodal (binary payload) plumbing.

No analog in the reference beyond media metadata checks
(src/models.py:105-197: o:media_type / o:sha256 / o:size are *metadata
about* binaries, never the bytes). At 100 TB the engine must carry
image/audio/video as opaque ``binary`` columns with typed metadata and
run decode / feature-extract stages as Arrow-batched Python over
``mapInPandas``. The decode libraries (Pillow/ffmpeg) are not in this
container, so the codec step is STUBBED (NotImplementedError), while
everything Spark-side — schema, batching, partitioning, the UDF
signature — is real and tested.

Feature extraction here computes deterministic byte-level features
(size, md5, first-byte) so the pipeline is end-to-end verifiable
against a SQL oracle even with the codec stubbed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature-extraction stage
FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes bigint, content_md5 string, first_byte int"


def decode_image(payload: bytes) -> "object":
    """Codec stub: real deployments decode via Pillow here. The Spark
    plumbing (mapInPandas batching) does not depend on the codec."""
    raise NotImplementedError("image codec not available in this environment")


def attach_binary_payload(df: DataFrame, text_col: str, media_type: str = "text/plain") -> DataFrame:
    """Test-path payload builder: treat the UTF-8 bytes of ``text_col``
    as the opaque binary, with typed metadata alongside — the exact
    column shape a real image/audio table has."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit(media_type)
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched byte-feature extraction over ``mapInPandas``.

    Scale shape: runs embarrassingly parallel per input partition; each
    Python worker sees bounded Arrow batches (session conf
    arrow.maxRecordsPerBatch), so a 100 TB binary column streams through
    without materializing a partition in memory. Column pruning still
    applies — only (id, payload, media_type) reach Python."""
    cols = df.select(
        F.col(id_col).alias("doc_id").cast("long"), "payload", "media_type"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if b is not None and len(b) else -1
                    ),
                }
            )

    return cols.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_md5 string"


def sample_frames(
    df: DataFrame, frame_size: int = 64, every: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling over an opaque binary column: split the payload
    into fixed-size frames and keep every ``every``-th (a video pipeline
    keeps every k-th decoded frame; with the codec stubbed, the "frame"
    is a byte window — the Spark-side shape is identical: mapInPandas
    row FAN-OUT, one input row → many frame rows, Arrow-batched).

    Scale shape: per-partition streaming; output row count is
    len/frame_size/every per doc — the fan-out is the product, not a
    shuffle. Column pruning keeps everything except (id, payload) out of
    Python."""
    cols = df.select(F.col(id_col).alias("doc_id").cast("long"), "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, hashes = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                for fi in range(0, (len(b) + frame_size - 1) // frame_size, every):
                    frame = b[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(frame))
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes, "frame_md5": hashes}
            )

    return cols.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, out_w int, out_h int, n_px bigint, px_md5 string"


def resize_images(
    df: DataFrame, target_w: int = 8, target_h: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Resize stage with the codec stubbed: a real deployment decodes
    via Pillow (:func:`decode_image`) and resizes; here a deterministic
    fake treats the payload bytes as a 1-D pixel stream and
    stride-samples it to exactly ``target_w × target_h`` values, so the
    Spark plumbing (batching, schema, memory bounds) is fully exercised
    and the output is reproducible for tests. Clearly NOT an image
    resample — swap ``_fake_resize`` for the codec in production."""

    def _fake_resize(b: bytes) -> bytes:
        n = target_w * target_h
        if len(b) == 0:
            return b"\x00" * n
        stride = max(len(b) // n, 1)
        sampled = b[::stride][:n]
        return sampled + b"\x00" * (n - len(sampled))

    cols = df.select(F.col(id_col).alias("doc_id").cast("long"), "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            px = pdf["payload"].map(
                lambda b: _fake_resize(bytes(b)) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": target_w,
                    "out_h": target_h,
                    "n_px": px.map(lambda p: len(p) if p is not None else 0),
                    "px_md5": px.map(
                        lambda p: hashlib.md5(p).hexdigest() if p is not None else None
                    ),
                }
            )

    return cols.mapInPandas(batches, schema=RESIZE_SCHEMA)
