"""Multimodal columns: opaque binary media + typed metadata (SURVEY §2.11).

Design for 100 TB of mixed media:
- media bytes live in a ``BinaryType`` column (Parquet handles binary
  natively, with page-level compression);
- typed metadata travels alongside in a struct column so filters/pruning
  (``media_meta.media_type = 'image/png'``) never touch the bytes;
- decode / feature-extraction is the one legitimately-Python stage, so it
  runs as ``mapInPandas`` — Arrow-batched, one Python worker per task,
  vectorized within the batch.  Partition count controls decode
  parallelism; the schema out of the UDF is explicit.

The actual codec is STUBBED (no image/audio libraries in this container):
``decode_media`` computes deterministic fake features (byte stats) with the
exact batch shape, schema, and Arrow plumbing a real decoder would use —
swap ``_fake_decode`` for PIL/libav and nothing else changes.
(Environment re-probed each round — through round 7, PIL/cv2/soundfile/
imageio all remain absent and installs are not permitted.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary media column + typed metadata struct.

    (Here the "media" is the utf-8 bytes of the text — the container has no
    real media; the column types and layout are the real design.)
    """
    return df.withColumns(
        {
            "media": F.encode(F.col(text_col), "UTF-8"),
            "media_meta": F.struct(
                F.lit("text/plain").alias("media_type"),
                F.octet_length(F.col(text_col)).alias("n_bytes"),
            ),
        }
    )


def _fake_decode(media: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a real codec.

    A real implementation would be::

        img = PIL.Image.open(io.BytesIO(media))   # needs pillow
        return img.width, img.height, ...

    which is unavailable here — so features are exact byte statistics
    (deterministic, oracle-checkable through the Arrow boundary).
    """
    n = len(media)
    checksum = sum(media) % 2147483647
    return n, checksum, checksum % 640, checksum % 480


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    The shipped closure must be fully self-contained: Spark's Python
    workers do not have this package on their ``sys.path`` (the driver
    controls the session), so referencing module globals from ``batches``
    would make cloudpickle serialize them by reference and fail with
    ``ModuleNotFoundError`` on the worker.  Hence the codec is inlined.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(media) -> tuple:
            # inlined _fake_decode (keep the two in sync); NULL media
            # (null text upstream) → NULL features, never a worker crash
            if media is None:
                return None, None, None, None
            n = len(media)
            checksum = sum(media) % 2147483647
            return n, checksum, checksum % 640, checksum % 480

        for pdf in it:
            feats = [fake_decode(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [f[0] for f in feats], dtype="Int32"
                    ),
                    "checksum": pd.Series(
                        [f[1] for f in feats], dtype="Int64"
                    ),
                    "fake_width": pd.Series(
                        [f[2] for f in feats], dtype="Int32"
                    ),
                    "fake_height": pd.Series(
                        [f[3] for f in feats], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("target_w", T.IntegerType()),
                    T.StructField("target_h", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Binary→binary transform with metadata update (the image-resize shape).

    A real codec would decode, resample, and re-encode; the stub truncates
    or pads the byte stream to ``width·height`` deterministically, keeping
    the exact contract a real resize has: binary in, binary out, metadata
    struct updated, schema explicit, Arrow-batched, partition-parallel.
    The closure is self-contained (workers lack this package).
    """

    if width <= 0 or height <= 0:
        raise ValueError(f"width/height must be positive, got {width}x{height}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def fake_resize(media):
            if media is None:  # NULL media → NULL output, no crash
                return None
            if len(media) >= target:
                return bytes(media[:target])
            return bytes(media) + b"\x00" * (target - len(media))

        for pdf in it:
            resized = [fake_resize(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": resized,
                    "media_meta": [
                        None
                        if m is None
                        else {
                            "media_type": "image/raw",
                            "n_bytes": len(m),
                            "target_w": width,
                            "target_h": height,
                        }
                        for m in resized
                    ],
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 16,
    stride: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per sampled frame — the video frame-sampling fan-out shape.

    The stub treats the byte stream as ``frame_size``-byte frames and emits
    every ``stride``-th one.  A real implementation swaps the slicing for a
    container demuxer; the fan-out (one input row → N output rows through
    ``mapInPandas``), the explicit schema, and the frame indexing carry
    over unchanged.  At 100 TB the output row count dominates — sampled
    frames, never all frames.
    """

    if frame_size <= 0 or stride <= 0:
        # driver-side, not a ZeroDivisionError deep inside an executor
        raise ValueError(
            f"frame_size and stride must be positive, got "
            f"{frame_size}/{stride}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, totals = [], [], [], []
            for doc_id, media in zip(
                pdf[id_col].astype("int64"), pdf["media"]
            ):
                if media is None:  # NULL media emits no frames
                    continue
                m = bytes(media)
                n_total = len(m) // frame_size
                for i in range(0, n_total, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(m[i * frame_size:(i + 1) * frame_size])
                    totals.append(n_total)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, FRAME_SCHEMA)
