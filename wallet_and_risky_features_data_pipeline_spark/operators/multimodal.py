"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column (or a pointer + small thumbnail), keep typed metadata
columns alongside, and run decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` stages so each executor
processes whole record batches.

The actual codecs (PIL/ffmpeg/torchaudio) are not in this container, so
``decode_image_meta`` is a clearly marked STUB: it derives
deterministic fake dimensions from the payload bytes. Everything
Spark-side — binary schema, Arrow batch shape, UDF signature,
partition-parallel execution — is real and oracle-tested (the fake math
is mirrorable in SQL precisely because it is deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FRAME_SIZE = 1024  # bytes per fake "frame" for the frame-sampler stub


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of
    the text; in production: the image/audio blob) plus metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("payload_bytes"),
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """STUB decoder over mapInPandas.

    A real implementation would do ``PIL.Image.open(io.BytesIO(b))``
    per payload inside the batch loop; this container has no image
    codecs, so dimensions are derived deterministically from the first
    two payload bytes. The Arrow plumbing (binary batches in, struct
    rows out, one invocation per partition batch) is the real thing.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # Vectorized byte accessors — a real decoder would be the
            # per-element codec call; everything around it should stay
            # columnar so the batch loop doesn't drown it in Python.
            n_bytes = payloads.str.len()
            first = payloads.str[0].astype("int64")
            second = payloads.str[1].fillna(first).astype("int64")  # b[1 % len(b)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "head_hex": payloads.map(lambda b: b[:4].hex().upper()),
                    # STUB: fake dims from payload bytes (deterministic).
                    "width": (16 * (first % 64 + 1)).astype("int32"),
                    "height": (16 * (second % 64 + 1)).astype("int32"),
                    # frame-sample stub: ceil(n_bytes / FRAME_SIZE)
                    "n_frames": ((n_bytes + FRAME_SIZE - 1) // FRAME_SIZE).astype("int32"),
                }
            )

    return df.mapInPandas(decode, DECODE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stage over mapInPandas: emit every ``every_nth``
    fixed-size byte window ("frame") of each payload with a content
    digest — the variable-cardinality Arrow pattern a video pipeline
    uses (rows out ≠ rows in, sized by payload length, all inside one
    batch invocation per partition).

    STUB note: a real sampler would decode container frames (ffmpeg);
    the fixed ``FRAME_SIZE`` byte window stands in for the codec, and
    the digest is md5 over the frame's uppercase hex — chosen because
    both engines can express it, so even this stub is value-verified
    end-to-end.
    """
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_digest": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for f in range(0, max((len(b) + FRAME_SIZE - 1) // FRAME_SIZE, 0), every_nth):
                    frame = b[f * FRAME_SIZE : (f + 1) * FRAME_SIZE]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["frame_bytes"].append(len(frame))
                    out["frame_digest"].append(
                        hashlib.md5(frame.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


RESIZE_MAX = 256  # fit box for the resize stage


def resize_meta(df: DataFrame, max_side: int = RESIZE_MAX) -> DataFrame:
    """Resize stage as a vectorized ``@pandas_udf``: fit (width,
    height) into a ``max_side`` square preserving aspect ratio, never
    upscaling — the metadata half of an image-resize stage (a real one
    would also re-encode the payload; this container has no codecs).

    All arithmetic is integer (``h*max_side // w``), so both engines
    compute identical outputs — no float scale factor to drift. The
    pandas_udf form (vs mapInPandas) is deliberate: scalar column in,
    struct column out, composable inside a normal projection.
    """
    import pyspark.sql.functions as _F
    from pyspark.sql.functions import pandas_udf

    out_t = T.StructType(
        [T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType())]
    )

    @pandas_udf(out_t)
    def fit(w: pd.Series, h: pd.Series) -> pd.DataFrame:
        import numpy as np

        w = w.astype("int64").to_numpy()
        h = h.astype("int64").to_numpy()
        landscape = w >= h
        new_w = np.where(landscape, max_side, (w * max_side) // np.maximum(h, 1))
        new_h = np.where(landscape, (h * max_side) // np.maximum(w, 1), max_side)
        keep = (w <= max_side) & (h <= max_side)
        return pd.DataFrame(
            {
                "w": np.where(keep, w, new_w).astype("int32"),
                "h": np.where(keep, h, new_h).astype("int32"),
            }
        )

    return df.withColumn("__fit", fit("width", "height")).select(
        *df.columns,
        _F.col("__fit.w").alias("resized_w"),
        _F.col("__fit.h").alias("resized_h"),
    )


AUDIO_WINDOW = 256  # samples per analysis window for the audio stub

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("mid_crossings", T.IntegerType()),
    ]
)


def audio_window_features(df: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Audio feature-extraction stage over mapInPandas: per
    non-overlapping ``window``-sample analysis window, emit amplitude
    sum, energy (sum of squares), and midpoint-crossing count — the
    RMS/zero-crossing-rate shape every audio curation pipeline computes
    before filtering silence/clipping.

    STUB note: a real implementation would decode the container
    (soundfile/torchaudio) to PCM; neither codec is in this container,
    so the payload bytes ARE the samples (unsigned 8-bit PCM. This is
    how u8 WAV payloads actually look, minus the 44-byte header).
    Every statistic is integer arithmetic, so the stub is value-checked
    against the SQL oracle exactly — no float tolerance. The Arrow
    plumbing is the real thing: variable-cardinality batches (rows out
    = Σ windows per payload), numpy-vectorized inside each batch.
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "window_idx": [], "n_samples": [],
                "sum_amp": [], "sum_sq": [], "mid_crossings": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(bytes(payload), np.uint8).astype(np.int64)
                for widx in range((len(arr) + window - 1) // window):
                    seg = arr[widx * window : (widx + 1) * window]
                    signs = seg >= 128
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(widx)
                    out["n_samples"].append(len(seg))
                    out["sum_amp"].append(int(seg.sum()))
                    out["sum_sq"].append(int((seg * seg).sum()))
                    out["mid_crossings"].append(int((signs[1:] != signs[:-1]).sum()))
            yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})

    return df.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
