"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side mechanics are real and tested — binary columns with a
typed metadata struct, Arrow-batched ``mapInPandas`` decode/feature
stages, partition-size control for large blobs. Decoding has two
backends: ``decoder='fake'`` (default) produces deterministic
md5-derived features so pipelines are end-to-end testable with no
codec dependencies; ``decoder='real'`` is import-gated on
pillow/soundfile (not in this container — the gate raises ImportError
only when the library is truly absent, and the wiring is covered by
mocked-codec tests).

At 100 TB: blobs dominate partition size — re-partition by
``maxRecordsPerFile``/``files.maxPartitionBytes`` so a batch of decoded
frames fits executor memory, and keep metadata in separate (pruned)
columns so metadata-only queries never touch the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("checksum", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_binary(
    df: DataFrame, id_col: str, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap a column's bytes (here: utf-8 of a string column, standing in
    for real blobs) in the engine's media schema with computed metadata."""
    content = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.lit("inline").alias("source"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("checksum"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature_hash", T.StringType(), True),
    ]
)


def _codec_fns(need_audio: bool = True):
    """Driver-side import gate for the real codecs (same pattern as
    ``Pipeline.to_airflow_dag``): returns the bound callables
    ``(image_open, audio_info)`` so the mapInPandas closure captures
    the FUNCTIONS, not the modules — cloudpickle then ships test fakes
    by value to the Python workers and real libraries by reference.
    pillow is required; soundfile is optional (None when absent —
    decoding an audio row without it raises with a clear message).
    """
    try:
        from PIL import Image
    except ImportError as exc:
        raise ImportError(
            "decoder='real' needs pillow; use decoder='fake' (deterministic "
            "md5-derived features) where codec libraries are unavailable"
        ) from exc
    audio_info = None
    if need_audio:
        try:
            import soundfile

            audio_info = soundfile.info
        except ImportError:
            audio_info = None
    return Image.open, audio_info


def decode_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode binary media → shape/feature rows via Arrow-batched
    ``mapInPandas``.

    'fake' (default): deterministic md5-derived width/height/frames —
    exercises the full batch path with stable outputs, no codec
    dependencies. 'real': pillow decodes image/video rows (width,
    height, n_frames from multi-frame formats) and soundfile probes
    audio rows (n_frames = sample frames); import-gated at the driver,
    so the ImportError fires only when the library is truly absent."""
    if decoder == "real":
        image_open, audio_info = _codec_fns()

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            for pdf in batches:
                out = {k: [] for k in ("media_id", "width", "height", "n_frames", "feature_hash")}
                for mid, c, mt in zip(
                    pdf["media_id"], pdf["content"], pdf["media_type"]
                ):
                    raw = bytes(c) if c is not None else b""
                    if mt == "audio":
                        if audio_info is None:
                            raise ImportError(
                                "audio decode needs soundfile; install it or "
                                "use decoder='fake'"
                            )
                        info = audio_info(io.BytesIO(raw))
                        w = h = None
                        nf = int(info.frames)
                    else:
                        img = image_open(io.BytesIO(raw))
                        w, h = int(img.width), int(img.height)
                        nf = int(getattr(img, "n_frames", 1))
                    out["media_id"].append(mid)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(nf)
                    out["feature_hash"].append(hashlib.md5(raw).hexdigest())
                yield pd.DataFrame(out)

        return df.select("media_id", "content", "media_type").mapInPandas(
            run_real, _FEATURE_SCHEMA
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.md5(bytes(c) if c is not None else b"").hexdigest()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [1 + int(d[:4], 16) % 2048 for d in digests],
                    "height": [1 + int(d[4:8], 16) % 2048 for d in digests],
                    "n_frames": [1 + int(d[8:12], 16) % 300 for d in digests],
                    "feature_hash": digests,
                }
            )

    return df.select("media_id", "content").mapInPandas(run, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_width", T.IntegerType(), True),
        T.StructField("orig_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("scale", T.DoubleType(), True),
    ]
)


def resize_plan(
    df: DataFrame, max_width: int = 256, max_height: int = 256, decoder: str = "fake"
) -> DataFrame:
    """Aspect-preserving fit-inside resize over Arrow batches
    (``mapInPandas``) — never upscales (scale capped at 1.0).

    'fake' derives the source dims from the content digest (same rule
    as ``decode_features``) and computes the target geometry — the
    real-codec seam is only the pixel resample itself. All arithmetic
    is plain IEEE double (min of ratios, floor), so an independent SQL
    engine reproduces it bit-for-bit.

    'real' (import-gated on pillow): opens each image and computes the
    same geometry from the TRUE header dimensions — no pixel decode or
    resample happens here (the output carries only geometry; the sink
    stage that consumes the plan performs the actual resample)."""
    import math

    if decoder == "real":
        image_open, _ = _codec_fns(need_audio=False)

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            for pdf in batches:
                rows = {k: [] for k in ("media_id", "orig_width", "orig_height", "width", "height", "scale")}
                for mid, c in zip(pdf["media_id"], pdf["content"]):
                    # PIL reads dimensions from the header without
                    # decoding pixels — the PLAN stays metadata-only;
                    # the sink stage that consumes it performs the
                    # actual resample (resizing here would decode every
                    # image for output that carries only geometry)
                    img = image_open(io.BytesIO(bytes(c) if c is not None else b""))
                    ow, oh = int(img.width), int(img.height)
                    scale = min(max_width / ow, max_height / oh, 1.0)
                    w = max(1, math.floor(ow * scale))
                    h = max(1, math.floor(oh * scale))
                    rows["media_id"].append(mid)
                    rows["orig_width"].append(ow)
                    rows["orig_height"].append(oh)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["scale"].append(scale)
                yield pd.DataFrame(rows)

        return df.select("media_id", "content").mapInPandas(run_real, _RESIZE_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "orig_width", "orig_height", "width", "height", "scale")}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                d = hashlib.md5(bytes(c) if c is not None else b"").hexdigest()
                ow = 1 + int(d[:4], 16) % 2048
                oh = 1 + int(d[4:8], 16) % 2048
                scale = min(max_width / ow, max_height / oh, 1.0)
                rows["media_id"].append(mid)
                rows["orig_width"].append(ow)
                rows["orig_height"].append(oh)
                rows["width"].append(max(1, math.floor(ow * scale)))
                rows["height"].append(max(1, math.floor(oh * scale)))
                rows["scale"].append(scale)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(run, _RESIZE_SCHEMA)


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 10_000) -> DataFrame:
    """Segment audio rows into fixed-duration decode windows:
    (media_id, duration_ms, chunk_idx, start_ms, end_ms), the work list
    a batched resample/transcribe stage consumes. The last chunk is
    clipped to the true duration.

    Entirely metadata arithmetic — duration comes from the media row's
    metadata (here the fake decoder's md5-derived duration, in
    production a stored probe result), so the plan is whole-stage
    codegen and NEVER deserializes payload bytes; only the decode stage
    that consumes the plan touches content.
    """
    duration = (
        F.lit(1)
        + F.conv(F.substring(F.col("meta.checksum"), 13, 8), 16, 10).cast("long")
        % 600_000
    )
    start = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.col("duration_ms") - 1,
            F.lit(chunk_ms).cast("long"),
        )
    )
    return (
        df.select("media_id", duration.alias("duration_ms"))
        .select("media_id", "duration_ms", start.alias("start_ms"))
        .select(
            "media_id",
            "duration_ms",
            (F.col("start_ms") / chunk_ms).cast("int").alias("chunk_idx"),
            "start_ms",
            F.least(F.col("start_ms") + chunk_ms, F.col("duration_ms")).alias("end_ms"),
        )
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 30) -> DataFrame:
    """Plan frame sampling for video rows: one output row per sampled
    frame index (metadata only — the decode itself happens in
    ``decode_features``-style batches). Demonstrates explode-based
    fan-out without touching payload bytes."""
    feats = decode_features(df)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
