"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, plus feature extraction through the Arrow-batched
``mapInPandas`` path.

The container ships no media codecs, so the actual decode is STUBBED:
``decode_media`` raises NotImplementedError unless a codec library is
importable, and ``extract_features`` uses a deterministic
digest-derived feature vector instead of real embeddings. Everything
Spark-side — schema, binary column handling, partition-parallel
mapInPandas, Arrow batch shapes — is real and tested; swapping the
stub for PIL/torchaudio is a pure function replacement.

Scale notes: payloads stay in executors end-to-end (no driver
materialization); mapInPandas streams Arrow record batches, so memory
is bounded by batch size (spark.sql.execution.arrow.maxRecordsPerBatch),
not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["image", "audio", "video"]

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: payload is the
    utf-8 text bytes (a stand-in for real image/audio blobs), kind
    cycles by id, metadata is derived arithmetically. JVM-side only."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "utf-8")
    meta = F.struct(
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        F.lit("stub").alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """Real decode hook. Raises until a codec library is available —
    clearly-marked stub per the build brief."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media decode requires a codec library (PIL/torchaudio/av); "
            "not present in this environment — extract_features uses the "
            "deterministic digest stub instead"
        )
    raise NotImplementedError("real decode not wired yet")


def _digest_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector: md5 digest bytes scaled to
    [0, 1). Stands in for a real encoder; stable across runs/engines."""
    d = hashlib.md5(payload if payload is not None else b"").digest()
    return [d[i % 16] / 256.0 for i in range(dim)]


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _stub_resize_bytes(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a decoded+resized image: a digest
    chain stretched to the target byte budget (width*height/256). A
    real implementation decodes, resizes, re-encodes — same signature."""
    if payload is None:
        payload = b""
    budget = max(16, (width * height) // 256)
    out = bytearray()
    seed = hashlib.md5(payload + f":{width}x{height}".encode()).digest()
    while len(out) < budget:
        out.extend(seed)
        seed = hashlib.md5(seed).digest()
    return bytes(out[:budget])


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize the image rows to (width, height); audio/video rows pass
    through untouched. mapInPandas keeps the payloads executor-side and
    Arrow-batched; the pixel work is the clearly-marked stub
    (_stub_resize_bytes) — swapping in PIL is a pure function change.
    Output schema == input schema (MEDIA_SCHEMA), so resize composes
    with extract_features / sample_frames."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = dict(r.meta)
                payload = r.payload
                if r.kind == "image":
                    payload = _stub_resize_bytes(payload, width, height)
                    meta["width"], meta["height"] = width, height
                rows.append((r.media_id, r.kind, payload, meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def sample_frames(
    media: DataFrame, fps: float = 1.0, max_frames: int = 16
) -> DataFrame:
    """Sample frames from the video rows: one output row per sampled
    frame at 1/fps spacing within duration_ms, capped at max_frames —
    the decode-to-frames step of a video pipeline, with the frame
    payload stubbed as a digest of (payload, frame_idx). A generating
    mapInPandas: input rows fan OUT to frame rows, so the Arrow batch
    shape (one DataFrame per yielded batch, arbitrary row count) is the
    real contract a decoder would use. Non-video rows produce nothing."""
    step_ms = int(1000.0 / fps)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                duration = int(r.meta["duration_ms"] or 0)
                n = min(max_frames, max(0, duration // step_ms))
                base = r.payload if r.payload is not None else b""
                for i in range(n):
                    out.append(
                        (
                            r.media_id,
                            i,
                            i * step_ms,
                            hashlib.md5(base + f":frame:{i}".encode()).digest(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_ms", "payload"]
            )

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, engine: str = "jvm"
) -> DataFrame:
    """(media_id, kind, n_bytes, features[dim]) from the payload.

    ``engine="jvm"`` (default): the digest stub is md5 math, which
    whole-stage codegen computes without leaving the JVM — feature[i]
    is digest byte ``i % 16`` scaled to [0,1), extracted from the md5
    hex with substring/conv column expressions. This is the registered
    path: paying an Arrow round-trip of every payload to compute
    hash arithmetic was a measured 6x slowdown for zero fidelity.

    ``engine="arrow"``: the mapInPandas path — Arrow-batched,
    partition-parallel; the per-batch pandas loop is where a real
    model's batched inference runs once codecs/weights exist. Kept
    behind this parameter with the plan shape tested so swapping the
    stub for real inference is a pure function change. Both engines
    produce identical rows (pinned by test_multimodal).
    """
    if engine == "jvm":
        pay = F.coalesce(F.col("payload"), F.encode(F.lit(""), "utf-8"))
        h = F.md5(pay)
        feats = F.array(
            *[
                F.conv(F.substring(h, 2 * (i % 16) + 1, 2), 16, 10).cast("int")
                / F.lit(256.0)
                for i in range(dim)
            ]
        )
        return media.select(
            "media_id",
            "kind",
            F.coalesce(F.octet_length("payload"), F.lit(0))
            .cast("long")
            .alias("n_bytes"),
            feats.alias("features"),
        )
    if engine != "arrow":
        raise ValueError(f"unknown engine {engine!r} (expected 'jvm' or 'arrow')")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": pdf["payload"].map(
                        lambda b: _digest_features(b, dim)
                    ),
                }
            )
            yield out

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )
