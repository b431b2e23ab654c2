"""Multimodal columns for LLM training-data pipelines (north-star
extension): image/audio/video as opaque BINARY columns with typed
metadata, processed by Arrow-batched pandas functions via
``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested; the actual codec work is STUBBED
(this container has no image/audio libraries): ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-derived pseudo-decode stands in so the downstream
plumbing (feature extraction, resize bookkeeping, frame sampling) is
exercised end-to-end.

Scale notes baked into the design:
- binary payloads ride the scan; metadata-only predicates (media_type,
  byte size) prune BEFORE any decode — never decode-then-filter;
- ``mapInPandas`` streams Arrow batches, so executor memory is bounded
  by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x payload size —
  tune it DOWN for large media (default 10k rows/batch is sized for
  scalar columns);
- decoded features are fixed-width float arrays → columnar, joinable
  with the embedding-similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("content", BinaryType()),       # opaque payload
        StructField("source_uri", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, width long, height long, "
    "n_frames long, sample_rate long, feature array<double>"
)

_FEATURE_DIM = 16


def synthesize_media(
    df: DataFrame, id_col: str, type_col_value: str = "image", ascii_payload: bool = False
) -> DataFrame:
    """Deterministic fake media rows from any keyed DataFrame — payload
    bytes derived from md5(id), so tests are reproducible without real
    files. ``ascii_payload=True`` stores the hex STRING's utf-8 bytes
    instead of the decoded bytes (128 ASCII bytes vs 64 raw) — used by
    the oracle-checked query, since DuckDB's md5 only hashes VARCHAR so
    the cross-engine mirror needs a text payload."""
    hex_str = F.repeat(F.md5(F.col(id_col).cast("string")), 4)
    content = F.encode(hex_str, "utf-8") if ascii_payload else F.unhex(hex_str)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(type_col_value).alias("media_type"),
        content.alias("content"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("source_uri"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def _fake_decode(media_type: str, payload: bytes) -> dict:
    """Deterministic pseudo-decode: dimensions and features derived from
    the payload hash. Stands in for PIL/librosa/ffmpeg in tests."""
    h = hashlib.md5(payload or b"").digest()
    feature = (np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0).tolist()
    return {
        "width": 16 + h[0] % 240 if media_type in ("image", "video") else 0,
        "height": 16 + h[1] % 240 if media_type in ("image", "video") else 0,
        "n_frames": 1 if media_type == "image" else 1 + h[2] % 300,
        "sample_rate": 16000 if media_type == "audio" else 0,
        "feature": feature,
    }


def _real_decode(media_type: str, payload: bytes) -> dict:
    """Real codec path, optional-dependency imports at call time
    (executor-side, where the decode actually runs): PIL for images,
    soundfile for audio. Features are a fixed 16-dim downsample in both
    modalities so the output unifies with :data:`DECODED_SCHEMA` and
    the similarity operators. Raises ImportError when the library is
    absent (translated to the documented NotImplementedError by the
    caller) and NotImplementedError for video (needs ffmpeg — out of
    scope for optional deps)."""
    import io

    if media_type == "image":
        from PIL import Image  # optional dep — ImportError handled above

        img = Image.open(io.BytesIO(payload))
        img.load()
        gray = np.asarray(
            img.convert("L").resize((4, 4)), dtype=np.float64
        )
        return {
            "width": int(img.width),
            "height": int(img.height),
            "n_frames": 1,
            "sample_rate": 0,
            "feature": (gray.ravel() / 255.0).tolist(),
        }
    if media_type == "audio":
        import soundfile  # optional dep

        data, rate = soundfile.read(io.BytesIO(payload))
        mono = np.abs(np.atleast_2d(data).reshape(len(data), -1).mean(axis=1))
        # 16 equal-width mean-energy bins (zero-padded for short clips)
        pad = (-len(mono)) % _FEATURE_DIM
        binned = np.pad(mono, (0, pad)).reshape(_FEATURE_DIM, -1).mean(axis=1)
        return {
            "width": 0,
            "height": 0,
            "n_frames": int(len(data)),
            "sample_rate": int(rate),
            "feature": binned.tolist(),
        }
    raise NotImplementedError(
        f"no real decoder for media_type={media_type!r} (video needs "
        "ffmpeg); pass fake=True for the deterministic stub"
    )


def decode_media(
    df: DataFrame,
    fake: bool = False,
    batch_size_hint: int | None = 256,
) -> DataFrame:
    """Decode + feature-extract media rows via ``mapInPandas``.

    With ``fake=False`` the real codec path runs when its optional
    libraries (PIL for image, soundfile for audio) are importable on
    the executor, and raises ``NotImplementedError`` otherwise — decode
    failures must be loud, never silently fake. ``fake=True`` keeps the
    deterministic md5-derived stub the oracle queries rely on.
    """
    import pandas as pd

    spark = df.sparkSession
    if batch_size_hint:
        # media payloads are orders of magnitude wider than scalar rows;
        # shrink Arrow batches so a batch fits in executor memory
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size_hint))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if fake:
                decoded = [
                    _fake_decode(t, c)
                    for t, c in zip(pdf["media_type"], pdf["content"])
                ]
            else:
                try:
                    decoded = [
                        _real_decode(t, bytes(c))
                        for t, c in zip(pdf["media_type"], pdf["content"])
                    ]
                except ImportError as e:
                    raise NotImplementedError(
                        "real media decode requires optional libraries "
                        "(PIL for image, soundfile for audio) not present "
                        "in this environment; pass fake=True for the "
                        "deterministic stub decoder"
                    ) from e
            out = pd.DataFrame(decoded)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return df.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 30) -> DataFrame:
    """Frame-sampling bookkeeping for video rows: which frame indices a
    downstream extractor should touch — pure column math, no decode."""
    n = F.col("n_frames")
    idx = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_nth))
    ).otherwise(F.expr("array()").cast("array<bigint>"))
    return decoded.withColumn("sampled_frames", idx).withColumn(
        "n_sampled", F.size("sampled_frames").cast("long")
    )


def media_feature_table(decoded: DataFrame) -> DataFrame:
    """Decoded features as an embedding table compatible with the
    similarity operators (vec_id, embedding) — multimodal near-dup
    detection reuses the exact same LSH machinery."""
    return decoded.select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
    )


def resize_plan(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Aspect-preserving resize targets for decoded image rows — pure
    column math (like :func:`frame_sample`): ``scale = min(1,
    max_side/longest_side)``, targets rounded, floored at 1px. The
    planning step is engine-side so a 100 TB resize job shuffles
    nothing and decodes nothing it will not use."""
    longest = F.greatest("width", "height")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / longest)
    return decoded.withColumn(
        "target_w",
        F.greatest(F.lit(1), F.round(F.col("width") * scale, 0).cast("long")),
    ).withColumn(
        "target_h",
        F.greatest(F.lit(1), F.round(F.col("height") * scale, 0).cast("long")),
    )


RESIZED_SCHEMA = (
    "media_id long, media_type string, target_w long, target_h long, "
    "content binary"
)


def resize_media(
    df: DataFrame,
    max_side: int = 64,
    fake: bool = False,
    batch_size_hint: int | None = 256,
) -> DataFrame:
    """Resize media payloads via ``mapInPandas`` over raw media rows
    (MEDIA_SCHEMA in, RESIZED_SCHEMA out).

    Real path: PIL when importable on the executor, loud
    ``NotImplementedError`` otherwise (this container ships no codecs —
    decode failures must never silently fake). ``fake=True`` exercises
    every piece of the distributed plumbing — Arrow batch sizing,
    schema, per-row dimension math — and passes the payload through
    unchanged (a stub, clearly NOT pixel work): targets are derived
    from the same md5 dims as the stub decoder, so tests and oracles
    can replay them."""
    import pandas as pd

    spark = df.sparkSession
    if batch_size_hint:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size_hint)
        )

    def _targets(w: int, h: int) -> tuple[int, int]:
        scale = min(1.0, float(max_side) / max(w, h))
        return max(1, round(w * scale)), max(1, round(h * scale))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            tw, th, content = [], [], []
            for t, c in zip(pdf["media_type"], pdf["content"]):
                payload = bytes(c)
                if fake:
                    d = _fake_decode(t, payload)
                    w, h = _targets(d["width"], d["height"])
                    tw.append(w), th.append(h), content.append(payload)
                    continue
                try:
                    from io import BytesIO

                    from PIL import Image
                except ImportError as e:
                    raise NotImplementedError(
                        "real media resize requires PIL, not present in "
                        "this environment; pass fake=True for the "
                        "plumbing-only stub"
                    ) from e
                img = Image.open(BytesIO(payload))
                w, h = _targets(*img.size)
                buf = BytesIO()
                img.resize((w, h)).save(buf, format=img.format or "PNG")
                tw.append(w), th.append(h), content.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "target_w": tw,
                    "target_h": th,
                    "content": content,
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "media_id long, frame_idx long, width long, height long, frame binary"
)


def extract_frames(
    df: DataFrame,
    every_nth: int = 30,
    fake: bool = False,
    batch_size_hint: int | None = 64,
) -> DataFrame:
    """Frame extraction for video rows: MEDIA_SCHEMA in, one row per
    SAMPLED frame out (``frame_idx`` stepping by ``every_nth``) — the
    row-EXPLODING ``mapInPandas`` shape, where output cardinality
    exceeds input. Arrow still bounds memory per batch, but now by
    frames-per-video × frame size, so the batch hint defaults far lower
    than the scalar-decode path.

    Real path needs ffmpeg (not shipped here) and raises the documented
    ``NotImplementedError``; ``fake=True`` derives each frame's bytes
    deterministically from md5(payload ‖ frame_idx) and its dimensions
    from the stub decoder, so partitioning, schema, and the explode
    shape are exercised end-to-end (and replayable in tests).
    """
    import pandas as pd

    spark = df.sparkSession
    if batch_size_hint:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size_hint)
        )

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg, not present in "
                    "this environment; pass fake=True for the deterministic "
                    "plumbing stub"
                )
            ids, idxs, ws, hs, frames = [], [], [], [], []
            for mid, t, c in zip(pdf["media_id"], pdf["media_type"], pdf["content"]):
                if t != "video":
                    continue
                payload = bytes(c)
                d = _fake_decode(t, payload)
                for i in range(0, d["n_frames"], every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    ws.append(d["width"])
                    hs.append(d["height"])
                    frames.append(
                        hashlib.md5(payload + str(i).encode()).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "frame": frames,
                }
            )

    return df.filter(F.col("media_type") == "video").mapInPandas(
        explode_frames, FRAMES_SCHEMA
    )
