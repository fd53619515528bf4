"""Multimodal column conventions: opaque binary payloads + typed
metadata structs, with decode/feature-extract/frame-sample operators.

Contract: a multimodal table carries
    payload   binary        (the raw image/audio/video bytes)
    meta      struct<modality string, fmt string, width int,
                     height int, n_frames int>
and all heavy per-item work runs as Arrow-batched pandas over
mapInPandas — the Spark-side plumbing (schema, batching, partition
parallelism) is real; the actual codec call is stubbed because no
image/audio library ships in this container (import-gated; a
deterministic fake keeps the pipeline testable end-to-end).

The synthetic payloads here are UTF-8 document bytes so every stage is
deterministic and oracle-checkable where SQL can express it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MM_META_SCHEMA = (
    "meta struct<modality:string,fmt:string,width:int,height:int,n_frames:int>"
)


def synthesize_multimodal(docs: DataFrame) -> DataFrame:
    """Build a multimodal-shaped table from `documents`: payload =
    UTF-8 bytes of text, metadata derived deterministically."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("modality"),
            F.when(F.col("doc_id") % 2 == 0, "raw").otherwise("compressed").alias("fmt"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            ((F.col("doc_id") * 7) % 480).cast("int").alias("height"),
            (F.col("doc_id") % 5 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_image(payload: bytes) -> bytes:
    """Real decode would go through PIL/libvips — not in this
    container. Import-gated stub."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL here
        raise NotImplementedError(
            "image decode requires PIL; container ships without codecs"
        ) from exc
    raise NotImplementedError("real decode path not wired in this environment")


def extract_features(mm: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """Feature extraction via mapInPandas: Arrow batches in, one
    feature row per payload out. The features are a deterministic
    fake (payload length stats) standing in for codec+model output —
    the batching/schema/partitioning is the real production shape."""
    out_schema = "doc_id bigint, n_bytes int, first_byte int, byte_mod int"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "byte_mod": payloads.map(lambda b: len(b) % 7).astype("int32"),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(extract, schema=out_schema)


def sample_frames(mm: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video-modality rows: expand n_frames to one
    row per sampled frame index — pure explode, no Python."""
    return (
        mm.filter(F.col("meta.modality") == "video")
        .select(
            "doc_id",
            F.col("meta.n_frames").alias("n_frames"),
            F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every == 0)
    )


def resize_payload(mm: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize plumbing via mapInPandas: Arrow batches in, one resized
    payload + updated dimension metadata out. A real implementation
    calls the codec inside the same loop (decode → resample → encode);
    here the resample is a deterministic fake — clamp dimensions to the
    target box and truncate the payload to width*height/16 bytes — so
    the full pipeline (schema evolution of the meta struct included)
    is testable and oracle-checkable end to end."""
    out_schema = (
        "doc_id bigint, width int, height int, payload binary"
    )

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].clip(upper=target_w).astype("int32")
            h = pdf["height"].clip(upper=target_h).astype("int32")
            n = (w.astype("int64") * h.astype("int64") // 16).astype("int64")
            payload = [
                bytes(p[: int(k)]) for p, k in zip(pdf["payload"], n, strict=True)
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": w, "height": h, "payload": payload}
            )

    flat = mm.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "payload",
    )
    return flat.mapInPandas(do_resize, schema=out_schema)
