"""Multimodal column conventions: opaque binary payloads + typed
metadata structs, with decode/feature-extract/frame-sample operators.

Contract: a multimodal table carries
    payload   binary        (the raw image/audio/video bytes)
    meta      struct<modality string, fmt string, width int,
                     height int, n_frames int>
and all heavy per-item work runs as Arrow-batched pandas over
mapInPandas — the Spark-side plumbing (schema, batching, partition
parallelism) is real. Two codec tiers:

- fake tier (synthesize_multimodal / resize_payload): UTF-8 document
  bytes stand in for media so every stage is cheap and oracle-checkable
  in plain SQL — the plumbing-only twin.
- real tier (synthesize_bmp_corpus / synthesize_ppm_corpus /
  resize_payload_real): actual 24-bit BMP and binary-PPM (P6) images
  built, parsed, resampled and re-encoded by the pure-Python codecs
  in functions/bmp.py and functions/ppm.py — no external image
  library needed. resize_payload_real sniffs each payload's magic and
  re-encodes in the SAME format it decoded, the production
  mixed-format-corpus shape. Pixels are closed-form in
  (doc_id, x, y), so the decoded statistics are still reproducible by
  the DuckDB oracle, while any codec bug (row order, padding,
  truncation) shifts them.

Formats beyond BMP/PPM (JPEG/PNG/audio/video) would go through
PIL/libvips/ffmpeg, which this container does not ship — those
decodes are import-gated (_decode_image) rather than faked.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisky_wine_etl_spark.functions import bmp

MM_META_SCHEMA = (
    "meta struct<modality:string,fmt:string,width:int,height:int,n_frames:int>"
)


def _package_root() -> str:
    """Directory containing the whisky_wine_etl_spark package — shipped
    into worker closures as a plain string (see _worker_bmp)."""
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Worker-side codec import: mapInPandas closures must not capture the
# bmp module (or any helper defined in this package) — cloudpickle
# serializes module-level objects by NAME, so a driver whose cwd is
# elsewhere (the external harness) ships references its Python workers
# cannot import. Each closure instead carries the package root as a
# plain string and runs this import dance in its own body; on a
# multi-node cluster the same role is played by shipping the package
# wheel via spark.submit.pyFiles.


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


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 RGB array.

    BMP and binary PPM (P6) decode natively via the pure-Python codecs
    (functions/bmp.py, functions/ppm.py). Other formats need
    PIL/libvips, which this container does not ship — import-gated so
    the limitation fails loudly, not silently."""
    if payload[:2] == b"BM":
        return bmp.decode_bmp(payload)
    if payload[:2] == b"P6":
        from whisky_wine_etl_spark.functions import ppm

        return ppm.decode_ppm(payload)
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL here
        raise NotImplementedError(
            "non-BMP/PPM decode requires PIL; container ships without codecs"
        ) from exc
    raise NotImplementedError("non-BMP/PPM decode path not wired in this environment")


def synthesize_bmp_corpus(docs: DataFrame) -> DataFrame:
    """Build a REAL image corpus from `documents`: one valid 24-bit BMP
    per doc, dimensions 8–16 × 8–14 derived from doc_id, pixels the
    closed-form functions in functions/bmp.py synth_pixels. Runs as
    Arrow-batched mapInPandas — per-item byte assembly is inherently
    Python work, the batch loop is the production codec shape."""
    out_schema = "doc_id bigint, width int, height int, payload binary"
    root = _package_root()

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:  # worker-side path bootstrap (see above)
            sys.path.insert(0, root)
        from whisky_wine_etl_spark.functions import bmp as codec
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + (d * 3) % 7
                rows.append((d, w, h, codec.encode_bmp(codec.synth_pixels(d, w, h))))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "payload"])

    return docs.select("doc_id").mapInPandas(make, schema=out_schema)


def synthesize_ppm_corpus(docs: DataFrame) -> DataFrame:
    """Build a REAL image corpus of binary PPMs (P6) from `documents`:
    same dimensions and closed-form pixels as synthesize_bmp_corpus
    (the synthetic image is format-independent), encoded by the
    pure-Python PPM codec in functions/ppm.py."""
    out_schema = "doc_id bigint, width int, height int, payload binary"
    root = _package_root()

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:  # worker-side path bootstrap (see above)
            sys.path.insert(0, root)
        from whisky_wine_etl_spark.functions import bmp as px_codec
        from whisky_wine_etl_spark.functions import ppm as codec
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 8 + (d * 3) % 7
                rows.append((d, w, h, codec.encode_ppm(px_codec.synth_pixels(d, w, h))))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "payload"])

    return docs.select("doc_id").mapInPandas(make, schema=out_schema)


def resize_payload_real(
    mm: DataFrame, target_w: int = 10, target_h: int = 10
) -> DataFrame:
    """REAL-codec resize: sniff each payload's magic (BMP or P6 PPM),
    decode, nearest-neighbor resample to exactly (target_w, target_h),
    re-encode in the SAME format, then decode the re-encoded bytes
    again for the reported pixel_sum — so the output statistics cover
    the full decode→resize→encode→decode round trip for whichever
    codec the row arrived in (mixed-format corpora work per row). A
    row-order, padding, or truncation bug anywhere in either codec
    shifts pixel_sum away from the oracle's closed form."""
    out_schema = (
        "doc_id bigint, width int, height int, n_bytes int,"
        " pixel_sum bigint, payload binary"
    )
    root = _package_root()

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:  # worker-side path bootstrap (see above)
            sys.path.insert(0, root)
        from whisky_wine_etl_spark.functions import bmp as codec
        from whisky_wine_etl_spark.functions import ppm as ppm_codec
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                raw = bytes(payload)
                if raw[:2] == b"P6":
                    decode, encode = ppm_codec.decode_ppm, ppm_codec.encode_ppm
                else:
                    decode, encode = codec.decode_bmp, codec.encode_bmp
                out = codec.resize_nearest(decode(raw), target_w, target_h)
                enc = encode(out)
                roundtrip = decode(enc)
                rows.append(
                    (
                        int(doc_id),
                        target_w,
                        target_h,
                        len(enc),
                        int(roundtrip.astype(np.int64).sum()),
                        enc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes", "pixel_sum", "payload"],
            )

    return mm.select("doc_id", "payload").mapInPandas(do_resize, schema=out_schema)


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


def synthesize_wav_corpus(docs: DataFrame) -> DataFrame:
    """Build a REAL audio corpus from `documents`: one valid PCM WAV
    per doc (mono 16-bit; 800–960 samples and 8/12/16 kHz rate derived
    from doc_id; closed-form waveform functions/wav.py synth_samples).
    Arrow-batched mapInPandas, same shape as the image corpora."""
    out_schema = "doc_id bigint, sample_rate int, n_samples int, payload binary"
    root = _package_root()

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:  # worker-side path bootstrap (see above)
            sys.path.insert(0, root)
        from whisky_wine_etl_spark.functions import wav as codec
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 800 + (d % 5) * 40
                rate = 8000 + (d % 3) * 4000
                rows.append((d, rate, n, codec.encode_wav(codec.synth_samples(d, n), rate)))
            yield pd.DataFrame(rows, columns=["doc_id", "sample_rate", "n_samples", "payload"])

    return docs.select("doc_id").mapInPandas(make, schema=out_schema)


def audio_features(mm: DataFrame) -> DataFrame:
    """Decode WAV payloads and emit integer-exact signal features:
    (doc_id, sample_rate, n_samples, sum_sq, peak, n_bytes). Energy
    (sum of squared samples) and peak (max |s|) stay in integer
    arithmetic end to end, so the SQL oracle reproduces them exactly
    from the generator's closed form — a header, endianness, or
    truncation bug in the codec shifts sum_sq off the oracle."""
    out_schema = (
        "doc_id bigint, sample_rate int, n_samples int, "
        "sum_sq bigint, peak int, n_bytes int"
    )
    root = _package_root()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        import numpy as np

        from whisky_wine_etl_spark.functions import wav as codec
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = codec.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        len(s),
                        int((s * s).sum()),
                        int(np.abs(s).max()) if len(s) else 0,
                        len(payload),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_sq", "peak", "n_bytes"],
            )

    return mm.select("doc_id", "payload").mapInPandas(extract, schema=out_schema)


def image_ahash_bands(images: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of each image, returned as four
    16-bit bands: decode the payload (BMP/PPM via the real codecs),
    grayscale = channel-sum // 3, nearest-neighbor downsample to the
    8×8 aHash grid with the same floor(i·w/8) index arithmetic as
    resize_payload_real, bit k (= row·8 + col) set when
    64·gray > Σgray (the integer-exact form of gray > mean). Bands
    b0..b3 carry bits [16k, 16k+16) so the whole hash stays inside
    signed ints and band-equality doubles as the LSH bucket key:
    hamming(h1, h2) ≤ 3 forces at least one of the four bands equal
    (pigeonhole), which makes banded candidate generation EXACT for
    a ≤3 threshold, not heuristic.

    Runs as Arrow-batched mapInPandas — decode + hash are per-item
    numpy work; everything downstream (band join, XOR popcount) is
    JVM-side."""
    out_schema = "doc_id bigint, b0 int, b1 int, b2 int, b3 int"
    root = _package_root()

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        from whisky_wine_etl_spark.operators.multimodal import _decode_image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = _decode_image(bytes(payload)).astype(np.int64)
                gray = px.sum(axis=2) // 3
                h, w = gray.shape
                ix = (np.arange(8, dtype=np.int64) * w) // 8
                iy = (np.arange(8, dtype=np.int64) * h) // 8
                g8 = gray[iy][:, ix]
                s = int(g8.sum())
                bits = (g8 * 64 > s).flatten()
                bands = [0, 0, 0, 0]
                for k, bit in enumerate(bits.tolist()):
                    if bit:
                        bands[k // 16] |= 1 << (k % 16)
                rows.append((int(doc_id), *bands))
            yield pd.DataFrame(rows, columns=["doc_id", "b0", "b1", "b2", "b3"])

    return images.select("doc_id", "payload").mapInPandas(hash_batches, schema=out_schema)


def ahash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs by aHash hamming distance: explode
    each hash into its (band_idx, band_value) buckets, self-join on
    bucket equality (the LSH candidate step — complete, not
    probabilistic, for max_hamming ≤ 3 with 4 bands), distinct the
    candidate pairs, then one exact XOR-popcount verification per
    pair. Candidate volume is bounded by bucket occupancy, never
    |corpus|²; the all-pairs form exists only in the oracle."""
    if max_hamming > 3:
        raise ValueError(
            "4x16-bit banding is only exact for max_hamming <= 3 "
            f"(got {max_hamming}); add bands for larger radii"
        )
    h = hashes.select("doc_id", "b0", "b1", "b2", "b3")
    buckets = h.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("val"))
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.val")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = h.select(*[F.col(c).alias(f"{c}_a") for c in h.columns])
    hb = h.select(*[F.col(c).alias(f"{c}_b") for c in h.columns])
    ham = sum(
        F.bit_count(F.col(f"b{i}_a").bitwiseXOR(F.col(f"b{i}_b"))) for i in range(4)
    )
    return (
        cand.join(ha, cand.doc_a == ha.doc_id_a)
        .join(hb, cand.doc_b == hb.doc_id_b)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
