"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media pipelines:
- media rows are (id, kind, payload: binary, meta: struct) — payloads are
  opaque bytes; all engine logic keys off `kind` and `meta`, so parquet
  scans prune payload bytes unless a stage actually decodes.
- decode/feature-extract run as Arrow-batched `mapInPandas` over
  partition-local batches — each executor touches only its own payloads;
  nothing ever collects to the driver.
- image decode is REAL end to end for PNG: payloads built by
  `documents_as_png_media` are spec-valid PNGs; `decode_image` parses
  dimensions from actual PNG/JPEG/GIF/BMP container bytes, and
  `pixel_stats` decodes the FULL raster (zlib inflate + per-row
  unfilter, functions/imaging.py, stdlib only) — an encode -> binary
  column -> decode round trip with no faking, oracle-checked end to end
  (`multimodal_real_decode`, `multimodal_pixel_stats`). JPEG/GIF raster
  (entropy coding) and audio/video codecs genuinely need PIL/ffmpeg,
  which this container lacks; `fake_decode` remains for those kinds.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "n_frames int, feature_hash string"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: build a media table from the documents corpus, treating
    the UTF-8 text bytes as an opaque payload. This provides a real
    binary column (with deterministic content) to drive the plumbing in
    an environment without actual image/audio fixtures."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.concat(kind, F.lit("/synthetic")).alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL image decode from bytes: dimensions parsed out of the actual
    PNG/JPEG/GIF/BMP container structure (functions/imaging.py, stdlib
    struct parsing — no PIL needed for header-level decode). For PNG,
    the full raster is decodable too — see pixel_stats below.
    """
    from parallel_map_reduce_spark.functions.imaging import image_dims

    dims = image_dims(payload)
    if dims is None:
        raise ValueError(
            "payload is not a recognized image container (PNG/JPEG/GIF/BMP)"
        )
    _, w, h = dims
    return (w, h)


def _dims_from_hex(h: str, kind: str) -> tuple[int, int, int]:
    width = 16 + int(h[:4], 16) % 4080
    height = 16 + int(h[4:8], 16) % 2144
    n_frames = 1 if kind == "image" else 1 + int(h[8:12], 16) % 3600
    return width, height, n_frames


def fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, n_frames) derived from a
    content hash — stable across runs/engines, shaped like real metadata."""
    return _dims_from_hex(hashlib.md5(payload or b"").hexdigest(), kind)


def documents_as_png_media(docs: DataFrame) -> DataFrame:
    """Adapter: REAL spec-valid PNG payloads, deterministically derived
    from each document (dims from the text's md5; pixels a cheap
    deterministic gradient). Unlike documents_as_media (opaque text
    bytes + fake decode), the payloads here are actual images, so the
    decode stage downstream parses real container bytes — an end-to-end
    encode -> binary column -> decode round trip with no faking.

    Runs as mapInPandas: PNG encoding is per-row Python (zlib), executor-
    local, Arrow-batched — the exact shape a real media ingest has.
    """
    from parallel_map_reduce_spark.functions.imaging import png_encode_gray

    src = docs.select("doc_id", "text", "source")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                h = hashlib.md5((text or "").encode()).hexdigest()
                w = 1 + int(h[:4], 16) % 64
                ht = 1 + int(h[4:8], 16) % 64
                row = bytes((x * 7 + int(h[:2], 16)) % 256 for x in range(w))
                payloads.append(png_encode_gray(w, ht, row * ht))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    out = src.mapInPandas(
        batches, schema="media_id long, kind string, payload binary, source string"
    )
    return out.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.col("source").alias("source"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lit("image/png").alias("mime"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    mapInPandas: each input batch is a pandas DataFrame of whole rows;
    output schema is fixed (FEATURE_SCHEMA). The decode call is the only
    per-item Python work — exactly the part that would call PIL/ffmpeg in
    production. Batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch, keeping executor memory
    flat regardless of corpus size.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            data = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            kinds = pdf["kind"].tolist()
            if use_fake_decoder:
                # one digest per payload serves both the fake decode and
                # feature_hash (the content fingerprint IS the md5)
                hexes = [hashlib.md5(d).hexdigest() for d in data]
                dims = [_dims_from_hex(h, k) for h, k in zip(hexes, kinds)]
            else:
                # REAL decode: dimensions parsed from the payload's
                # actual container bytes (PNG/JPEG/GIF/BMP headers)
                hexes = [hashlib.md5(d).hexdigest() for d in data]
                dims = [(*decode_image(d), 1) for d in data]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d) for d in data],
                    "width": [w for w, _, _ in dims],
                    "height": [h for _, h, _ in dims],
                    "n_frames": [f for _, _, f in dims],
                    "feature_hash": hexes,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


PIXEL_STATS_SCHEMA = (
    "media_id long, width int, height int, n_pixels long, sum_pixels long, "
    "min_pixel int, max_pixel int"
)


def pixel_stats(media: DataFrame) -> DataFrame:
    """FULL pixel-raster decode over PNG payloads + per-image channel
    statistics — no fake anywhere: each payload's raster is recovered by
    stdlib zlib inflate and per-row unfiltering (all five PNG filter
    types; functions/imaging.py png_decode_gray), and the stats are
    integer-exact sums/extrema over the decoded pixel values.

    Runs as mapInPandas so payload bytes stay executor-local and
    Arrow-batched; per-batch memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch. At 100 TB this is the
    canonical decode stage shape — swap the kernel body for PIL/ffmpeg
    where those exist; the Spark plumbing is identical.
    """
    import numpy as np

    from parallel_map_reduce_spark.functions.imaging import png_decode_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, ws, hs, nps, sums, mins, maxs = [], [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = png_decode_gray(bytes(p))
                arr = np.frombuffer(px, dtype=np.uint8)
                mids.append(mid)
                ws.append(w)
                hs.append(h)
                nps.append(w * h)
                sums.append(int(arr.sum(dtype=np.int64)))
                mins.append(int(arr.min()))
                maxs.append(int(arr.max()))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "width": ws,
                    "height": hs,
                    "n_pixels": nps,
                    "sum_pixels": sums,
                    "min_pixel": mins,
                    "max_pixel": maxs,
                }
            )

    return media.mapInPandas(batches, schema=PIXEL_STATS_SCHEMA)


def media_metadata_summary(media: DataFrame) -> DataFrame:
    """Pure-column metadata rollup (no decode): per kind, count + payload
    byte totals. Payload column is pruned from the scan — only meta is
    read."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.min(F.col("meta.n_bytes")).alias("min_bytes"),
            F.max(F.col("meta.n_bytes")).alias("max_bytes"),
        )
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per frame to
    sample, computed from metadata only (the actual frame extraction is
    the stubbed decode stage). Demonstrates fan-out scheduling of media
    work without moving payload bytes."""
    video = media.filter(F.col("kind") == "video")
    feats = extract_features(video).select("media_id", "n_frames")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return feats.select(
        "media_id", F.explode(idx).alias("frame_index")
    )


RESIZE_SCHEMA = (
    "media_id long, kind string, orig_width int, orig_height int, "
    "new_width int, new_height int, payload binary"
)


def resize_media(
    media: DataFrame, max_side: int = 256, use_fake_decoder: bool = True
) -> DataFrame:
    """Resize stage: aspect-preserving downscale to `max_side`.

    Real decoders are not in this container, so the pixel work is the
    stubbed part: dimensions come from the (deterministic) fake decode
    and the output payload is the input payload passed through — at
    deploy time the kernel body swaps to PIL `thumbnail`. Everything
    Spark-side is real: Arrow batching, binary column in/out, and the
    upscale guard (never enlarge). Runs as mapInPandas so payload bytes
    stay executor-local.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            data = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            kinds = pdf["kind"].tolist()
            hexes = [hashlib.md5(d).hexdigest() for d in data]
            dims = [_dims_from_hex(h, k) for h, k in zip(hexes, kinds)]
            new_dims = []
            for w, h, _ in dims:
                scale = min(max_side / max(w, h), 1.0)  # never upscale
                new_dims.append((max(1, int(w * scale)), max(1, int(h * scale))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "orig_width": [w for w, _, _ in dims],
                    "orig_height": [h for _, h, _ in dims],
                    "new_width": [w for w, _ in new_dims],
                    "new_height": [h for _, h in new_dims],
                    # stub: real impl writes re-encoded bytes here
                    "payload": data,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def resize_pixel_stats(
    media: DataFrame, out_w: int = 16, out_h: int = 16
) -> DataFrame:
    """REAL resize over the decoded raster: inflate + unfilter each PNG
    payload (functions/imaging.py png_decode_gray), nearest-neighbor
    resample to a fixed (out_w, out_h) thumbnail — the CLIP-style
    fixed-size preprocessing step — and emit integer-exact channel stats
    of the RESIZED image. Unlike resize_media (whose pixel kernel is the
    documented stub awaiting PIL), every byte here is computed: source
    pixel for output (i, j) is (floor(i*w/out_w), floor(j*h/out_h)).

    mapInPandas, payloads executor-local and Arrow-batched — identical
    plumbing to pixel_stats; at deploy time the NN kernel swaps for a
    PIL/torchvision resampler without touching the plan."""
    import numpy as np

    from parallel_map_reduce_spark.functions.imaging import png_decode_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, sums, mins, maxs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = png_decode_gray(bytes(p))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                r = arr[np.ix_(ys, xs)]
                mids.append(mid)
                sums.append(int(r.sum(dtype=np.int64)))
                mins.append(int(r.min()))
                maxs.append(int(r.max()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "out_w": pd.Series([out_w] * len(mids), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(mids), dtype="int32"),
                    "sum_resized": pd.Series(sums, dtype="int64"),
                    "min_resized": pd.Series(mins, dtype="int32"),
                    "max_resized": pd.Series(maxs, dtype="int32"),
                }
            )

    return media.mapInPandas(
        batches,
        "media_id long, out_w int, out_h int, "
        "sum_resized long, min_resized int, max_resized int",
    )
