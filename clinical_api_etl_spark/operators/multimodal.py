"""Multimodal (image/audio/video) column plumbing. [EXT]

Media are opaque ``binary`` payload columns with a typed metadata struct:

    payload   binary
    media     struct<kind string, mime string, width int, height int,
                     duration_ms long>

The Spark-side machinery — schema, partition-friendly batch shapes,
Arrow-batched ``mapInPandas`` decode/feature/resize/frame-sample stages —
is real and tested. The *codec* step is guarded: when Pillow is
importable, image payloads decode/resize for real; otherwise
``decode_media``/``resize_images`` raise ``NotImplementedError`` unless
``fake=True``, in which case a clearly-marked deterministic fake decoder
produces byte-derived features so the distributed plumbing can be
exercised end-to-end. (Audio/video codecs remain stubbed either way.)

Scale posture: payloads never pass through the driver; each ``mapInPandas``
batch holds ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, so
executor memory bounds batch size, and feature extraction parallelizes with
the scan. Binary stats (length/digest) stay JVM-side entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a multimodal frame from a text table for tests/benches:
    payload = utf-8 bytes, metadata derived from the id. (In production the
    payload column arrives from the lakehouse as real bytes.)"""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media"),
    )


def binary_stats(df: DataFrame) -> DataFrame:
    """JVM-side payload statistics: byte length + content digest, grouped by
    media kind. No Python involvement at all."""
    return (
        df.select(
            F.col("media.kind").alias("kind"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("digest"),
        )
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.countDistinct("digest").cast("long").alias("n_distinct"),
        )
    )


def _pil_available() -> bool:
    """True when Pillow is importable (guarded — not shipped here)."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic FAKE decode: folds payload bytes into ``dim`` buckets.
    Stands in for a real codec (PIL/libav) absent from this container —
    keeps batch shapes and schemas honest without pretending to decode."""
    acc = [0.0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += float(b)
    total = sum(acc) or 1.0
    return [a / total for a in acc]


def _pil_decode(payload: bytes, dim: int) -> list[float]:
    """Real image decode via Pillow: grayscale intensity histogram folded
    into ``dim`` buckets, normalized to sum 1 — a deterministic, codec-true
    feature. Runs inside an executor's Arrow batch, never on the driver."""
    import io

    from PIL import Image

    hist = Image.open(io.BytesIO(payload)).convert("L").histogram()  # 256 bins
    acc = [0.0] * dim
    for level, count in enumerate(hist):
        acc[level * dim // 256] += float(count)
    total = sum(acc) or 1.0
    return [a / total for a in acc]


def decode_media(df: DataFrame, *, dim: int = 8, fake: bool = False) -> DataFrame:
    """Decode/feature-extract stage as Arrow-batched ``mapInPandas``.

    Codec resolution, at *plan build time*:

    * ``fake=True`` — the deterministic byte-fold fake runs the full
      distributed path (batch shapes/schemas real, decode admittedly not).
    * ``fake=False`` with Pillow importable — image payloads decode for
      real (grayscale-histogram features); non-image kinds keep the fake
      fold (audio/video codecs remain stubbed, documented).
    * ``fake=False`` without Pillow — ``NotImplementedError``: this
      container ships no codec, and pretending otherwise would be worse.
    """
    use_pil = False
    if not fake:
        if not _pil_available():
            raise NotImplementedError(
                "media codecs (PIL/libav) are not available in this "
                "environment; pass fake=True to run the deterministic fake "
                "decoder"
            )
        use_pil = True

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _pil_decode(p, dim)
                if use_pil and m["kind"] == "image"
                else _fake_decode(p, dim)
                for p, m in zip(pdf["payload"], pdf["media"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["media"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.select("doc_id", "payload", "media").mapInPandas(
        _decode_batch, schema=FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    frame timestamp. The timestamp lattice is computed JVM-side from
    metadata; actual frame extraction belongs to ``decode_media``'s codec.
    Videos lacking duration metadata yield a single frame at t=0."""
    frames = F.when(
        F.col("media.duration_ms").isNotNull(),
        F.sequence(F.lit(0).cast("long"), F.col("media.duration_ms"), F.lit(every_ms).cast("long")),
    ).otherwise(F.array(F.lit(0).cast("long")))
    return df.filter(F.col("media.kind") == "video").select(
        "doc_id", F.explode(frames).alias("frame_ts_ms")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media", MEDIA_STRUCT, False),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic FAKE resize: samples the payload down/up to w*h bytes
    with even-stride indexing — stands in for a real scaler while keeping
    output sizes proportional to the target dims."""
    n = max(w * h, 1)
    if not payload:
        return bytes(n)
    step = len(payload) / n
    return bytes(payload[min(int(i * step), len(payload) - 1)] for i in range(n))


def resize_images(
    df: DataFrame, *, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize stage for image payloads (Arrow-batched ``mapInPandas``).

    Output keeps the multimodal frame shape (payload + metadata with the
    new dims), so resize composes with ``decode_media``/``binary_stats``
    downstream. Codec resolution mirrors ``decode_media``: ``fake=True``
    runs the deterministic byte-sampler; ``fake=False`` uses Pillow
    (real ``Image.resize``, PNG-encoded output) when importable and raises
    ``NotImplementedError`` otherwise. Non-image rows pass through
    untouched (payload and metadata unchanged).
    """
    use_pil = False
    if not fake:
        if not _pil_available():
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "pass fake=True to run the deterministic fake resizer"
            )
        use_pil = True

    def _pil_resize(payload: bytes) -> bytes:
        import io

        from PIL import Image

        out = io.BytesIO()
        Image.open(io.BytesIO(payload)).resize((width, height)).save(out, "PNG")
        return out.getvalue()

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["media"]):
                if m["kind"] == "image":
                    payloads.append(
                        _pil_resize(p) if use_pil else _fake_resize(p, width, height)
                    )
                    metas.append({**m, "width": width, "height": height})
                else:
                    payloads.append(p)
                    metas.append(dict(m))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "media": metas}
            )

    return df.select("doc_id", "payload", "media").mapInPandas(
        _resize_batch, schema=RESIZED_SCHEMA
    )


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sum_sq", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def synth_pcm(df: DataFrame, id_col: str = "doc_id", *, chunks: int = 4) -> DataFrame:
    """Deterministic little-endian int16 PCM payload: ``chunks`` md5 blocks
    of the id (16 bytes = 8 samples each), un-hexed JVM-side. Stands in for
    a decoded audio column while staying byte-reproducible in ANY engine —
    which is what lets the downstream Arrow kernel be value-hash-gated
    against a SQL oracle instead of rows-only."""
    hexes = [
        F.md5(F.concat(F.lit(f"au{c}:"), F.col(id_col).cast("string")))
        for c in range(chunks)
    ]
    return df.select(F.col(id_col), F.unhex(F.concat(*hexes)).alias("pcm"))


def audio_frame_features(
    df: DataFrame,
    *,
    pcm_col: str = "pcm",
    id_col: str = "doc_id",
    frame_len: int = 16,
) -> DataFrame:
    """Per-frame audio features over a little-endian int16 PCM binary
    column: frame energy (exact integer sum of squares) and zero-crossing
    count — the classic VAD/segmentation primitives.

    Arrow-batched ``mapInPandas`` + numpy (``frombuffer`` is zero-copy;
    all arithmetic vectorized int64) — the declared-Arrow pattern for
    byte-level media kernels (cf. operators/pq.py:_encode). Output is
    EXACT integers, so the whole decode->feature path is hash-gated
    cross-engine (mm_audio_features), unlike codec-dependent paths
    (decode_media) that stay rows-only without PIL.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "n_samples": [],
                "sum_sq": [],
                "zero_crossings": [],
            }
            for doc_id, buf in zip(pdf[id_col], pdf[pcm_col]):
                samples = np.frombuffer(bytes(buf), dtype="<i2").astype(np.int64)
                for f in range(0, len(samples), frame_len):
                    fr = samples[f : f + frame_len]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f // frame_len)
                    out["n_samples"].append(int(len(fr)))
                    out["sum_sq"].append(int((fr * fr).sum()))
                    out["zero_crossings"].append(int(((fr[:-1] * fr[1:]) < 0).sum()))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(pcm_col)).mapInPandas(
        batches, schema=AUDIO_FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video scene cuts — second Arrow byte-kernel under a full value hash.
# ---------------------------------------------------------------------------

#: L1 threshold for a scene cut over 16-byte frames: uniform random bytes
#: average ~85 per-byte distance (~1360 per frame pair), so 2000 flags the
#: upper tail — real cuts with genuinely different content.
SCENE_CUT_L1 = 2000


def synth_frames(
    df: DataFrame, id_col: str = "doc_id", *, frame_bytes: int = 16
) -> DataFrame:
    """Deterministic fake video: 4 + id%3 frames of ``frame_bytes`` md5
    bytes each, concatenated into one binary column — byte-reproducible in
    any engine (cf. synth_pcm), which is what lets the scene-cut kernel be
    value-hash-gated instead of rows-only."""
    nf = F.lit(4) + F.pmod(F.col(id_col), F.lit(3)).cast("int")
    hexes = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), nf - 1),
            lambda f: F.md5(
                F.concat(
                    F.lit("vf"),
                    f.cast("string"),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
        ),
    )
    return df.select(F.col(id_col), F.unhex(hexes).alias("video"))


def video_scene_cuts(
    df: DataFrame,
    *,
    video_col: str = "video",
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    threshold: int = SCENE_CUT_L1,
) -> DataFrame:
    """Scene-cut detection over a packed-frames binary column: per
    consecutive frame pair, the exact integer L1 pixel distance and a cut
    flag — the shot-segmentation primitive of every video curation
    pipeline. Zero-copy numpy Arrow kernel (declared Arrow op, like
    audio_frame_features); output is exact integers + a threshold
    boolean, so the whole path hash-gates cross-engine
    (mm_video_scene_cuts)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "l1_dist": [],
                "is_cut": [],
            }
            for doc_id, buf in zip(pdf[id_col], pdf[video_col]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
                frames = arr.reshape(-1, frame_bytes)
                if len(frames) < 2:
                    continue
                dists = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
                for i, d in enumerate(dists):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(int(i))
                    out["l1_dist"].append(int(d))
                    out["is_cut"].append(bool(d > threshold))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(video_col)).mapInPandas(
        batches,
        "doc_id long, frame_idx long, l1_dist long, is_cut boolean",
    )


def synth_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake 8x8 grayscale image: 64 md5-derived bytes
    (4 blocks), row-major — the byte-reproducible stand-in that lets
    image_tile_stats hash-gate cross-engine (cf. synth_pcm/synth_frames)."""
    hexes = [
        F.md5(F.concat(F.lit(f"im{c}:"), F.col(id_col).cast("string")))
        for c in range(4)
    ]
    return df.select(F.col(id_col), F.unhex(F.concat(*hexes)).alias("image"))


def image_tile_stats(
    df: DataFrame,
    *,
    image_col: str = "image",
    id_col: str = "doc_id",
    side: int = 8,
    tile: int = 4,
) -> DataFrame:
    """Per-tile patch statistics over a row-major grayscale binary column:
    pixel sum, sum of squares, and horizontal-edge count (|Δ| > 64 within
    the tile's rows) — the patch-level preprocessing vision pipelines run
    before embedding (ViT patch norm, blur/contrast screens). Zero-copy
    numpy Arrow kernel; exact integer outputs hash-gate cross-engine
    (mm_image_tile_stats)."""
    import numpy as np

    tiles_per_side = side // tile

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "tile_idx": [],
                "n_px": [],
                "sum_px": [],
                "sum_sq": [],
                "h_edges": [],
            }
            for doc_id, buf in zip(pdf[id_col], pdf[image_col]):
                img = (
                    np.frombuffer(bytes(buf), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(side, side)
                )
                for tr in range(tiles_per_side):
                    for tc in range(tiles_per_side):
                        patch = img[
                            tr * tile : (tr + 1) * tile,
                            tc * tile : (tc + 1) * tile,
                        ]
                        grad = np.abs(patch[:, 1:] - patch[:, :-1])
                        out["doc_id"].append(int(doc_id))
                        out["tile_idx"].append(tr * tiles_per_side + tc)
                        out["n_px"].append(int(patch.size))
                        out["sum_px"].append(int(patch.sum()))
                        out["sum_sq"].append(int((patch * patch).sum()))
                        out["h_edges"].append(int((grad > 64).sum()))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(image_col)).mapInPandas(
        batches,
        "doc_id long, tile_idx long, n_px long, sum_px long, sum_sq long,"
        " h_edges long",
    )
