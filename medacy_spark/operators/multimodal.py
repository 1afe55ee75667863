"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video travel as opaque `binary` columns with a metadata struct;
decode/feature-extraction runs in Arrow-batched mapInPandas.

Decoders, per the pluggable contract on extract_media_features:
  * ``decoder="png"`` — a REAL pixel decoder: the pure-Python/numpy PNG
    codec in functions/png.py (zlib inflate + scanline unfiltering, all
    five PNG filters). Works in this container; real pixel statistics.
  * general image/audio/video codecs (PIL/ffmpeg) are NOT in this
    container — pass their adapter as ``decoder=callable`` in a
    production image; the plan does not change.
  * ``fake=True`` — deterministic byte-histogram stand-in for payloads
    that are not real media, exercising the identical Spark topology.

Contract tested in tests/test_multimodal.py; the PNG decoder proves the
swap-in on real rasters inside the Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "doc_id long, media_type string, feature array<float>, ok boolean"


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically derive a fake media payload per doc (bytes of the
    doc id repeated) — real binary column, real metadata struct."""
    d = F.col(id_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(d, F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.repeat(F.conv(d.cast("string"), 10, 16), 8), "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(d, F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(d * 3, F.lit(64)) + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(d, F.lit(30)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature = normalized byte
    histogram over the payload, 16 bins."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=16, range=(0, 256))
    total = hist.sum()
    return (hist / total).astype(np.float32) if total else np.zeros(16, np.float32)


def extract_media_features(
    media: DataFrame, fake: bool = False, decoder=None
) -> DataFrame:
    """media(MEDIA_SCHEMA) -> (doc_id, media_type, feature array<float>, ok).

    DECODER CONTRACT (what a real PIL/ffmpeg decoder must satisfy to be a
    drop-in swap — enforced by test_media_decoder_contract):

      decoder(payload: bytes, meta: dict) -> sequence of float
        * pure per row: same (payload, meta) -> same vector, no I/O
          outside the payload (executors see only the Arrow batch);
        * fixed dimensionality per media family (all finite floats) —
          downstream ANN/near-dup operators index on a constant dim;
        * per-row failures raise — the stage converts them to
          (feature=None, ok=False) so one corrupt payload never fails the
          task (the reference's corrupt-file skip, dataset.py:150-155).

    ``decoder`` may be a callable or the string ``"png"``, which selects
    the container-native pure-Python PNG pixel decoder
    (functions/png.png_feature_decoder — real decoded rasters, fixed
    23-dim stats+histogram features). General codecs (JPEG, audio,
    video) need PIL/ffmpeg, absent here: with neither ``decoder`` nor
    ``fake`` the stage raises NotImplementedError. ``fake=True`` selects
    the deterministic byte-histogram stand-in, which exercises the
    identical mapInPandas topology — iterator batching, bounded batch
    memory via arrow.maxRecordsPerBatch, per-row error flagging instead
    of task failure.
    """
    if decoder == "png":
        from medacy_spark.functions.png import png_feature_decoder as decoder  # noqa: F811
    elif decoder == "jpeg":
        from medacy_spark.functions.jpeg import jpeg_feature_decoder as decoder  # noqa: F811
    elif decoder is None:
        if not fake:
            # config error, raised at plan time on the driver — a decoder's
            # own per-row exceptions (any type) are flagged, never re-raised
            raise NotImplementedError(
                "audio/video media decode requires ffmpeg — not in this "
                "container; pass decoder='png', decoder='jpeg', "
                "decoder=<callable>, or fake=True for the deterministic "
                "test decoder"
            )

        def decoder(payload, meta):  # noqa: F811 - the documented default
            return _fake_decode(payload, meta["width"], meta["height"]).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    feats.append([float(v) for v in decoder(bytes(payload), meta)])
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "ok": oks,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices 0..n_frames-1
    step every_n — the distribution-side half of frame extraction (the
    decode itself is the stub above)."""
    return media.filter(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
