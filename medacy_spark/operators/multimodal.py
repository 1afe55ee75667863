"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video travel as opaque `binary` columns with a metadata struct;
decode/feature-extraction runs in Arrow-batched mapInPandas.

Decoders, per the pluggable contract on extract_media_features:
  * ``decoder="png"`` / ``"jpeg"`` — REAL pixel decoders: the
    pure-Python/numpy codecs in functions/png.py and functions/jpeg.py.
  * ``decoder="wav"`` — REAL audio decode: functions/wav.py (PCM +
    IEEE-float RIFF/WAVE) feeding genuine signal statistics.
  * ``decoder="gif"`` — REAL frame-sequence decode: functions/gif.py
    (full LZW + animation composition); extract_frame_features below
    samples and featurizes individual frames.
  * ``decoder="avi"`` — REAL compressed-VIDEO decode: functions/avi.py
    walks the RIFF/AVI container and decodes every Motion-JPEG frame
    through functions/jpeg.py; extract_frame_features(container="avi")
    samples real video frames.
  * modern codecs (h264/vp9/av1 in mp4/mkv/webm) need ffmpeg, NOT in
    this container — pass their adapter as ``decoder=callable`` in a
    production image; the plan does not change.
  * ``fake=True`` — deterministic byte-histogram stand-in for payloads
    that are not real media, exercising the identical Spark topology.

Contract tested in tests/test_ops.py; the PNG/JPEG/WAV/GIF/AVI decoders
prove the swap-in on real encoder output inside the Arrow batch.
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

    ``decoder`` may be a callable or one of the strings ``"png"``,
    ``"jpeg"``, ``"wav"``, ``"gif"``, ``"avi"``, selecting the
    container-native pure-Python decoders (real decoded rasters/
    waveforms/frame sequences/Motion-JPEG video; fixed-dim stats
    features — 23 for rasters and audio, 25 for GIF and AVI). Modern
    video codecs (h264 etc.) need an external adapter: with neither
    ``decoder`` nor ``fake`` the stage raises ValueError at plan time.
    ``fake=True`` selects the deterministic byte-histogram stand-in,
    which exercises the identical mapInPandas topology — iterator
    batching, bounded batch memory via arrow.maxRecordsPerBatch,
    per-row error flagging instead of task failure.
    """
    if decoder == "png":
        from medacy_spark.functions.png import png_feature_decoder as decoder  # noqa: F811
    elif decoder == "jpeg":
        from medacy_spark.functions.jpeg import jpeg_feature_decoder as decoder  # noqa: F811
    elif decoder == "wav":
        from medacy_spark.functions.wav import wav_feature_decoder as decoder  # noqa: F811
    elif decoder == "gif":
        from medacy_spark.functions.gif import gif_feature_decoder as decoder  # noqa: F811
    elif decoder == "avi":
        from medacy_spark.functions.avi import avi_feature_decoder as decoder  # noqa: F811
    elif decoder is None:
        if not fake:
            # config error, raised at plan time on the driver — a decoder's
            # own per-row exceptions (any type) are flagged, never re-raised
            raise ValueError(
                "no decoder selected; pass decoder='png'/'jpeg' (images), "
                "'wav' (audio), 'gif' (frame sequences), 'avi' "
                "(Motion-JPEG video), decoder=<callable> (e.g. an ffmpeg "
                "adapter for h264/vp9 containers), or fake=True for the "
                "deterministic test decoder"
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
    step every_n — the distribution-side half of frame extraction when
    the decoder is external (ffmpeg adapter). For GIF payloads the
    decode itself is real too: see extract_frame_features."""
    return media.filter(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )


FRAME_FEATURE_SCHEMA = "doc_id long, frame_no int, feature array<float>, ok boolean"


def extract_frame_features(
    media: DataFrame,
    every_n: int = 5,
    max_frames: int = 64,
    container: str = "gif",
) -> DataFrame:
    """REAL per-frame feature extraction for multi-frame payloads:
    ``container="gif"`` decodes animated GIFs (functions/gif.py,
    composited RGBA frames), ``container="avi"`` decodes Motion-JPEG
    video (functions/avi.py, per-frame JPEG through functions/jpeg.py).
    Decode each payload once inside the Arrow batch, sample every
    ``every_n``-th frame (capped at ``max_frames`` sampled frames per
    doc), and emit the shared 23-dim raster stats per frame. Corrupt
    payloads yield a single (frame_no=-1, ok=False) row, mirroring the
    per-row error contract of the still-image stage.

    One decode serves all sampled frames — the naive alternative
    (frame_sample_plan explode → per-(doc, frame) decode join) would
    re-decode the payload once per sampled frame; at corpus scale the
    decode dominates, so the explode happens AFTER decode, driver-free,
    inside the same mapInPandas pass.
    """
    from medacy_spark.functions.avi import avi_decode
    from medacy_spark.functions.gif import gif_decode, gif_frame_rgb
    from medacy_spark.functions.png import raster_features

    if container == "gif":
        decode, to_rgb = gif_decode, gif_frame_rgb
    elif container == "avi":
        decode, to_rgb = avi_decode, (lambda f: f)  # already RGB
    else:
        raise ValueError(f"container must be gif|avi, got {container!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, feats, oks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # buffer the doc's rows and commit only after the whole
                # frame loop succeeds: a mid-loop failure must yield
                # exactly one ok=False row, never a partial ok=True frame
                # set alongside the corrupt marker
                doc_rows: list[tuple[int, list[float]]] = []
                try:
                    frames, _timing = decode(bytes(payload))
                    sampled = range(0, frames.shape[0], every_n)
                    for frame_no in list(sampled)[:max_frames]:
                        doc_rows.append((
                            frame_no,
                            [float(v) for v in raster_features(to_rgb(frames[frame_no]))],
                        ))
                except Exception:
                    ids.append(doc_id)
                    frame_nos.append(-1)
                    feats.append(None)
                    oks.append(False)
                    continue
                for frame_no, feat in doc_rows:
                    ids.append(doc_id)
                    frame_nos.append(frame_no)
                    feats.append(feat)
                    oks.append(True)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": frame_nos, "feature": feats, "ok": oks}
            )

    return media.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)
