"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north star).

The Spark-side machinery is real and tested — schema, Arrow-batched
``mapInPandas`` operators, partition-friendly shapes. The *codec* layer
(actual JPEG/audio decode) is stubbed: the image/audio libraries are
not in this container, so ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, which substitutes a deterministic fake decoder
(byte-length-derived "dimensions") that keeps the pipeline end-to-end
testable.

Scale notes: mapInPandas streams Arrow record batches — binary payloads
never materialize row-at-a-time in Python; metadata extraction happens
per-batch with vectorized pandas ops. Keep payloads out of shuffles:
extract features first, then drop/offload the binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, payload binary"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, header_hex string, "
    "fake_width int, fake_height int"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Testdata has no real media files; treat each document's UTF-8
    bytes as an opaque payload so the binary-column path has real data
    to move."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """STUB — real decode needs an image library not present in this
    container. The deterministic fake derives a plausible (w, h) from
    the byte length so downstream logic is exercisable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec library (e.g. Pillow); "
            "not available in this environment — pass fake=True for the "
            "deterministic test double"
        )
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column:
    byte length, 4-byte header hex (magic-number sniffing), and the
    (stub) decoded dimensions.

    The worker function is deliberately SELF-CONTAINED (no references to
    module-level symbols): cloudpickle then ships it by value, so Python
    workers do not need this package on their import path — the driver
    process may be launched from anywhere.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # worker-side import, no module capture

        def _decode(b: bytes) -> tuple[int, int]:
            if not fake_decode:  # mirrors decode_image's stub contract
                raise NotImplementedError(
                    "image decode requires an image codec library; "
                    "pass fake_decode=True for the deterministic test double"
                )
            n = len(b)
            return (n % 640 + 1, n % 480 + 1)

        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(_decode)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, window_idx int, start_ms double, end_ms double, "
    "n_samples int, rms double"
)


def audio_windows(
    media: DataFrame,
    sample_rate: int = 16000,
    window_samples: int = 400,
    hop_samples: int = 160,
) -> DataFrame:
    """Sliding analysis windows over an opaque audio payload — the
    25ms-window / 10ms-hop framing every speech pipeline runs before
    feature extraction. The framing math (window/hop/timestamps) is
    real; the *decode* treats each payload byte as one int8 PCM sample
    (deterministic stand-in — no audio codec exists in this container;
    swap ``_samples`` for a soundfile/ffmpeg call in production).

    Arrow-batched ``mapInPandas``; the worker closure is self-contained
    (workers never import this package). Output is metadata + per-window
    RMS only — the payload itself never leaves the scan stage."""

    def _frame(batches):
        import math as _math

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "window_idx": [],
                "start_ms": [],
                "end_ms": [],
                "n_samples": [],
                "rms": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = _np.frombuffer(bytes(payload), dtype=_np.int8)
                n = len(samples)
                idx = 0
                for start in range(0, max(n - window_samples + 1, 1), hop_samples):
                    w = samples[start : start + window_samples]
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(idx)
                    out["start_ms"].append(start * 1000.0 / sample_rate)
                    out["end_ms"].append((start + len(w)) * 1000.0 / sample_rate)
                    out["n_samples"].append(len(w))
                    # exact-integer sum of squares, then ONE division +
                    # sqrt: bit-reproducible across engines (a float
                    # mean depends on summation order — numpy's pairwise
                    # sum differs from a SQL fold), so the differential
                    # oracle can compare rms without rounding
                    ssq = int((w.astype("int64") ** 2).sum()) if len(w) else 0
                    out["rms"].append(
                        _math.sqrt(ssq / len(w)) if len(w) else 0.0
                    )
                    idx += 1
            yield _pd.DataFrame(out)

    return media.mapInPandas(_frame, schema=AUDIO_WINDOW_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the opaque payload: one row per sampled
    offset (video-frame analogue). Built-in explode over a computed
    offset sequence — no Python in the flow."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.length("payload") - 1, F.lit(0)),
                F.lit(every_n_bytes),
            )
        ).alias("frame_offset"),
    )


def average_hash(pixels, n: int = 64):
    """Perceptual average-hash (aHash — Krawetz 2011, "Looks Like It")
    of a decoded ``n``-pixel luma thumbnail held as ``array<int>``:
    bit i is set when pixel i is above the image mean. The comparison
    is ``pixel * n > sum`` — pure integers, so the threshold can never
    fall cross-engine-differently on a float mean. Returns a BIGINT
    fingerprint; feed to ``dedup.hamming_near_pairs`` for the
    banded near-duplicate join.

    This is the hash half of the image-dedup pipeline; the decode half
    (codec -> thumbnail array) is the Arrow-batched ``extract_features``
    tier (real decode env-gated in this container). Per-row expression,
    no shuffle, no Python."""
    from pyspark.sql import functions as F

    if not 1 <= n <= 64:
        raise ValueError(f"n must be in [1, 64] (BIGINT packing), got {n}")
    total = F.aggregate(
        pixels, F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    bit = None
    for i in range(n):
        # bit 63 is the sign bit of the packed BIGINT: adding -2^63
        # sets it in two's complement (1 << 63 would overflow)
        weight = -(2**63) if i == 63 else (1 << i)
        term = F.when(
            F.element_at(pixels, i + 1).cast("bigint") * n > total,
            F.lit(weight).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        bit = term if bit is None else bit + term
    return bit
