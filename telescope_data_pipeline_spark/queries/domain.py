"""Domain-kernel demos: multimodal columns and (phase 2) the photometry
pipeline kernels. These operate on in-memory deterministic fixtures (the
driver tables carry no binary/image columns), so they register as
rows-only checks; their numeric correctness is pinned by golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query


@query("q_media_features", oracle=None)  # binary fixture: rows-only check
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image pipeline: binary payload column → mapInPandas
    decode (stubbed codec) → per-image feature vector. Demonstrates the
    opaque-binary + typed-metadata column convention (schemas.MEDIA) and
    the Arrow-batched decode stage."""
    from ..operators.multimodal import extract_image_features, make_fake_media

    return extract_image_features(make_fake_media(spark))


@query("q_media_frames", oracle=None)  # binary fixture: rows-only check
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as a UDTF-shaped mapInPandas: one input video
    row → N frame rows, exploded inside the Arrow batch (no shuffle)."""
    from ..operators.multimodal import make_fake_media, sample_frames

    return sample_frames(make_fake_media(spark), every_s=1.0)
