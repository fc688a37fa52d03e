"""Multimodal-column queries — binary payload + typed-metadata
pipeline over ``documents`` (payloads are the UTF-8 text bytes, so
DuckDB's ``encode()`` reproduces them for the oracle).

The decode/feature steps run through the fake codec backend
(multimodal/ops.py) — deterministic, so even the mapInPandas stages
are oracle-checkable where the arithmetic is SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axolotls_spark import multimodal as M
from axolotls_spark.io.sources import load_table
from axolotls_spark.registry import register


@register(
    "multimodal_manifest",
    oracle="""
    SELECT
        doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
        octet_length(encode(text))::BIGINT AS byte_len,
        (64 + octet_length(encode(text)) % 512)::INT  AS width,
        (64 + (octet_length(encode(text)) * 7) % 512)::INT AS height,
        ceil(octet_length(encode(text)) / 256.0)::INT AS n_frames,
        md5(text) AS payload_md5
    FROM documents
    """,
    tags=("multimodal", "binary", "metadata"),
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct; emits scalars (not raw
    bytes) so the hash compare is engine-neutral."""
    docs = load_table(spark, sf_dir, "documents")
    m = M.attach_payload(docs)
    return m.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "multimodal_decode",
    oracle="""
    SELECT
        doc_id,
        (64 + octet_length(encode(text)) % 512)::INT       AS dec_width,
        (64 + (octet_length(encode(text)) * 7) % 512)::INT AS dec_height
    FROM documents
    """,
    tags=("multimodal", "decode", "mapInPandas", "pandas-udf"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (fake codec): the Python
    stage's output must match the SQL restatement of the same
    deterministic arithmetic — certifying the batch plumbing,
    not the codec."""
    docs = load_table(spark, sf_dir, "documents")
    dec = M.decode_media(M.attach_payload(docs), backend="fake")
    return dec.select("doc_id", "dec_width", "dec_height")


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, UNNEST(range(0, ceil(octet_length(encode(text)) / 256.0)::INT, 4))::INT AS frame_idx
    FROM documents
    WHERE doc_id % 3 = 2
    """,
    tags=("multimodal", "video", "frame-sample", "explode"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling of video payloads; frame indices are
    oracle-checked, frame bytes covered by tests (DuckDB lacks blob
    slicing ergonomics worth duplicating)."""
    docs = load_table(spark, sf_dir, "documents")
    frames = M.frame_sample(M.attach_payload(docs), every=4)
    return frames.select("doc_id", "frame_idx")


@register(
    "multimodal_byte_histogram",
    oracle=None,  # numpy histogram featurizer; checked by tests
    # (deterministic) rather than a SQL restatement.
    tags=("multimodal", "feature-extraction", "mapInPandas", "vectorized"),
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = M.byte_histogram_features(M.attach_payload(docs), bins=16)
    return feats.select("doc_id", "feat_norm", F.col("features"))


@register(
    "multimodal_tile_grid",
    oracle="""
    WITH img AS (
        SELECT doc_id,
               (64 + octet_length(encode(text)) % 512) AS width,
               (64 + (octet_length(encode(text)) * 7) % 512) AS height
        FROM documents WHERE doc_id % 3 = 0
    ),
    g AS (
        SELECT doc_id, width, height,
               CAST(ceil(width / 224.0) AS INT) AS nx,
               CAST(ceil(height / 224.0) AS INT) AS ny
        FROM img
    )
    SELECT doc_id,
           CAST(j * nx + i AS BIGINT) AS tile_id,
           CAST(i * 224 AS BIGINT) AS x0,
           CAST(j * 224 AS BIGINT) AS y0,
           CAST(LEAST(224, width - i * 224) AS BIGINT) AS tile_w,
           CAST(LEAST(224, height - j * 224) AS BIGINT) AS tile_h
    FROM g
    CROSS JOIN UNNEST(range(0, ny)) AS tj(j)
    CROSS JOIN UNNEST(range(0, nx)) AS ti(i)
    """,
    tags=("multimodal", "tiles", "vit", "map-only", "explode"),
)
def multimodal_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch manifest: every image exploded into its
    224×224 tile grid with clipped edge tiles — the coordinate plan
    a vision encoder's crop/resize stage consumes, derived entirely
    from the typed metadata struct.

    Scale shape: map-only (filter → two bounded explodes → integer
    arithmetic); the binary payload column is pruned out of the scan
    because only metadata is referenced — the central promise of the
    payload+metadata model at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    return M.tile_grid(M.attach_payload(docs))
