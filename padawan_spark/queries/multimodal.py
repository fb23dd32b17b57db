"""Multimodal-column queries: binary payloads synthesized from document
text (utf-8 encode), then processed through the binary-column operators
in :mod:`padawan_spark.functions.multimodal`.

``mm_binary_stats`` is pure JVM-side binary expression work;
``mm_fake_decode`` drives the Arrow-batched ``mapInPandas`` decode
plumbing with the deterministic stand-in codec (real codecs are stubbed
— no media libs in this container) — its arithmetic is mirrored in the
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.multimodal import extract_image_features, fake_decode_image
from .registry import load, query


@query("mm_binary_stats", oracle="""
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  lower(substr(hex(encode(text)), 1, 8)) AS header_hex,
  sha256(text) AS digest
FROM documents
""")
def mm_binary_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    b = F.expr("cast(text as binary)")
    return d.select(
        "doc_id",
        F.length(b).cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(cast(text as binary), 1, 4)")))
        .alias("header_hex"),
        F.sha2(b, 256).alias("digest"),
    )


@query("mm_fake_decode", oracle="""
SELECT doc_id,
  CAST(64 + octet_length(encode(text)) % 191 AS INTEGER) AS width,
  CAST(64 + (octet_length(encode(text)) * 31) % 191 AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS channels,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""")
def mm_fake_decode(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr("cast(text as binary)").alias("payload"))
    return fake_decode_image(d)


@query("mm_byte_histogram", oracle=None)  # non-SQL: python feature UDF
def mm_byte_histogram(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr("cast(text as binary)").alias("payload"))
    feats = extract_image_features(d)
    # surface a scalar per doc so the rows-only check is meaningful
    return feats.select(
        "doc_id",
        F.expr("round(aggregate(features, 0D, (a, x) -> a + x), 6)")
        .alias("l1_norm"),
        F.expr("size(features)").alias("dim"))
