"""Multimodal contract queries + oracles (mm_*).

Mechanically split from the single-file contract.py registry (r4 verdict
item 8): block order, comments and strings preserved verbatim; the
public surface is re-exported unchanged through ``fagi_spark.contract``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import (cells, curation, extract, fuse, joins,  # noqa: F401
                metadata_fuse, textops, vector)
from ..discover import literal_kind_filter, tf_unique_filter  # noqa: F401

from ._core import (M_PER_DEG, _EV_LAT_SQL, _EV_LON_SQL, _dlit,  # noqa: F401
                    _event_pts, _fmt2, _line_wkt, _t)  # noqa: F401


def q_mm_html_decode(spark, sf_dir):
    """Multimodal: html binary -> text, asserting the byte-identical
    text-per-url invariant inline (mismatch count must be 0)."""
    from .. import multimodal, synth
    pages = synth.synth_pages(spark, 500)
    dec = multimodal.decode_html_text(pages)
    j = pages.join(dec, "url")
    return (j.select("url", (F.col("decoded_text") == F.col("text")).alias("text_identical"))
            .filter(F.col("text_identical")))


def q_mm_html_roundtrip(spark, sf_dir):
    """Multimodal HTML decode, value-exact: wrap each document's text
    in html bytes, run the real Arrow decode kernel, and compare the
    decoded text against the source column (the byte-identical-text
    invariant, checkable in SQL because the wrapping is trivial)."""
    from .. import multimodal
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"))
    return multimodal.decode_html_text(pages)


O_MM_HTML_ROUNDTRIP = """SELECT CAST(doc_id AS STRING) AS url, text AS decoded_text
FROM documents"""


def q_mm_image_features(spark, sf_dir):
    """Multimodal: Arrow-batched image decode/feature plumbing (fake
    codec — deterministic sha256 pseudo-decode; real codec site raises,
    see multimodal.py). Runs the real ``mapInPandas`` kernel over the
    driver's documents table (payload = UTF-8 bytes of ``text``) so the
    fake decode mirrors into DuckDB's ``sha256``; the float feature_vec
    is projected to exact integer bytes (posexplode) because the
    driver's canonicalizer cannot hash array columns."""
    from .. import multimodal
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode("text", "utf-8").alias("payload"))
    feats = multimodal.image_features(docs, "payload", decode="fake")
    # feature_vec[i] = byte_i / 255.0 in float32; *255 + round recovers
    # the byte exactly (max abs error ~1.5e-5 << 0.5)
    bytes_arr = F.transform("feature_vec",
                            lambda x: F.round(x * F.lit(255.0)).cast("int"))
    return (feats.select("url", "width", "height", "channels", "mean_luma",
                         F.posexplode(bytes_arr).alias("dim", "byte_val")))


def _sha_byte(i: int, hx: str = "hx") -> str:
    """DuckDB: i-th byte of a sha256 hex digest as an integer."""
    return (f"((STRPOS('0123456789abcdef', SUBSTR({hx}, {2 * i + 1}, 1))-1)*16"
            f" + (STRPOS('0123456789abcdef', SUBSTR({hx}, {2 * i + 2}, 1))-1))")


O_MM_IMAGE_FEATURES = f"""WITH h AS (
  SELECT CAST(doc_id AS STRING) AS url, SHA256(text) AS hx FROM documents),
b AS (
  SELECT url, {', '.join(f'{_sha_byte(i)} AS b{i}' for i in range(8))},
         {_sha_byte(2)} AS luma_b
  FROM h)
SELECT url,
       CAST(16 + b0 % 64 AS INT) AS width,
       CAST(16 + b1 % 64 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(luma_b AS DOUBLE) / 255.0 AS mean_luma,
       CAST(g.i AS INT) AS dim,
       CAST([b0, b1, b2, b3, b4, b5, b6, b7][g.i + 1] AS INT) AS byte_val
FROM b, (SELECT UNNEST(RANGE(0, 8)) AS i) g"""


def q_mm_media_stats(spark, sf_dir):
    """Per-language media-payload inventory over with_media_meta
    (multimodal.py): byte-size rollup of the binary column a
    multimodal corpus audit runs first — n_bytes stays JVM-side
    (F.length on binary == OCTET_LENGTH(ENCODE(...))), the rollup is
    one partial-agg shuffle."""
    from .. import multimodal
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "utf-8").alias("html"))
    m = multimodal.with_media_meta(pages)
    return (m.groupBy("lang", "media_kind")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_bytes").cast("long").alias("total_bytes"),
                 F.min("n_bytes").cast("long").alias("min_bytes"),
                 F.max("n_bytes").cast("long").alias("max_bytes")))


O_MM_MEDIA_STATS = """WITH m AS (
  SELECT COALESCE(lang, 'und') AS lang, 'html' AS media_kind,
         CAST(OCTET_LENGTH(ENCODE('<html><body>' || text || '</body></html>'))
              AS BIGINT) AS n_bytes
  FROM documents)
SELECT lang, media_kind, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes
FROM m GROUP BY lang, media_kind"""


def q_mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (multimodal.frame_sample, fake
    decode): one row per sampled frame with the deterministic frame
    count (1 + payload[0] % max_frames) and the per-frame sha32 —
    value-exact because the pseudo-decode is sha256-of-bytes and the
    first payload byte is the text's leading ASCII char (the corpus
    is ASCII-leading; the oracle mirrors sha bytes like
    O_MM_IMAGE_FEATURES)."""
    from .. import multimodal
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(F.col("doc_id").cast("string").alias("url"),
                        F.encode("text", "utf-8").alias("payload"))
    out = multimodal.frame_sample(pages, every_ms=40, max_frames=6)
    return out.select("url", F.col("frame_idx").cast("int").alias("frame_idx"),
                      F.col("ts_ms").cast("long").alias("ts_ms"), "frame_sha")


_FS_SHA32 = ("CASE WHEN ({b0}) >= 128 THEN "
             "(({b0})*16777216 + ({b1})*65536 + ({b2})*256 + ({b3})) "
             "- 4294967296 ELSE "
             "(({b0})*16777216 + ({b1})*65536 + ({b2})*256 + ({b3})) END")

O_MM_FRAME_SAMPLE = f"""WITH fs_n AS (
  SELECT CAST(doc_id AS STRING) AS url, text,
         1 + ascii(substr(text, 1, 1)) % 6 AS n_frames
  FROM documents),
fs_f AS (
  SELECT url, text, CAST(g.i AS INT) AS frame_idx
  FROM fs_n, (SELECT UNNEST(RANGE(0, 6)) AS i) g
  WHERE g.i < n_frames),
fs_h AS (
  SELECT url, frame_idx,
         SHA256(text || CAST(frame_idx AS VARCHAR)) AS hx
  FROM fs_f)
SELECT url, frame_idx, CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
       CAST({_FS_SHA32.format(b0=_sha_byte(0), b1=_sha_byte(1),
                              b2=_sha_byte(2), b3=_sha_byte(3))}
            AS INT) AS frame_sha
FROM fs_h"""
