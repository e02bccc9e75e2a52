"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference addition. Design (the part that must be right at 100 TB):

- media lives in an opaque ``binary`` column with a small typed metadata
  struct alongside; Spark shuffles/stores the bytes untouched;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — bytes cross the JVM↔Python boundary once per
  batch, and each stage declares an explicit output schema so downstream
  operators stay columnar;
- real codec work (PIL/ffmpeg) is stubbed in this container: ``decode_image``
  raises NotImplementedError by contract, and the pipeline runs with a
  deterministic fake extractor so the plumbing (schema, batching, partition
  preservation) is fully testable. Swap ``_FAKE_DECODER`` for a real one in
  production — the Spark-side contract does not change.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.case import QueryCase
from datafusion_table_providers_spark.operators.relational import _t

META_SCHEMA = (
    "doc_id long, n_bytes int, first_byte int, head_hash string, fake_width int"
)


def decode_image(payload: bytes):
    """Real decode path — requires an image codec, not present here.

    Production: ``PIL.Image.open(io.BytesIO(payload))``. The container has
    no image libraries, so this is an explicit stub by design.
    """
    raise NotImplementedError(
        "image codecs are unavailable in this environment; "
        "use extract_fake_metadata for the plumbing path"
    )


def _fake_meta(doc_id: int, payload: bytes):
    """Deterministic fake 'decode': cheap byte statistics standing in for
    width/height/etc. Keeps the pipeline end-to-end testable and
    oracle-checkable."""
    import hashlib

    return {
        "doc_id": doc_id,
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "head_hash": hashlib.md5(payload).hexdigest()[:8],
        "fake_width": (len(payload) * 7) % 1024,
    }


def extract_metadata_batches(batches) -> Iterator:
    import pandas as pd

    for pdf in batches:
        yield pd.DataFrame(
            [_fake_meta(i, p) for i, p in zip(pdf["doc_id"], pdf["payload"])]
        )


# --- m01: binary column pipeline, oracle-checked --------------------------
def m01_multimodal_meta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return with_payload.mapInPandas(extract_metadata_batches, META_SCHEMA)


# The fake decoder is SQL-expressible BYTE-exactly: octet_length(encode())
# counts utf-8 bytes, DuckDB md5(VARCHAR) hashes the string's utf-8 bytes
# (same value as Python md5 over the payload), and the first BYTE (not the
# first codepoint — 0xC3 for 'ö', not 246) decodes from the hex dump.
M01_SQL = """
WITH b AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS nb,
         SUBSTR(hex(encode(text)), 1, 2) AS h1
  FROM documents
)
SELECT doc_id,
       CAST(nb AS INTEGER) AS n_bytes,
       CAST(CASE WHEN nb = 0 THEN -1 ELSE
         (strpos('0123456789ABCDEF', SUBSTR(h1, 1, 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', SUBSTR(h1, 2, 1)) - 1)
       END AS INTEGER) AS first_byte,
       SUBSTR(md5(text), 1, 8) AS head_hash,
       CAST((nb * 7) % 1024 AS INTEGER) AS fake_width
FROM b
"""


# --- m02: frame-sampling shape (rows-only check: not SQL-expressible) -----
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def m02_frame_sample(spark, sf_dir):
    """Fan one payload out into N deterministic 'frames' (the video
    frame-sampling shape: one row in → k rows out, bytes sliced per frame).
    Shows the 1:N mapInPandas contract; no SQL oracle by design."""
    import pandas as pd

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    with_payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def sample(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(payload) // 4)
                for k in range(3):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "frame_bytes": bytes(payload[k * n : (k + 1) * n]),
                        }
                    )
            yield pd.DataFrame(rows)

    frames = with_payload.mapInPandas(sample, FRAME_SCHEMA)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_bytes").alias("frame_len")
    )


M02_SQL = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
SELECT doc_id, k AS frame_idx,
       CAST(CASE WHEN k < 2 THEN
              LEAST(GREATEST(nb // 4, 1), GREATEST(nb - k * GREATEST(nb // 4, 1), 0))
            ELSE LEAST(GREATEST(nb // 4, 1),
                       GREATEST(nb - 2 * GREATEST(nb // 4, 1), 0))
       END AS INTEGER) AS frame_len
FROM b, UNNEST([0, 1, 2]) AS t(k)
WHERE doc_id < 50
"""


# --- m03: resize (1:1 payload transform, bytes out smaller) ---------------
RESIZE_SCHEMA = "doc_id long, out_bytes int, out_hash string"


def m03_resize(spark, sf_dir):
    """Resize shape: payload in → transformed (smaller) payload out, 1:1.
    The fake 'resampler' decodes the payload (its 'codec' is utf-8), keeps
    the first half of the decoded units, and re-encodes — the same
    decode→transform→re-encode shape as a real image resize (PIL
    thumbnail), which drops into this mapInPandas slot with the same
    schema contract. Working on decoded units (not raw byte slices) keeps
    the output a valid encoding for any input."""
    import pandas as pd  # noqa: F401 — executor-side import

    d = _t(spark, sf_dir, "documents")
    wp = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def resize(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                chars = bytes(payload).decode("utf-8")
                half = chars[: (len(chars) + 1) // 2].encode("utf-8")
                out.append(
                    {
                        "doc_id": doc_id,
                        "out_bytes": len(half),
                        "out_hash": hashlib.md5(half).hexdigest()[:8],
                    }
                )
            yield pd.DataFrame(out)

    return wp.mapInPandas(resize, RESIZE_SCHEMA)


M03_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(SUBSTR(text, 1, (LENGTH(text) + 1) // 2)))
            AS INTEGER) AS out_bytes,
       SUBSTR(md5(SUBSTR(text, 1, (LENGTH(text) + 1) // 2)), 1, 8) AS out_hash
FROM documents
"""


# --- m04: feature extraction (binary → fixed-size vector) -----------------
FEAT_SCHEMA = "doc_id long, feat array<int>, feat_l1 int"


def m04_features(spark, sf_dir):
    """Feature-extract shape: payload in → fixed-width vector out. The fake
    extractor counts byte classes (space/'a'/'e'/total) — a real extractor
    (CLIP image encoder, mel spectrogram) replaces the inner function; the
    array column contract and Arrow batching stay identical."""
    d = _t(spark, sf_dir, "documents")
    wp = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                feat = [b.count(b" "), b.count(b"a"), b.count(b"e"), len(b)]
                out.append(
                    {"doc_id": doc_id, "feat": feat, "feat_l1": sum(feat)}
                )
            yield pd.DataFrame(out)

    return wp.mapInPandas(extract, FEAT_SCHEMA)


# ascii needle counts are byte==char safe even in unicode text (utf-8
# continuation bytes are >= 0x80, so they can never equal an ascii byte);
# only the TOTAL length must count bytes, not chars.
M04_SQL = """
SELECT doc_id,
       [CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS INTEGER),
        CAST(LENGTH(text) - LENGTH(REPLACE(text, 'a', '')) AS INTEGER),
        CAST(LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS INTEGER),
        CAST(octet_length(encode(text)) AS INTEGER)] AS feat,
       CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
          + (LENGTH(text) - LENGTH(REPLACE(text, 'a', '')))
          + (LENGTH(text) - LENGTH(REPLACE(text, 'e', '')))
          + octet_length(encode(text)) AS INTEGER) AS feat_l1
FROM documents
"""


from datafusion_table_providers_spark.operators.relational import _merged

# merged window entries: 2 driver rows certify all 4 multimodal shapes
m01b_meta_frames, M01B_SQL = _merged(
    ("m01", m01_multimodal_meta, M01_SQL),
    ("m02", m02_frame_sample, M02_SQL),
)
# Window twin: serialize the `feat` array to CSV on both sides (the driver's
# canonicalizer can't hash ndarray cells); m04_features stays the
# array-returning production API.
from datafusion_table_providers_spark.operators.relational import (
    _stringify_arrays,
)

_m04_w, _M04_W_SQL = _stringify_arrays(m04_features, M04_SQL, ["feat"])
m03b_resize_features, M03B_SQL = _merged(
    ("m03", m03_resize, M03_SQL),
    ("m04", _m04_w, _M04_W_SQL),
)

SUITE = {
    "m01_multimodal_meta": QueryCase(
        m01_multimodal_meta, M01_SQL, "binary metadata via mapInPandas"
    ),
    "m02_frame_sample": QueryCase(
        m02_frame_sample, M02_SQL, "1:N frame sampling via mapInPandas"
    ),
    "m03_resize": QueryCase(
        m03_resize, M03_SQL, "1:1 payload resize via mapInPandas"
    ),
    "m04_features": QueryCase(
        m04_features, M04_SQL, "binary → fixed-width feature vector"
    ),
    "m01b_meta_frames": QueryCase(
        m01b_meta_frames, M01B_SQL, "metadata + frame sampling (merged)"
    ),
    "m03b_resize_features": QueryCase(
        m03b_resize_features, M03B_SQL, "resize + feature extraction (merged)"
    ),
}
