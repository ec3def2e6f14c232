"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded with Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake (documented stub): it derives "frame" metadata from
the raw bytes with pure arithmetic. Everything around it — the binary
column, the schema, the batched iterator, the partition-preserving
mapInPandas signature — is the real plumbing a decode/resize/
frame-sample stage would use (swap `_fake_decode_batch` for a PIL/
ffmpeg call and nothing else changes).

Because the fake decode is pure byte arithmetic, it has an exact DuckDB
oracle: the driver's value-hash comparison covers the whole mapInPandas
path, not just row counts.

Scale notes (100 TB of media): mapInPandas streams Arrow batches —
constant memory per task regardless of partition size; binary payloads
never pass through the driver; partitioning is inherited from the scan
(no shuffle). ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
the per-batch memory for large payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 256  # fake "frame" size for frame-sampling arithmetic

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256_hex", T.StringType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("byte_sum_mod", T.LongType(), False),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (here: UTF-8 of text; in
    production: the image/audio blob read from object storage)."""
    return docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )


def _fake_decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decode — deterministic byte arithmetic standing in for a
    real image/audio decoder (no media libs in this container).

    width  = 16 + (first byte % 64); height = 16 + (second byte % 64)
    n_frames = ceil(n_bytes / FRAME_BYTES); byte_sum_mod = sum(bytes) % 100003
    """
    import hashlib

    payloads = batch["payload"]
    n_bytes = payloads.map(len)
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "sha256_hex": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            "width": payloads.map(
                lambda b: 16 + (b[0] % 64) if len(b) > 0 else None
            ).astype("Int64"),
            "height": payloads.map(
                lambda b: 16 + (b[1] % 64) if len(b) > 1 else None
            ).astype("Int64"),
            "n_frames": ((n_bytes + FRAME_BYTES - 1) // FRAME_BYTES).astype("int64"),
            "byte_sum_mod": payloads.map(lambda b: sum(bytes(b)) % 100003).astype("int64"),
        }
    )
    return out


ALT_FRAME_BYTES = 128  # the alt decoder's fake frame size
ALT_SUM_MOD = 99991


def alt_decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """A second deterministic decoder with DIFFERENT arithmetic than
    the default stub — exists to exercise the pluggable-decoder path
    (EngineConfig.multimodal_decoder) by VALUE: a driver query wired
    through the config must produce these numbers, not the default
    stub's, or the plumbing silently ignores the hook.

    width = 8 + (last byte % 96); height = 8 + (first byte % 96)
    n_frames = ceil(n_bytes / ALT_FRAME_BYTES)
    byte_sum_mod = (31 * sum(bytes) + n_bytes) % ALT_SUM_MOD
    """
    import hashlib

    payloads = batch["payload"]
    n_bytes = payloads.map(len)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "sha256_hex": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            "width": payloads.map(
                lambda b: 8 + (b[-1] % 96) if len(b) > 0 else None
            ).astype("Int64"),
            "height": payloads.map(
                lambda b: 8 + (b[0] % 96) if len(b) > 0 else None
            ).astype("Int64"),
            "n_frames": (
                (n_bytes + ALT_FRAME_BYTES - 1) // ALT_FRAME_BYTES
            ).astype("int64"),
            "byte_sum_mod": payloads.map(
                lambda b: (31 * sum(bytes(b)) + len(b)) % ALT_SUM_MOD
            ).astype("int64"),
        }
    )


def alt_decode_oracle(corpus_cte: str) -> str:
    """Exact SQL mirror of alt_decode_batch (ASCII text: byte ==
    codepoint)."""
    byte_sum = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_filter(string_split_regex(text, ''), c -> c <> ''), "
        "c -> CAST(unicode(c) AS BIGINT))), (a, c) -> a + c)"
    )
    return f"""WITH {corpus_cte}
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256_hex,
       CASE WHEN length(text) > 0
            THEN 8 + (unicode(substr(text, length(text), 1)) % 96) END AS width,
       CASE WHEN length(text) > 0
            THEN 8 + (unicode(substr(text, 1, 1)) % 96) END AS height,
       CAST((octet_length(encode(text)) + {ALT_FRAME_BYTES - 1}) // {ALT_FRAME_BYTES}
            AS BIGINT) AS n_frames,
       CAST((31 * {byte_sum} + octet_length(encode(text))) % {ALT_SUM_MOD} AS BIGINT)
         AS byte_sum_mod
FROM corpus
"""


def decode_metadata(docs: DataFrame, decoder=None) -> DataFrame:
    """Binary payload -> typed metadata via Arrow-batched mapInPandas.

    `decoder` is a pluggable pd.DataFrame -> pd.DataFrame batch
    function (the TransformContractDataStruct pattern — function-valued
    config, /root/reference/internal/transform/contract_data.go:33-46);
    it must emit DECODED_SCHEMA columns. Defaults to the deterministic
    stub `_fake_decode_batch`; a production deployment passes e.g. a
    PIL/ffmpeg-backed callable (EngineConfig.multimodal_decoder) and
    nothing else changes — schema, batching, partitioning are fixed
    here."""
    binary = with_binary_payload(docs)
    decode = decoder or _fake_decode_batch

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decode(batch)

    return binary.mapInPandas(gen, schema=DECODED_SCHEMA)


def decode_metadata_oracle(corpus_cte: str) -> str:
    """Exact SQL mirror of the fake decode (text is ASCII so byte ==
    codepoint; octet_length over the encoded blob is the real byte
    count either way)."""
    byte_sum = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_filter(string_split_regex(text, ''), c -> c <> ''), "
        "c -> CAST(unicode(c) AS BIGINT))), (a, c) -> a + c) % 100003"
    )
    return f"""WITH {corpus_cte}
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256_hex,
       CASE WHEN length(text) > 0
            THEN 16 + (unicode(substr(text, 1, 1)) % 64) END AS width,
       CASE WHEN length(text) > 1
            THEN 16 + (unicode(substr(text, 2, 1)) % 64) END AS height,
       CAST((octet_length(encode(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS BIGINT)
         AS n_frames,
       CAST({byte_sum} AS BIGINT) AS byte_sum_mod
FROM corpus
"""


def frame_sample(docs: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling: one row per sampled FRAME_BYTES-chunk ("frame")
    of the payload, keeping every `every`-th frame — the Spark-side
    shape of video frame extraction (posexplode of a chunked binary).
    JVM-side only: substring on binary, no Python."""
    binary = with_binary_payload(docs).filter(F.octet_length("payload") > 0)
    chunks = F.expr(
        f"transform(sequence(0, cast((octet_length(payload) - 1) div {FRAME_BYTES} as int)), "
        f"i -> substring(payload, i * {FRAME_BYTES} + 1, {FRAME_BYTES}))"
    )
    return (
        binary.select("doc_id", F.posexplode(chunks).alias("pos", "frame"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("frame_idx"),
            F.octet_length("frame").cast("long").alias("frame_bytes"),
        )
        .filter((F.col("frame_idx") % every) == 0)
    )


def frame_sample_oracle(corpus_cte: str, every: int = 4) -> str:
    return f"""WITH {corpus_cte},
frames AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS frame_idx,
         CAST(LEAST({FRAME_BYTES}, octet_length(encode(text)) - i * {FRAME_BYTES}) AS BIGINT)
           AS frame_bytes
  FROM corpus,
       LATERAL (SELECT UNNEST(generate_series(0,
                  (octet_length(encode(text)) - 1) // {FRAME_BYTES})) AS i) u
  WHERE octet_length(encode(text)) > 0
)
SELECT doc_id, frame_idx, frame_bytes FROM frames WHERE frame_idx % {every} = 0
"""
