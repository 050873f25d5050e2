"""Multimodal columns (north-star extension, SURVEY 2.10): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode / feature-extract / frame-sample stages as
Arrow-batched pandas stages over ``mapInPandas``.

The container has no image/audio codecs, so the decode step itself is
a clearly-marked STUB (``_stub_decode``) that derives deterministic
fake media properties from the payload's md5 digest -- but everything
Spark-side is real and is what would ship at 100 TB:

- payloads are true ``BinaryType`` columns (``encode(text)`` stands in
  for reading media bytes; a production source reads
  ``spark.read.format("binaryFile")`` or parquet with a binary column);
- decode runs in ``mapInPandas`` so each Python worker sees Arrow
  record batches of (id, kind, bytes) -- the exact shape a Pillow /
  ffmpeg UDF would consume -- and never a per-row Python crossing;
- the metadata path (byte length, digest, kind) never leaves the JVM;
- frame sampling composes a Python stage with JVM-side
  ``sequence``/``explode`` -- the mixed plan a real pipeline has.

At 100 TB: payload columns dominate storage, so the scan must prune
them unless the stage consumes bytes (parquet column pruning gives
this for free -- ``mm_binary_metadata`` reads only the text column it
derives from, and a real media table would store metadata beside the
blob so filters run without touching bytes); decode is embarrassingly
parallel, sized by ``spark.sql.files.maxPartitionBytes`` against
executor memory since batches hold raw bytes in Arrow buffers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table


def media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, kind, payload:binary).

    Stand-in media table: the utf-8 bytes of ``text`` act as the blob
    (deterministic, so the DuckDB oracle can recompute digests), the
    ``source`` column as the media kind.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("source").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id, source AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents ORDER BY doc_id
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the blob column -- pure JVM, no decode."""
    media = media_payloads(spark, sf_dir)
    return media.select(
        "doc_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# STUB decoder. A real deployment replaces the body of _stub_decode
# with Pillow / soundfile / pyav calls over the same bytes; the
# signature, Arrow batch shape, and output schema stay identical.
# Properties derive from md5(payload) so the oracle can verify the
# plumbing end to end without any codec in the container.
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, "
    "width bigint, height bigint, n_frames bigint"
)


def _stub_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB: deterministic fake (width, height, n_frames) from bytes.

    Replace with a real decoder when codecs are available; raise-path
    kept explicit so callers see this is not a real decode.
    """
    h = hashlib.md5(payload).hexdigest()
    width = int(h[0:2], 16) % 64 + 16
    height = int(h[2:4], 16) % 64 + 16
    n_frames = int(h[4:6], 16) % 7 + 1
    return width, height, n_frames


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: Arrow batch of blobs in, media properties out."""
    for pdf in batches:
        props = pdf["payload"].map(_stub_decode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len),
                "width": props.map(lambda t: t[0]),
                "height": props.map(lambda t: t[1]),
                "n_frames": props.map(lambda t: t[2]),
            }
        )


_DECODED_SQL = """
      SELECT doc_id, source AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 + 16 AS width,
             ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 + 16 AS height,
             ('0x' || substr(md5(text), 5, 2))::BIGINT % 7 + 1 AS n_frames
      FROM documents
"""


def decoded_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_payloads(spark, sf_dir).mapInPandas(
        decode_batches, schema=_DECODE_SCHEMA
    )


@register(
    "mm_decode_stats",
    oracle=f"""
    WITH d AS ({_DECODED_SQL})
    SELECT kind, count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(width * height) AS BIGINT) AS total_pixels,
           CAST(max(n_frames) AS BIGINT) AS max_frames
    FROM d GROUP BY kind ORDER BY kind
    """,
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (stub) every payload, aggregate media properties by kind.

    Plan shape: Scan -> mapInPandas (Arrow) -> partial agg -> final
    agg; the only shuffle carries one row per (partition, kind).
    """
    d = decoded_media(spark, sf_dir)
    return (
        d.groupBy("kind")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.col("width") * F.col("height")).alias("total_pixels"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("kind")
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH d AS ({_DECODED_SQL})
    SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx,
           width, height
    FROM d WHERE kind = 'src1'
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling: Python decode stage composed with a
    JVM-side sequence/explode -- rows fan out without re-entering
    Python."""
    d = decoded_media(spark, sf_dir).filter(F.col("kind") == "src1")
    return (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.lit(2).cast("long"))
            ).alias("frame_idx"),
            "width",
            "height",
        )
        .orderBy("doc_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# Audio-style windowed energy: the blob interpreted as int8 PCM,
# chunked into fixed 64-sample windows, per-window energy = sum of
# squared samples (exact integers). The numpy stage (frombuffer ->
# reduceat) is the real DSP plumbing a soundfile/librosa UDF would
# run over the same Arrow batches; because the stand-in payload is
# ASCII, DuckDB can recompute every sample as ascii(text[i]) and the
# differential gate checks the WHOLE pipeline -- batch shape, window
# boundaries, accumulation -- with zero codec dependencies.
# At 100 TB, same scan discipline as the decode stage: bytes only
# reach Python for rows that need them, in Arrow batches, one pass.
# ---------------------------------------------------------------------------

_WIN_SAMPLES = 64

_ENERGY_SCHEMA = (
    "doc_id bigint, n_samples bigint, n_windows bigint, "
    "total_energy bigint, max_win_energy bigint"
)


def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.int8).astype(np.int64)
            n = len(samples)
            sq = samples * samples
            starts = np.arange(0, n, _WIN_SAMPLES)
            wins = np.add.reduceat(sq, starts) if n else np.array([], dtype=np.int64)
            rows.append(
                (
                    doc_id,
                    n,
                    len(starts),
                    int(sq.sum()),
                    int(wins.max()) if len(wins) else 0,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_samples",
                "n_windows",
                "total_energy",
                "max_win_energy",
            ],
        )


@register(
    "mm_audio_energy",
    # Oracle iterates UTF-8 BYTES (hex(encode(text)), two hex chars per
    # byte) with int8 wraparound for codes > 127, exactly matching the
    # Spark side's np.frombuffer(payload, dtype=int8) -- so a testdata
    # regeneration that introduces non-ASCII text cannot silently skew
    # the gate. Empty documents are emitted as all-zero rows on BOTH
    # sides (Spark's numpy path yields (0,0,0,0); the oracle LEFT JOINs
    # them back in with coalesce).
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, pos,
             CASE WHEN code > 127 THEN code - 256 ELSE code END AS sample
      FROM (
        SELECT doc_id, pos,
               ('0x' || substr(hx, 2 * pos - 1, 2))::BIGINT AS code
        FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS pos FROM b)
      )
    ),
    w AS (
      SELECT doc_id, (pos - 1) // {_WIN_SAMPLES} AS win,
             sum(sample * sample) AS energy, count(*) AS n
      FROM s GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, sum(n) AS n_samples, count(*) AS n_windows,
             sum(energy) AS total_energy, max(energy) AS max_win_energy
      FROM w GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(coalesce(agg.n_samples, 0) AS BIGINT) AS n_samples,
           CAST(coalesce(agg.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(agg.total_energy, 0) AS BIGINT) AS total_energy,
           CAST(coalesce(agg.max_win_energy, 0) AS BIGINT) AS max_win_energy
    FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_payloads(spark, sf_dir)
    return (
        media.select("doc_id", "payload")
        .mapInPandas(energy_batches, schema=_ENERGY_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Resize stage (the remaining stage of the brief's decode /
# feature-extract / resize / frame-sample list): aspect-preserving
# fit into a 224x224 budget — the canonical vision-model preprocessing
# step. The pixel transform itself is the STUB part (a real deployment
# calls Pillow's img.resize at the marked site); the target-geometry
# arithmetic is exact integer floor math, so the DuckDB oracle verifies
# the whole Arrow pipeline without a codec. Runs as a second
# mapInPandas stage OVER the decode stage — the composed
# Python->Python plan a real preprocessing pipeline has (Spark fuses
# adjacent mapInPandas stages into one Python worker pass).
# ---------------------------------------------------------------------------

_RESIZE_TARGET = 224

_RESIZE_SCHEMA = (
    "doc_id bigint, kind string, width bigint, height bigint, "
    "target_w bigint, target_h bigint, out_bytes bigint"
)


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: decoded props in, resize geometry out.

    A real implementation resizes pixel buffers here (img.resize
    ((tw, th))); the stub emits the geometry a resize would produce.
    """
    for pdf in batches:
        longest = pdf[["width", "height"]].max(axis=1)
        tw = (pdf["width"] * _RESIZE_TARGET // longest).clip(lower=1)
        th = (pdf["height"] * _RESIZE_TARGET // longest).clip(lower=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "width": pdf["width"],
                "height": pdf["height"],
                "target_w": tw,
                "target_h": th,
                "out_bytes": tw * th * 3,
            }
        )


@register(
    "mm_image_resize",
    oracle=f"""
    WITH d AS ({_DECODED_SQL}),
    r AS (
      SELECT doc_id, kind, width, height,
             greatest(width * {_RESIZE_TARGET} // greatest(width, height), 1)
               AS target_w,
             greatest(height * {_RESIZE_TARGET} // greatest(width, height), 1)
               AS target_h
      FROM d
    )
    SELECT doc_id, kind, width, height, target_w, target_h,
           target_w * target_h * 3 AS out_bytes
    FROM r ORDER BY doc_id
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = decoded_media(spark, sf_dir).mapInPandas(
        resize_batches, schema=_RESIZE_SCHEMA
    )
    return resized.orderBy("doc_id")


# ---------------------------------------------------------------------------
# Shot-boundary detection: the temporal-video stage the decode /
# resize / frame-sample list doesn't cover. The blob is read as
# consecutive _FRAME_BYTES-byte frames; per-frame intensity = sum of
# int8 samples (exact integers), and a boundary is a frame-to-frame
# intensity jump above _SHOT_THRESHOLD -- the classic
# histogram-difference cut detector with the pixel histogram stubbed
# to a byte sum (a real deployment swaps in a pyav frame iterator at
# the same numpy site). One Arrow pass computes everything per doc;
# nothing returns to the JVM but 4 integers per document, so the
# 100 TB cost profile is the decode scan itself.
# ---------------------------------------------------------------------------

_FRAME_BYTES = 32
_SHOT_THRESHOLD = 200

_SHOT_SCHEMA = (
    "doc_id bigint, n_frames bigint, n_boundaries bigint, max_abs_delta bigint"
)


def shot_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.int8).astype(np.int64)
            n = len(samples)
            starts = np.arange(0, n, _FRAME_BYTES)
            frames = np.add.reduceat(samples, starts) if n else np.array([], dtype=np.int64)
            deltas = np.abs(np.diff(frames)) if len(frames) > 1 else np.array([], dtype=np.int64)
            rows.append(
                (
                    int(doc_id),
                    int(len(frames)),
                    int((deltas > _SHOT_THRESHOLD).sum()),
                    int(deltas.max()) if len(deltas) else 0,
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_frames", "n_boundaries", "max_abs_delta"]
        )


@register(
    "mm_shot_boundaries",
    # same byte-exact oracle recipe as mm_audio_energy: hex-expanded
    # UTF-8 bytes with int8 wraparound, frame sums, lag deltas
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, pos,
             CASE WHEN code > 127 THEN code - 256 ELSE code END AS sample
      FROM (
        SELECT doc_id, pos,
               ('0x' || substr(hx, 2 * pos - 1, 2))::BIGINT AS code
        FROM (SELECT doc_id, hx, unnest(range(1, n + 1)) AS pos FROM b)
      )
    ),
    f AS (
      SELECT doc_id, (pos - 1) // {_FRAME_BYTES} AS frame,
             sum(sample) AS intensity
      FROM s GROUP BY 1, 2
    ),
    d AS (
      SELECT doc_id,
             abs(intensity - lag(intensity)
                 OVER (PARTITION BY doc_id ORDER BY frame)) AS delta
      FROM f
    ),
    fa AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames FROM f GROUP BY doc_id
    ),
    da AS (
      SELECT doc_id,
             CAST(count(CASE WHEN delta > {_SHOT_THRESHOLD} THEN 1 END) AS BIGINT)
               AS n_boundaries,
             CAST(max(delta) AS BIGINT) AS max_abs_delta
      FROM d WHERE delta IS NOT NULL GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(coalesce(fa.n_frames, 0) AS BIGINT) AS n_frames,
           CAST(coalesce(da.n_boundaries, 0) AS BIGINT) AS n_boundaries,
           CAST(coalesce(da.max_abs_delta, 0) AS BIGINT) AS max_abs_delta
    FROM b LEFT JOIN fa USING (doc_id) LEFT JOIN da USING (doc_id)
    ORDER BY b.doc_id
    """,
)
def mm_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_payloads(spark, sf_dir)
    return (
        media.select("doc_id", "payload")
        .mapInPandas(shot_batches, schema=_SHOT_SCHEMA)
        .orderBy("doc_id")
    )
