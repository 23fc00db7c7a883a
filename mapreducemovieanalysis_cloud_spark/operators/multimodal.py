"""Multimodal column plumbing (north-star, BASELINE.json).

Images/audio/video are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The real codec work (PIL/ffmpeg/torchaudio) is NOT available in this
container, so the byte-level decoders are deterministic fakes behind
``_decode_stub`` — but everything Spark-side is real and tested: schema,
binary encoding, Arrow batch transfer, UDF signature, partition-preserving
execution.

At 100 TB: binary payloads never shuffle (all derivations are map-side);
metadata-only columns are projected before any exchange, so downstream joins
and aggregations move kilobytes, not media bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("data", BinaryType(), True),
        StructField("source", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("first_byte", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

def _probe_real_codecs() -> bool:
    """Dynamic try-import probe: True when a real image codec (PIL) is
    importable in THIS interpreter.  Runs independently on the driver
    and on each executor at module import, so a mixed cluster degrades
    per-worker rather than lying globally."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


REAL_CODECS_AVAILABLE = _probe_real_codecs()


def _decode_stub(media_type: str, data: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: derives "dimensions" from the byte stream.

    The fake is pure arithmetic on the bytes so correctness is
    oracle-checkable; it is ALWAYS used for the ``*/fake`` media types
    the synthetic corpus ships, even when real codecs are installed.
    """
    n = len(data)
    first = data[0] if n else 0
    return {
        "n_bytes": n,
        "first_byte": first,
        "width": (n % 640) + 1,
        "height": ((n * 7 + first) % 480) + 1,
    }


def _decode_real_image(media_type: str, data: bytes) -> dict[str, Any]:
    """PIL-backed image decode (only reachable when the import probe
    succeeded); same output contract as the stub."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        return {
            "n_bytes": len(data),
            "first_byte": data[0] if data else 0,
            "width": int(img.width),
            "height": int(img.height),
        }


def make_dispatch_decoder(
    use_real_codecs: bool,
) -> Callable[[str, bytes], dict[str, Any]]:
    """Codec dispatch with the real-vs-stub decision FROZEN into the
    returned closure: real decoder for real image types when
    ``use_real_codecs``, the deterministic stub otherwise (``*/fake``
    types always take the stub).

    Why a closure over a bool rather than a module-level probe: a
    module-level decoder pickles BY REFERENCE and re-imports on each
    executor, so on a cluster where only some workers have PIL the same
    row would decode via PIL or the stub depending on task placement —
    row-level nondeterminism dressed up as graceful degradation (r05
    advisor).  The closure pickles the driver's decision BY VALUE; every
    executor follows it, and an executor missing the driver-selected
    codec fails loudly with ImportError instead of silently diverging."""

    def decode(media_type: str, data: bytes) -> dict[str, Any]:
        mt = media_type or ""
        if (
            use_real_codecs
            and mt.startswith("image/")
            and not mt.endswith("/fake")
        ):
            return _decode_real_image(mt, data)
        return _decode_stub(mt, data)

    return decode


def default_decoder(media_type: str, data: bytes) -> dict[str, Any]:
    """Per-interpreter dispatch (kept for direct/driver-side callers and
    tests): consults THIS interpreter's probe.  Do not pass this function
    itself into a distributed decode — ``decode_media`` resolves the
    decision on the driver via ``make_dispatch_decoder`` precisely so
    executors cannot each answer the probe differently."""
    return make_dispatch_decoder(REAL_CODECS_AVAILABLE)(media_type, data)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    container has no image/audio test data; the bytes are equally opaque to
    the plumbing)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("data"),
        F.col("source"),
    )


def decode_media(
    media: DataFrame,
    decoder: Callable[[str, bytes], dict[str, Any]] | None = None,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas: one Python worker pass per
    partition, binary stays columnar Arrow end-to-end, output drops the
    payload (metadata-only → cheap to shuffle downstream).

    ``decoder`` is the codec swap-in point: any picklable
    ``(media_type, payload_bytes) -> {n_bytes, first_byte, width, height}``
    callable (e.g. a PIL/ffmpeg wrapper) replaces the default dispatch
    without touching the Spark plumbing — schema, Arrow batching, and
    partition-preservation are identical either way (contract pinned by
    ``tests/test_pipeline.py`` fake-codec test).  With no override the
    dispatch decision (real codec vs deterministic stub) is resolved
    ONCE, here on the driver, and shipped to every executor by value —
    all workers decode the same row the same way, and a worker missing
    the driver-selected codec raises instead of silently falling back
    (see ``make_dispatch_decoder``)."""
    decode = decoder or make_dispatch_decoder(REAL_CODECS_AVAILABLE)

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                decode(mt, bytes(d))
                for mt, d in zip(pdf["media_type"], pdf["data"])
            ]
            out = pd.DataFrame(meta)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[
                [
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "first_byte",
                    "width",
                    "height",
                ]
            ]

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stand-in: emits one row per sampled "frame" offset —
    the explode-shaped output a video frame sampler produces, with
    deterministic fake frame ids. Pure Spark (no UDF): the offsets come from
    sequence(), the payload is never copied per frame."""
    return media.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length("data") / every_n_bytes).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx", "frame_offset_blocks"),
        F.length("data").alias("n_bytes"),
    ).withColumn(
        "frame_offset", F.col("frame_offset_blocks") * every_n_bytes
    ).drop("frame_offset_blocks")


BLOCKHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("b0", IntegerType(), False),
        StructField("b1", IntegerType(), False),
        StructField("b2", IntegerType(), False),
        StructField("b3", IntegerType(), False),
    ]
)

_PH_BITS = 64
_PH_BLOCKS = 4  # 4 x 16-bit signature blocks (pigeonhole for hamming <= 3)


def blockhash64(media: DataFrame) -> DataFrame:
    """Perceptual BLOCK-MEAN hash of each payload (the blockhash.io
    algorithm over the decoded sample stream): the 64 "pixel" blocks of
    the stream (position p -> block (p·64) div n) each contribute one
    bit — 1 iff the block's mean sample strictly exceeds the global mean
    (exact integer cross-multiply ``bs·n > total·bl``, no division).
    Emitted as four 16-bit signature blocks, ready for the pigeonhole
    pair join (same blocking scheme as the text SimHash kernel,
    operators/dedup.py:simhash_pairs).

    With the container's fake codec the "samples" are the payload's code
    points (decode errors="replace", matching extract_features); a real
    deployment swaps in luminance values from the actual decoder — the
    hash arithmetic, schema, and join are unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                cps = [
                    ord(c)
                    for c in bytes(d).decode("utf-8", errors="replace")
                ]
                n = len(cps)
                bits = 0
                if n:
                    total = sum(cps)
                    bsum = [0] * _PH_BITS
                    bcnt = [0] * _PH_BITS
                    for p, cp in enumerate(cps):
                        j = (p * _PH_BITS) // n
                        bsum[j] += cp
                        bcnt[j] += 1
                    for j in range(_PH_BITS):
                        if bcnt[j] and bsum[j] * n > total * bcnt[j]:
                            bits |= 1 << (_PH_BITS - 1 - j)
                out.append(
                    (
                        mid,
                        (bits >> 48) & 0xFFFF,
                        (bits >> 32) & 0xFFFF,
                        (bits >> 16) & 0xFFFF,
                        bits & 0xFFFF,
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return media.mapInPandas(batches, BLOCKHASH_SCHEMA)


def phash_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-dup media pairs: blockhash64 signatures joined by
    the 16-bit-block pigeonhole (hamming <= 3 across 4 blocks leaves at
    least one block equal), exact hamming re-check on the survivors —
    the image-dedup stage of a multimodal pipeline, finding payloads
    whose decoded content is structurally similar even when their bytes
    (and so their md5) differ.

    Scale: payloads never shuffle (the hash is map-side); the join moves
    (id, 4 x 16-bit) signature rows; expected bucket size is n/2^16 per
    block.  Same posture as the text SimHash tier."""
    if max_hamming >= _PH_BLOCKS:
        raise ValueError(
            "pigeonhole blocking over 4 blocks only covers max_hamming <= 3"
        )
    sigs = blockhash64(media).localCheckpoint(eager=False)
    cols = [f"b{j}" for j in range(_PH_BLOCKS)]
    blocked = sigs.select(
        "media_id",
        *cols,
        F.posexplode(F.array(*cols)).alias("blk_idx", "blk_key"),
    )
    a = blocked.select(
        F.col("media_id").alias("media_a"),
        *[F.col(c).alias(f"a{j}") for j, c in enumerate(cols)],
        "blk_idx",
        "blk_key",
    )
    b = blocked.select(
        F.col("media_id").alias("media_b"),
        *[F.col(c).alias(f"bb{j}") for j, c in enumerate(cols)],
        "blk_idx",
        "blk_key",
    )
    hamming = F.lit(0)
    for j in range(_PH_BLOCKS):
        hamming = hamming + F.bit_count(
            F.col(f"a{j}").bitwiseXOR(F.col(f"bb{j}"))
        )
    return (
        a.join(b, ["blk_idx", "blk_key"])
        .where(F.col("media_a") < F.col("media_b"))
        .select(
            "media_a",
            "media_b",
            *[F.col(f"a{j}") for j in range(_PH_BLOCKS)],
            *[F.col(f"bb{j}") for j in range(_PH_BLOCKS)],
        )
        .distinct()
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )


FEATURES_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(LongType()), True),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURES_DIM) -> DataFrame:
    """Feature extraction: binary payload -> fixed-dim vector via Arrow
    mapInPandas — the image/audio -> embedding stage of a multimodal
    pipeline. The stub "model" is exact integer arithmetic (sum of code
    points per position class mod ``dim``) so the output is
    oracle-checkable; a real deployment swaps the loop body for a batched
    model forward pass (same schema, same Arrow batch shape). Payloads
    stay map-side; only (id, dim-length vector) rows continue downstream.
    """

    def feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for d in pdf["data"]:
                # errors="replace" keeps arbitrary binary payloads from
                # killing the stage (the API treats bytes as opaque media);
                # valid UTF-8 — everything the oracle covers — is unchanged.
                text = bytes(d).decode("utf-8", errors="replace")
                sums = [0] * dim
                for i, ch in enumerate(text):
                    sums[i % dim] += ord(ch)
                feats.append(sums)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "features": feats}
            )

    return media.mapInPandas(feature_batches, FEATURES_SCHEMA)


def frame_dedup_pairs(
    media: DataFrame, every_n_bytes: int = 64
) -> DataFrame:
    """Cross-media near-duplicate pairs via EXACT frame fingerprints —
    the video-dedup staple: two assets are near-dups when they share
    sampled frames, detected by equi-joining per-frame content hashes
    (never by comparing payloads pairwise).  Per unordered media pair
    sharing at least one frame hash: the distinct-frame counts of both
    sides, the shared count, and containment_bp = shared * 10000 //
    min(|A|, |B|) — 10000 means the smaller asset's every sampled
    frame appears in the other (a clip-of or re-encode relationship).

    Shape: one map-side pass slices each payload at the frame_sample
    offsets and hashes it IN THE SAME projection, so payload bytes
    never shuffle — only (media_id, 16-byte hash) rows do; the pair
    join keys on the hash (frame-content-blocked, the LSH-band
    posture: candidate volume is driven by real duplication, never
    |media|²); per-pair rollups and the containment arithmetic are
    pure integers.

    The byte-slice here and the character-slice in the DuckDB oracle
    agree because the synthetic payloads are ASCII — the same
    byte≡char equivalence the registered multimodal_frames /
    multimodal_blockhash oracles already rely on (a real binary
    corpus keeps the Spark side unchanged; only the oracle is
    text-bound).
    """
    fr = (
        media.select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.length("data") / every_n_bytes).cast("int")
                        - 1,
                        F.lit(0),
                    ),
                )
            ).alias("i"),
            F.col("data"),
        )
        .select(
            "media_id",
            F.md5(
                F.expr(
                    f"substring(data, i * {every_n_bytes} + 1,"
                    f" {every_n_bytes})"
                )
            ).alias("h"),
        )
        .distinct()
    )
    fr = fr.localCheckpoint(eager=False)  # feeds sizes + both join sides
    sizes = fr.groupBy("media_id").agg(F.count(F.lit(1)).alias("nf"))
    a = fr.select(F.col("media_id").alias("media_a"), "h")
    b = fr.select(F.col("media_id").alias("media_b"), "h")
    pairs = (
        a.join(b, "h")
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            sizes.select(
                F.col("media_id").alias("media_a"),
                F.col("nf").alias("nf_a"),
            ),
            "media_a",
        )
        .join(
            sizes.select(
                F.col("media_id").alias("media_b"),
                F.col("nf").alias("nf_b"),
            ),
            "media_b",
        )
        .select(
            "media_a",
            "media_b",
            F.col("nf_a").cast("long"),
            F.col("nf_b").cast("long"),
            F.col("n_shared").cast("long"),
            F.expr(
                "CAST(n_shared * 10000 DIV LEAST(nf_a, nf_b) AS BIGINT)"
            ).alias("containment_bp"),
        )
    )
