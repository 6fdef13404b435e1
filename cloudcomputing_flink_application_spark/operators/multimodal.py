"""Multimodal column operators: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with structured metadata.  This module makes the Spark-side plumbing
real — binary encoding, Arrow-batched ``mapInPandas`` decode, explicit
output schemas, partition-preserving flow — while the actual media decode is
STUBBED with a deterministic fake (this container has no image/audio libs).

The fake is md5-arithmetic on the payload bytes, reproducible in pure SQL,
so even the Pandas-UDF path carries a full DuckDB value-hash oracle — the
plumbing (batching, schema, types) is what's being verified.

``decode_image_real`` documents where a real decoder plugs in and raises
``NotImplementedError`` until PIL/libsndfile are available.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders are not in this container — gate behind import-try
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    Image = None  # patchable seam: tests install a fake here
    HAVE_PIL = False

#: PCM parameters for the audio stub (16-bit mono @ 16 kHz, 10 ms frames).
BYTES_PER_SAMPLE = 2
SAMPLE_RATE = 16_000
FRAME_SAMPLES = 160


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real image decode -> (width, height), PIL-backed when available.

    The seam tests (tests/test_source_seams.py) install a fake PIL here
    and assert the decode contract without the library; ``image_meta_real``
    is the operator that runs this per payload behind the same output
    schema as the fake path.
    """
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment ships none — "
            "use the deterministic fake path (image_meta)"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def image_meta_real(documents: DataFrame, decoder=None) -> DataFrame:
    """``image_meta`` with a REAL decoder behind the identical output schema.

    ``decoder(payload) -> (width, height)`` defaults to ``decode_image_real``.
    Tests inject a deterministic decoder (pickled by value into the UDF
    closure) to exercise the full mapInPandas plumbing — batch shape, Arrow
    types, schema — without PIL on the workers.  Swapping the fake path for
    this one is a one-line change for a user with media libs installed.

    Output: (doc_id, width, height, n_bytes, format) — same as image_meta.
    """
    return image_meta_from_payloads(with_binary_payload(documents), decoder)


def image_meta_from_payloads(payloads: DataFrame, decoder=None) -> DataFrame:
    """Real-decoder image metadata over an EXISTING (doc_id, payload
    binary) frame — the entry point when the payload column is genuine
    media bytes (a parquet binary column) rather than the utf-8 stand-in
    ``with_binary_payload`` attaches.  The PIL integration test
    (tests/test_optional_integrations.py, ``pytest.mark.pil``) drives this
    with real encoded PNGs."""
    dec = decoder or decode_image_real

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(lambda b: dec(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda wh: wh[0]).astype("int32"),
                    "height": dims.map(lambda wh: wh[1]).astype("int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": "real/decoded",
                }
            )

    return payloads.mapInPandas(
        decode, schema="doc_id long, width int, height int, n_bytes long, format string"
    )


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach the opaque binary column (utf-8 payload stands in for media
    bytes; at production scale this is the parquet binary column itself).

    Repartitioned to full parallelism: decode UDFs are CPU-bound and a
    single-file scan would otherwise feed mapInPandas one partition.
    """
    nparts = documents.sparkSession.sparkContext.defaultParallelism
    return documents.repartition(nparts).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )


def image_meta(documents: DataFrame) -> DataFrame:
    """'Decode' image metadata from binary payloads via mapInPandas.

    Arrow-batched, partition-preserving, no shuffle: the decode UDF sees
    pandas batches of (doc_id, payload) and emits typed metadata.  The fake
    decode derives width/height from the payload's md5 — deterministic and
    oracle-checkable; a real decoder swaps in behind the same schema.

    Output: (doc_id, width, height, n_bytes, format).
    """
    payloads = with_binary_payload(documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (digests.map(lambda h: 1 + int(h[0:4], 16) % 1024)).astype("int32"),
                    "height": (digests.map(lambda h: 1 + int(h[4:8], 16) % 1024)).astype("int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": "fake/rgb8",
                }
            )

    return payloads.mapInPandas(
        decode, schema="doc_id long, width int, height int, n_bytes long, format string"
    )


IMAGE_META_SQL = """
SELECT doc_id,
       CAST(1 + (CAST('0x' || substr(md5(text), 1, 4) AS INT) % 1024) AS INT) AS width,
       CAST(1 + (CAST('0x' || substr(md5(text), 5, 4) AS INT) % 1024) AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'fake/rgb8' AS format
FROM documents
"""


def audio_frames(documents: DataFrame) -> DataFrame:
    """Frame-level audio accounting over binary payloads via mapInPandas.

    Treats the payload as PCM16 mono @ 16 kHz and derives sample/frame
    counts and duration with integer arithmetic, plus an md5-prefix content
    fingerprint.  Same plumbing contract as image_meta.

    Output: (doc_id, n_samples, n_frames, duration_ms, fp8).
    """
    payloads = with_binary_payload(documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nbytes = pdf["payload"].map(len)
            samples = nbytes // BYTES_PER_SAMPLE
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": samples.astype("int64"),
                    "n_frames": (samples // FRAME_SAMPLES).astype("int64"),
                    "duration_ms": (samples * 1000 // SAMPLE_RATE).astype("int64"),
                    "fp8": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()[:8]
                    ),
                }
            )

    return payloads.mapInPandas(
        decode,
        schema="doc_id long, n_samples long, n_frames long, duration_ms long, fp8 string",
    )


AUDIO_FRAMES_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} AS BIGINT) AS n_samples,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} // {FRAME_SAMPLES} AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} * 1000 // {SAMPLE_RATE} AS BIGINT) AS duration_ms,
       substr(md5(text), 1, 8) AS fp8
FROM documents
"""


def media_probe(documents: DataFrame) -> DataFrame:
    """Merged multimodal plumbing probe: image metadata AND audio frame
    accounting from ONE Arrow mapInPandas pass over the binary payloads
    (registry consolidation, r5 — the driver checks at most 50 queries;
    ``image_meta`` and ``audio_frames`` remain individually usable and
    tested).  One decode batch emits both modality interpretations, which
    is also the realistic ingest shape: probe every payload once, type it
    later.

    Output: (doc_id, width, height, n_bytes, n_samples, n_frames,
    duration_ms, fp8).
    """
    payloads = with_binary_payload(documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            nbytes = pdf["payload"].map(len)
            samples = nbytes // BYTES_PER_SAMPLE
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (digests.map(lambda h: 1 + int(h[0:4], 16) % 1024)).astype("int32"),
                    "height": (digests.map(lambda h: 1 + int(h[4:8], 16) % 1024)).astype("int32"),
                    "n_bytes": nbytes.astype("int64"),
                    "n_samples": samples.astype("int64"),
                    "n_frames": (samples // FRAME_SAMPLES).astype("int64"),
                    "duration_ms": (samples * 1000 // SAMPLE_RATE).astype("int64"),
                    "fp8": digests.map(lambda h: h[:8]),
                }
            )

    return payloads.mapInPandas(
        decode,
        schema=(
            "doc_id long, width int, height int, n_bytes long, "
            "n_samples long, n_frames long, duration_ms long, fp8 string"
        ),
    )


MEDIA_PROBE_SQL = f"""
SELECT doc_id,
       CAST(1 + (CAST('0x' || substr(md5(text), 1, 4) AS INT) % 1024) AS INT) AS width,
       CAST(1 + (CAST('0x' || substr(md5(text), 5, 4) AS INT) % 1024) AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} AS BIGINT) AS n_samples,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} // {FRAME_SAMPLES} AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} * 1000 // {SAMPLE_RATE} AS BIGINT) AS duration_ms,
       substr(md5(text), 1, 8) AS fp8
FROM documents
"""
