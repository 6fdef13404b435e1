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

from cloudcomputing_flink_application_spark.plans.spread import _spread

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

#: Aspect-preserving thumbnail bound (longest side) for image_resize.
RESIZE_MAX_SIDE = 256
#: Fake-video parameters for frame sampling: frame payload size and rate.
VIDEO_FRAME_BYTES = 64
VIDEO_FPS = 25
#: Every Nth frame is sampled (uniform temporal subsample).
FRAME_SAMPLE_STEP = 7
#: Feature-vector dimensionality for the fake extractor.
FEAT_DIM = 8


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

    Spread to full parallelism: decode UDFs are CPU-bound and a
    single-file scan would otherwise feed mapInPandas one partition
    (gated — guide §2.4: a many-split scan at scale skips the shuffle).
    """
    return _spread(documents).select(
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
    """Merged multimodal plumbing probe: image metadata, audio frame
    accounting, thumbnail-fit dimensions, and the feature fingerprint
    from ONE Arrow mapInPandas pass over the binary payloads (registry
    consolidation, r5; extended r7 with the resize and feature-extract
    columns — ``image_meta`` / ``audio_frames`` / ``image_resize`` /
    ``image_features`` remain individually usable and tested).  One
    decode batch emits every modality interpretation, which is also the
    realistic ingest shape: probe every payload once, type it later.

    r8: the VIDEO interpretation joins the pass — per-doc whole-frame
    count and the fingerprint chain of the SAMPLED frames
    (``video_fp8`` = md5 of the '|'-joined per-frame fp8s
    ``video_frame_sample`` emits, every FRAME_SAMPLE_STEP-th frame in
    order; NULL when the payload holds no whole frame).  This puts the
    video operator's per-frame derivation under the driver row while its
    1->N explode shape stays the off-registry operator.

    Output: (doc_id, width, height, new_width, new_height, n_bytes,
    n_samples, n_frames, duration_ms, fp8, feat_fp8, n_video_frames,
    video_fp8).
    """
    payloads = with_binary_payload(documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def video_fp(h: str, n: int):
            if n <= 0:
                return None
            chain = "|".join(
                hashlib.md5(f"{h}|f{i}".encode()).hexdigest()[:8]
                for i in range(0, n, FRAME_SAMPLE_STEP)
            )
            return hashlib.md5(chain.encode()).hexdigest()[:8]

        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            nbytes = pdf["payload"].map(len)
            samples = nbytes // BYTES_PER_SAMPLE
            nvf = (nbytes // VIDEO_FRAME_BYTES).astype("int64")
            w = digests.map(lambda h: 1 + int(h[0:4], 16) % 1024).astype("int64")
            h = digests.map(lambda h: 1 + int(h[4:8], 16) % 1024).astype("int64")
            new_w, new_h = _fit_dims(w, h, RESIZE_MAX_SIDE)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_width": new_w,
                    "new_height": new_h,
                    "n_bytes": nbytes.astype("int64"),
                    "n_samples": samples.astype("int64"),
                    "n_frames": (samples // FRAME_SAMPLES).astype("int64"),
                    "duration_ms": (samples * 1000 // SAMPLE_RATE).astype("int64"),
                    "fp8": digests.map(lambda h: h[:8]),
                    "feat_fp8": digests.map(
                        lambda h: hashlib.md5(f"{h}|feat".encode()).hexdigest()[:8]
                    ),
                    "n_video_frames": nvf,
                    # index=pdf.index: pandas aligns columns by index at
                    # DataFrame construction; a fresh RangeIndex would
                    # misalign against doc_id if a batch ever arrives
                    # with a non-default index (same guard as
                    # image_resize's thumb Series)
                    "video_fp8": pd.Series(
                        [video_fp(hh, int(n)) for hh, n in zip(digests, nvf)],
                        dtype="object",
                        index=pdf.index,
                    ),
                }
            )

    return payloads.mapInPandas(
        decode,
        schema=(
            "doc_id long, width int, height int, new_width int, new_height int, "
            "n_bytes long, n_samples long, n_frames long, duration_ms long, "
            "fp8 string, feat_fp8 string, n_video_frames long, video_fp8 string"
        ),
    )


def _fake_dims_sql(max_side: int = RESIZE_MAX_SIDE) -> tuple[str, str, str, str]:
    """The ONE statement of the fake decode dims + aspect-fit arithmetic
    shared by the resize and probe oracles (returns w, h, new_w, new_h
    SQL fragments) — mirrors ``_fit_dims``; a fit-rule change lands in
    both oracles or neither."""
    w = "(1 + (CAST('0x' || substr(md5(text), 1, 4) AS INT) % 1024))"
    h = "(1 + (CAST('0x' || substr(md5(text), 5, 4) AS INT) % 1024))"
    ls = f"greatest({w}, {h})"
    nw = f"CASE WHEN {ls} > {max_side} THEN greatest(1, {w} * {max_side} // {ls}) ELSE {w} END"
    nh = f"CASE WHEN {ls} > {max_side} THEN greatest(1, {h} * {max_side} // {ls}) ELSE {h} END"
    return w, h, nw, nh



def _media_probe_sql() -> str:
    # The video fingerprint chain COMPOSES the frame-sample oracle (the
    # r7 review rule: no inline restatement of another operator's
    # arithmetic) — per doc, md5 over the sampled frames' fp8s joined in
    # frame order, exactly the probe UDF's video_fp().
    w, h, nw, nh = _fake_dims_sql()
    return f"""
WITH vfp AS (
  SELECT doc_id,
         substr(md5(string_agg(frame_fp8, '|' ORDER BY frame_idx)), 1, 8)
           AS video_fp8
  FROM ({VIDEO_FRAME_SAMPLE_SQL.strip()}) vf
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST({w} AS INT) AS width,
       CAST({h} AS INT) AS height,
       CAST({nw} AS INT) AS new_width,
       CAST({nh} AS INT) AS new_height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} AS BIGINT) AS n_samples,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} // {FRAME_SAMPLES} AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) // {BYTES_PER_SAMPLE} * 1000 // {SAMPLE_RATE} AS BIGINT) AS duration_ms,
       substr(md5(text), 1, 8) AS fp8,
       substr(md5(md5(text) || '|feat'), 1, 8) AS feat_fp8,
       CAST(octet_length(encode(text)) // {VIDEO_FRAME_BYTES} AS BIGINT) AS n_video_frames,
       vfp.video_fp8
FROM documents d LEFT JOIN vfp USING (doc_id)
"""


# NOTE: MEDIA_PROBE_SQL is assigned AFTER the video section below — the
# probe oracle composes VIDEO_FRAME_SAMPLE_SQL (r8 video_fp8 column).


# --- r7: resize / feature-extract / video frame-sample -----------------------


def _fit_dims(w: "pd.Series", h: "pd.Series", max_side: int):
    """Integer-exact aspect-preserving fit: dims unchanged when both sides
    already fit; otherwise scaled so the longest side == max_side, floor
    division, floored at 1.  Pure integer arithmetic so the DuckDB oracle
    reproduces it bit-for-bit."""
    long_side = w.combine(h, max)
    scale_needed = long_side > max_side
    new_w = w.where(~scale_needed, (w * max_side // long_side).clip(lower=1))
    new_h = h.where(~scale_needed, (h * max_side // long_side).clip(lower=1))
    return new_w.astype("int32"), new_h.astype("int32")


def image_resize(documents: DataFrame, max_side: int = RESIZE_MAX_SIDE) -> DataFrame:
    """Thumbnail-resize plumbing: decode dims (fake, md5-derived), compute
    the aspect-preserving fit to ``max_side`` (never upscales), and emit a
    content fingerprint of the would-be thumbnail — one Arrow mapInPandas
    pass, same partition-preserving no-shuffle contract as ``image_meta``.
    ``image_resize_real`` is the PIL seam behind the identical schema.

    Output: (doc_id, width, height, new_width, new_height, thumb_fp8).
    """
    payloads = with_binary_payload(documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            w = digests.map(lambda h: 1 + int(h[0:4], 16) % 1024).astype("int64")
            h = digests.map(lambda h: 1 + int(h[4:8], 16) % 1024).astype("int64")
            new_w, new_h = _fit_dims(w, h, max_side)
            thumb = pd.Series(
                [
                    hashlib.md5(f"{d}|{nw}x{nh}".encode()).hexdigest()[:8]
                    for d, nw, nh in zip(digests, new_w, new_h)
                ],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_width": new_w,
                    "new_height": new_h,
                    "thumb_fp8": thumb,
                }
            )

    return payloads.mapInPandas(
        decode,
        schema=(
            "doc_id long, width int, height int, "
            "new_width int, new_height int, thumb_fp8 string"
        ),
    )


def _image_resize_sql(max_side: int = RESIZE_MAX_SIDE) -> str:
    w, h, nw, nh = _fake_dims_sql(max_side)
    return f"""
SELECT doc_id,
       CAST({w} AS INT) AS width,
       CAST({h} AS INT) AS height,
       CAST({nw} AS INT) AS new_width,
       CAST({nh} AS INT) AS new_height,
       substr(md5(md5(text) || '|' || CAST({nw} AS VARCHAR) || 'x' || CAST({nh} AS VARCHAR)), 1, 8) AS thumb_fp8
FROM documents
"""


IMAGE_RESIZE_SQL = _image_resize_sql()


def image_resize_real(documents: DataFrame, max_side: int = RESIZE_MAX_SIDE, resizer=None) -> DataFrame:
    """``image_resize`` with a REAL decoder/resizer behind the same schema.

    ``resizer(payload, max_side) -> (w, h, new_w, new_h, thumb_bytes)``
    defaults to the PIL thumbnail path; tests inject a deterministic fake
    to drive the plumbing without the library (same seam discipline as
    ``image_meta_real``)."""
    rz = resizer or _resize_real_pil(max_side)
    payloads = with_binary_payload(documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: rz(bytes(b), max_side))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "new_width": out.map(lambda t: t[2]).astype("int32"),
                    "new_height": out.map(lambda t: t[3]).astype("int32"),
                    "thumb_fp8": out.map(
                        lambda t: hashlib.md5(t[4]).hexdigest()[:8]
                    ),
                }
            )

    return payloads.mapInPandas(
        decode,
        schema=(
            "doc_id long, width int, height int, "
            "new_width int, new_height int, thumb_fp8 string"
        ),
    )


def _resize_real_pil(max_side: int):
    def rz(payload: bytes, ms: int):
        if not HAVE_PIL:
            raise NotImplementedError(
                "image resize requires PIL; this environment ships none — "
                "use the deterministic fake path (image_resize)"
            )
        import io

        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.width, im.height
            im.thumbnail((ms, ms))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return w, h, im.width, im.height, buf.getvalue()

    return rz


def image_features(documents: DataFrame, dim: int = FEAT_DIM) -> DataFrame:
    """Feature extraction plumbing: payload -> fixed-``dim`` float vector —
    the embedding step that bridges the multimodal columns into the
    similarity/ANN family (the output schema matches the ``embeddings``
    table's ``embedding`` column contract: array<float>, stable ids).

    The fake extractor derives component d from md5(payload || d) scaled
    into [-1, 1) with exact integer arithmetic — deterministic and
    SQL-reproducible, so even the feature path carries a value-hash
    oracle.  A real model swaps in behind the same mapInPandas signature
    (batch in, batch of vectors out — exactly how a GPU encoder is
    driven, minus the GPU).

    Output: (doc_id, feature array<float>, feat_fp8).
    """
    payloads = with_binary_payload(documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())

            def vec(h: str) -> list[float]:
                return [
                    (int(hashlib.md5(f"{h}|{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
                    / 1000.0
                    for d in range(dim)
                ]

            feats = digests.map(vec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": feats,
                    "feat_fp8": digests.map(
                        lambda h: hashlib.md5(f"{h}|feat".encode()).hexdigest()[:8]
                    ),
                }
            )

    return payloads.mapInPandas(
        extract, schema="doc_id long, feature array<float>, feat_fp8 string"
    )


def _image_features_sql(dim: int = FEAT_DIM) -> str:
    comps = ", ".join(
        f"CAST((CAST('0x' || substr(md5(md5(text) || '|{d}'), 1, 8) AS BIGINT) % 2001 - 1000) / 1000.0 AS FLOAT)"
        for d in range(dim)
    )
    return f"""
SELECT doc_id,
       [{comps}] AS feature,
       substr(md5(md5(text) || '|feat'), 1, 8) AS feat_fp8
FROM documents
"""


IMAGE_FEATURES_SQL = _image_features_sql()


def video_frame_sample(
    documents: DataFrame, step: int = FRAME_SAMPLE_STEP
) -> DataFrame:
    """Temporal frame sampling plumbing: payload (fake video: one frame per
    ``VIDEO_FRAME_BYTES`` bytes at ``VIDEO_FPS``) -> one output row per
    SAMPLED frame (every ``step``-th, starting at 0) with its timestamp
    and a per-frame content fingerprint.

    This is the 1 -> N mapInPandas shape a real video pipeline needs
    (decode is a per-frame codec call, so the explode lives inside the
    UDF, not the plan), with the batch fan-out bounded by payload size.
    Docs with zero whole frames emit nothing — the corpus spine stays the
    documents table.

    Output: (doc_id, frame_idx, ts_ms, frame_fp8).
    """
    if step < 1:
        raise ValueError(f"step must be >= 1 (got {step})")
    payloads = with_binary_payload(documents)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_ts, out_fp = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // VIDEO_FRAME_BYTES
                h = hashlib.md5(b).hexdigest()
                for idx in range(0, n_frames, step):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_ts.append(idx * 1000 // VIDEO_FPS)
                    out_fp.append(
                        hashlib.md5(f"{h}|f{idx}".encode()).hexdigest()[:8]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "ts_ms": pd.Series(out_ts, dtype="int64"),
                    "frame_fp8": pd.Series(out_fp, dtype="object"),
                }
            )

    return payloads.mapInPandas(
        sample, schema="doc_id long, frame_idx int, ts_ms long, frame_fp8 string"
    )


def _video_frame_sample_sql(step: int = FRAME_SAMPLE_STEP) -> str:
    return f"""
WITH vids AS (
  SELECT doc_id, md5(text) AS h,
         octet_length(encode(text)) // {VIDEO_FRAME_BYTES} AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, h, unnest(generate_series(0, n_frames - 1, {step})) AS frame_idx
  FROM vids WHERE n_frames > 0
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * 1000 // {VIDEO_FPS} AS BIGINT) AS ts_ms,
       substr(md5(h || '|f' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_fp8
FROM frames
"""


VIDEO_FRAME_SAMPLE_SQL = _video_frame_sample_sql()

MEDIA_PROBE_SQL = _media_probe_sql()
