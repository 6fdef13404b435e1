"""Offline contract tests for the two env-gated seams: the Kafka CSV
record-decode DAG (no spark-sql-kafka jar here) and the real media-decoder
plug-in point (no PIL here)."""

from __future__ import annotations

import io

import pytest

from cloudcomputing_flink_application_spark import schemas
from cloudcomputing_flink_application_spark.operators import multimodal
from cloudcomputing_flink_application_spark.sources.readers import parse_kafka_csv
from tests.conftest import rows_set

# --- Kafka record-decode contract -------------------------------------------


def kafka_shaped(spark, values: list[bytes]):
    """A static frame with Kafka's exact wire schema (key/value binary +
    topic/partition/offset/timestamp metadata)."""
    rows = [
        (None, v, "cars", 0, i, None, 0) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp, timestampType int"
        ),
    )


def test_kafka_csv_parse_contract(spark):
    raw = kafka_shaped(
        spark,
        [b"30,1,42,0,0,0,1,2100", b"31,58,40,0,0,0,50,80950"],
    )
    out = parse_kafka_csv(raw, schemas.CAR_REPORTS)
    # names + types must match (from_csv marks everything nullable)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in schemas.CAR_REPORTS.fields
    ]
    assert rows_set(out) == {
        (30, 1, 42, 0, 0, 0, 1, 2100),
        (31, 58, 40, 0, 0, 0, 50, 80950),
    }


def test_kafka_csv_parse_malformed_row_nulls(spark):
    # PERMISSIVE from_csv: garbage fields become nulls, never job failures.
    out = parse_kafka_csv(kafka_shaped(spark, [b"x,y,z"]), schemas.CAR_REPORTS)
    [r] = out.collect()
    assert r.time is None and r.vid is None


# --- media-decoder seam ------------------------------------------------------


class _FakeIm:
    width, height = 8, 6

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakePIL:
    @staticmethod
    def open(fp):
        assert isinstance(fp, io.BytesIO)
        return _FakeIm()


def test_decode_image_real_raises_without_pil():
    if multimodal.HAVE_PIL:
        pytest.skip("PIL unexpectedly present")
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image_real(b"\x89PNG")


def test_decode_image_real_with_patched_pil(monkeypatch):
    monkeypatch.setattr(multimodal, "HAVE_PIL", True)
    monkeypatch.setattr(multimodal, "Image", _FakePIL)
    assert multimodal.decode_image_real(b"\x89PNG....") == (8, 6)


def test_image_meta_real_plumbing_matches_fake_schema(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "defgh")], ["doc_id", "text"]
    )
    out = multimodal.image_meta_real(
        docs, decoder=lambda b: (len(b), 7)
    )
    fake = multimodal.image_meta(docs)
    assert out.schema == fake.schema  # the swap-in contract
    assert rows_set(out) == {
        (1, 3, 7, 3, "real/decoded"),
        (2, 5, 7, 5, "real/decoded"),
    }


def test_image_resize_real_plumbing_matches_fake_schema(spark):
    # Injectable resizer drives the full mapInPandas plumbing without PIL;
    # the schema must equal the fake path's (the swap-in contract).
    import hashlib

    docs = spark.createDataFrame([(1, "abc"), (2, "defgh")], ["doc_id", "text"])
    out = multimodal.image_resize_real(
        docs, max_side=4,
        resizer=lambda b, ms: (len(b) * 2, len(b), min(len(b) * 2, ms),
                               max(1, min(len(b) * 2, ms) // 2), b"thumb" + b),
    )
    fake = multimodal.image_resize(docs)
    assert out.schema == fake.schema
    fp = lambda b: hashlib.md5(b"thumb" + b).hexdigest()[:8]  # noqa: E731
    assert rows_set(out) == {
        (1, 6, 3, 4, 2, fp(b"abc")),
        (2, 10, 5, 4, 2, fp(b"defgh")),
    }


def test_resize_real_raises_without_pil(spark):
    if multimodal.HAVE_PIL:
        pytest.skip("PIL unexpectedly present")
    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(Exception, match="PIL"):
        multimodal.image_resize_real(docs).collect()


def test_fit_dims_boundaries():
    # Aspect-preserving fit: never upscales, floors at 1, exact integers.
    import pandas as pd

    w = pd.Series([100, 2048, 1, 256, 2000], dtype="int64")
    h = pd.Series([50, 1024, 2048, 256, 1], dtype="int64")
    nw, nh = multimodal._fit_dims(w, h, 256)
    assert list(nw) == [100, 256, 1, 256, 256]
    # 1024*256//2048 = 128; 2048 tall -> width floors to 1 via clip;
    # 2000x1 -> height 1*256//2000 = 0 floored to 1
    assert list(nh) == [50, 128, 256, 256, 1]


def test_video_frame_sample_boundaries(spark):
    # payload shorter than one frame emits nothing; exact multiples and
    # step boundaries emit the arithmetic series.
    from cloudcomputing_flink_application_spark.operators.multimodal import (
        VIDEO_FRAME_BYTES,
        video_frame_sample,
    )

    short = "x" * (VIDEO_FRAME_BYTES - 1)         # 0 whole frames
    exact = "y" * (VIDEO_FRAME_BYTES * 15)        # 15 frames: idx 0,7,14
    docs = spark.createDataFrame(
        [(1, short), (2, exact)], ["doc_id", "text"]
    )
    rows = video_frame_sample(docs).collect()
    assert all(r.doc_id == 2 for r in rows)
    assert sorted(r.frame_idx for r in rows) == [0, 7, 14]
    by_idx = {r.frame_idx: r.ts_ms for r in rows}
    assert by_idx[7] == 7 * 1000 // 25 and by_idx[14] == 14 * 1000 // 25
    import pytest as _pytest

    with _pytest.raises(ValueError, match="step"):
        video_frame_sample(docs, step=0)
