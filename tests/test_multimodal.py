"""Multimodal binary-column plumbing: schema, batching, deterministic
pseudo-decode; real decode is stubbed (no image libs in the container)."""

from __future__ import annotations

import hashlib

import pytest

from lshrs_spark.multimodal import (
    decode_image_stub,
    extract_features,
    with_binary_payload,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "another payload")], "doc_id long, text string"
    )


def test_payload_roundtrip_and_features(docs):
    payloads = with_binary_payload(docs)
    assert dict(payloads.dtypes)["payload"] == "binary"
    rows = {r.id: r for r in extract_features(payloads).collect()}
    for i, text in [(0, "hello world"), (1, "another payload")]:
        raw = text.encode()
        md5 = hashlib.md5(raw).hexdigest()
        assert rows[i].n_bytes == len(raw)
        assert rows[i].payload_md5 == md5
        assert rows[i].fake_width == int(md5[:4], 16) % 640 + 1
        assert rows[i].fake_height == int(md5[4:8], 16) % 480 + 1


def test_decode_stub_raises_without_decoder():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="decode"):
        decode_image_stub(b"\x89PNG")
