"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Design for a real 100 TB multimodal corpus:

* media lives in a ``binary`` column (or object-store URIs resolved at
  read time); metadata (mime, width, dims) in sibling typed columns;
* decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  over Arrow batches — one Python worker call per batch, never per row;
* partitioning: payload tables are wide — keep
  ``spark.sql.files.maxPartitionBytes`` small enough that a task's batch
  of payloads fits executor memory, and select metadata columns only
  (column pruning) when payloads aren't needed.

The container has no image/audio libraries, so the actual pixel/sample
decode is STUBBED: :func:`decode_image_stub` raises
``NotImplementedError`` unless a decoder import succeeds, and
:func:`extract_features` computes deterministic pseudo-features
(byte length, md5, fake dimensions derived from the digest) so the
Spark-side plumbing — schema, batching, UDF signature — is real and
testable end-to-end."""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_binary_payload", "extract_features", "decode_image_stub"]

FEATURE_SCHEMA = (
    "id long, n_bytes long, payload_md5 string, fake_width long, fake_height long"
)


def with_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach an opaque binary payload column (here: the utf-8 encoded
    text standing in for image bytes) plus a mime tag."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def extract_features(payload_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.
    The md5/length/fake-dim features are deterministic, so the DuckDB
    oracle can recompute them — proving the mapInPandas plumbing without
    real decoders."""

    # NESTED, not module-level: cloudpickle serializes nested functions
    # by VALUE, while module-level functions pickle by reference and make
    # every worker try `import lshrs_spark` — which fails under the
    # driver's vanilla session (workers only see the driver's cwd).
    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            md5s = [_hashlib.md5(bytes(p)).hexdigest() for p in payloads]
            yield _pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "payload_md5": md5s,
                    # Deterministic fake decode: dims derived from the
                    # digest — swap in a real decoder when available.
                    "fake_width": [int(m[:4], 16) % 640 + 1 for m in md5s],
                    "fake_height": [int(m[4:8], 16) % 480 + 1 for m in md5s],
                }
            )

    return payload_df.select("id", "payload").mapInPandas(
        feature_batches, schema=FEATURE_SCHEMA
    )


def decode_image_stub(payload: bytes):
    """Decode an image payload to an array. Requires a real decoder
    library (PIL / cv2) — not available in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/cv2; not available in this environment"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))
