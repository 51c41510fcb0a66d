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
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_binary_payload",
    "extract_features",
    "decode_image_stub",
    "decode_ppm",
    "encode_ppm",
    "decode_bmp",
    "encode_bmp",
    "decode_wav",
    "encode_wav",
    "decode_payload",
    "with_ppm_payload",
    "media_features",
    "encode_video",
    "decode_video",
    "with_video_payload",
    "frame_sample",
    "media_resize",
    "dhash48",
    "dhash_table",
]

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


# --------------------------------------------------------------------- #
# Real pure-numpy media decoders (no external libraries): PPM (P6), BMP
# (24-bit BI_RGB) and WAV (16-bit PCM) are header + raw samples, so the
# decode is byte arithmetic. These run INSIDE the mapInPandas feature
# extractor; the same functions are unit/differential-tested driver-side.
# --------------------------------------------------------------------- #


def encode_ppm(pixels: np.ndarray) -> bytes:
    """``(h, w, 3) uint8`` -> binary PPM (P6, maxval 255)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("PPM pixels must be (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the P6 header WITHOUT ``split`` — the spec mandates exactly
    one whitespace byte after maxval, and pixel data may legally begin
    with a whitespace-valued byte (0x20 etc.) that a naive tokenizer
    would swallow. Returns ``(width, height, maxval, data_offset)``."""
    ws = b" \t\r\n\x0b\x0c"
    pos, vals = 2, []
    while len(vals) < 3:
        while payload[pos:pos + 1] in (b" ", b"\t", b"\r", b"\n", b"\x0b", b"\x0c"):
            pos += 1
        if payload[pos:pos + 1] == b"#":  # spec allows comments to EOL
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while payload[pos:pos + 1] and payload[pos] not in ws:
            pos += 1
        vals.append(int(payload[start:pos]))
    return vals[0], vals[1], vals[2], pos + 1  # +1: single ws after maxval


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6, maxval 255) -> ``(width, height, (h, w, 3) uint8)``."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval, off = _ppm_header(payload)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    data = payload[off:off + need]
    if len(data) < need:
        raise ValueError(f"PPM payload truncated: {len(data)} < {need}")
    px = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return w, h, px


def encode_bmp(pixels: np.ndarray) -> bytes:
    """``(h, w, 3) uint8`` RGB -> 24-bit uncompressed BMP (bottom-up,
    BGR, rows padded to 4 bytes — the classic BITMAPINFOHEADER layout)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit uncompressed BMP -> ``(width, height, (h, w, 3) uint8 RGB)``."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    px = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = (h - 1 - i) if bottom_up else i
        off = data_off + i * stride
        bgr = np.frombuffer(payload[off:off + row], dtype=np.uint8).reshape(w, 3)
        px[y] = bgr[:, ::-1]
    return w, h, px


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 samples -> mono 16-bit PCM WAV."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Mono/stereo 16-bit PCM WAV -> ``(sample_rate, (n, channels) int16)``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, samples.reshape(-1, channels)


def decode_payload(payload: bytes) -> dict:
    """Sniff the magic and decode: returns ``{kind, width, height,
    n_samples, mean_val}`` — the unified feature record used by
    :func:`media_features`. mean_val = mean pixel byte (images) or mean
    absolute sample (audio)."""
    b = bytes(payload)
    if b[:2] == b"P6":
        w, h, px = decode_ppm(b)
        return {"kind": "ppm", "width": w, "height": h,
                "n_samples": int(px.size), "mean_val": float(px.mean())}
    if b[:2] == b"BM":
        w, h, px = decode_bmp(b)
        return {"kind": "bmp", "width": w, "height": h,
                "n_samples": int(px.size), "mean_val": float(px.mean())}
    if b[:4] == b"RIFF":
        rate, s = decode_wav(b)
        return {"kind": "wav", "width": None, "height": None,
                "n_samples": int(s.size),
                "mean_val": float(np.abs(s.astype(np.float64)).mean())}
    raise ValueError("unknown payload magic")


MEDIA_FEATURE_SCHEMA = (
    "id long, kind string, width long, height long, "
    "n_samples long, mean_val double"
)


def with_ppm_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    width: int = 4, height: int = 4,
) -> DataFrame:
    """Deterministic REAL image payloads from the documents table: a P6
    PPM whose pixel bytes are the first ``w*h*3`` utf-8 bytes of the
    (space-padded) text. Oracle-recomputable byte-for-byte, and a real
    decoder exercises the header parse + pixel math."""
    n = width * height * 3
    header = F.lit(b"P6\n%d %d\n255\n" % (width, height))
    body = F.encode(F.substring(F.rpad(F.col(text_col), n, " "), 1, n), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.concat(header, body).alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
    )


def with_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_samples: int = 48, sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic REAL audio payloads from the documents table: a
    mono 16-bit PCM WAV whose samples are the first ``n_samples``
    utf-8 bytes of the (space-padded) text. The 44-byte RIFF header is
    a constant for fixed (rate, n_samples) and the int16
    little-endian sample encoding of byte values < 128 is each text
    byte followed by 0x00 — so the whole payload is PURE CATALYST
    (literal header concat + a regexp interleave), no UDF, and the
    oracle recomputes the decoded samples from ``ascii()`` per
    position."""
    header = bytes(encode_wav(
        np.zeros(n_samples, dtype=np.int16), sample_rate
    ))[:44]
    padded = F.substring(F.rpad(F.col(text_col), n_samples, " "), 1, n_samples)
    # The ASCII-only contract is ENFORCED here, not just documented: a
    # char > 0x7F encodes multi-byte under utf-8 and would silently
    # desync the body length from the header's declared data size, so
    # non-ASCII maps to space (0x20) first. int16 LE of an ASCII byte v
    # is (v, 0x00): interleave a NUL after every character — with (?s)
    # so '.' also matches line terminators (a newline otherwise skips
    # its NUL and corrupts every later sample) — then encode; bytes are
    # preserved 1:1 by utf-8 for the ASCII range.
    ascii_only = F.regexp_replace(padded, "[^\x00-\x7F]", " ")
    body = F.encode(F.regexp_replace(ascii_only, "(?s)(.)", "$1\u0000"), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.concat(F.lit(header), body).alias("payload"),
        F.lit("audio/wav").alias("mime"),
    )


def media_features(payload_df: DataFrame) -> DataFrame:
    """REAL decode feature extraction over binary payloads (PPM/BMP/WAV
    sniffed by magic), Arrow-batched via mapInPandas. Each batch decodes
    in numpy — no per-row Python in the driver, no external libraries."""

    # NESTED so cloudpickle ships it by value (workers can't import this
    # package under the driver's vanilla session) — the decoders are
    # inlined below as locals for the same reason.
    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _ppm(b):
            # scanner, not split(): pixel data may begin with a
            # whitespace-valued byte; '#' comments and truncation are
            # handled IDENTICALLY to the driver-side _ppm_header so the
            # two decoders can never diverge on a spec-valid payload
            ws = b" \t\r\n\x0b\x0c"
            pos, vals = 2, []
            while len(vals) < 3:
                while b[pos] in ws:
                    pos += 1
                if b[pos:pos + 1] == b"#":
                    while b[pos:pos + 1] not in (b"\n", b""):
                        pos += 1
                    continue
                start = pos
                while b[pos] not in ws:
                    pos += 1
                vals.append(int(b[start:pos]))
            w, h, maxval = vals
            if maxval != 255:
                raise ValueError(f"unsupported PPM maxval {maxval}")
            need = w * h * 3
            data = b[pos + 1:pos + 1 + need]
            if len(data) < need:
                raise ValueError(
                    f"PPM payload truncated: {len(data)} < {need}"
                )
            px = _np.frombuffer(data, dtype=_np.uint8)
            return "ppm", w, h, int(px.size), float(px.mean())

        def _bmp(b):
            off = _struct.unpack_from("<I", b, 10)[0]
            w = _struct.unpack_from("<i", b, 18)[0]
            h = abs(_struct.unpack_from("<i", b, 22)[0])
            bpp = _struct.unpack_from("<H", b, 28)[0]
            comp = _struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0:
                # same guard as the driver-side decode_bmp: a 32-bit or
                # RLE BMP must fail loudly, not yield wrong-stride stats
                raise ValueError(
                    f"unsupported BMP (bpp={bpp}, compression={comp})"
                )
            row = w * 3
            stride = row + (4 - row % 4) % 4
            rows = [_np.frombuffer(b[off + i * stride:off + i * stride + row],
                                   dtype=_np.uint8) for i in range(h)]
            px = _np.concatenate(rows) if rows else _np.empty(0, _np.uint8)
            return "bmp", w, h, int(px.size), float(px.mean())

        def _wav(b):
            pos, rate, ch, data = 12, None, 1, None
            while pos + 8 <= len(b):
                cid = b[pos:pos + 4]
                clen = _struct.unpack_from("<I", b, pos + 4)[0]
                body = b[pos + 8:pos + 8 + clen]
                if cid == b"fmt ":
                    afmt, ch, rate, _, _, bits = _struct.unpack_from(
                        "<HHIIHH", body, 0
                    )
                    if afmt != 1 or bits != 16:
                        # mirror driver-side decode_wav's contract
                        raise ValueError(
                            f"unsupported WAV (fmt={afmt}, bits={bits})"
                        )
                elif cid == b"data":
                    data = body
                pos += 8 + clen + (clen % 2)
            if rate is None or data is None:
                raise ValueError("WAV missing fmt/data chunk")
            s = _np.frombuffer(data, dtype="<i2")
            return ("wav", None, None, int(s.size),
                    float(_np.abs(s.astype(_np.float64)).mean()))

        for pdf in batches:
            recs = []
            for pid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    kind, w, h, n, m = _ppm(b)
                elif b[:2] == b"BM":
                    kind, w, h, n, m = _bmp(b)
                elif b[:4] == b"RIFF":
                    kind, w, h, n, m = _wav(b)
                else:
                    raise ValueError("unknown payload magic")
                recs.append((pid, kind, w, h, n, m))
            yield _pd.DataFrame(
                recs,
                columns=["id", "kind", "width", "height", "n_samples", "mean_val"],
            )

    return payload_df.select("id", "payload").mapInPandas(
        feature_batches, schema=MEDIA_FEATURE_SCHEMA
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


# --------------------------------------------------------------------- #
# Video plumbing: multi-frame containers, frame sampling, resize.
# --------------------------------------------------------------------- #
# Container format (deterministic, library-free): b"VID0" + u32 frame
# count + per frame (u32 length + frame bytes). Frames are ordinary
# single-image payloads (PPM here), so every image operator composes
# with the sampled output.

VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[bytes]) -> bytes:
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_video(payload: bytes) -> list[bytes]:
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 container")
    n = struct.unpack_from("<I", payload, 4)[0]
    pos, frames = 8, []
    for _ in range(n):
        ln = struct.unpack_from("<I", payload, pos)[0]
        frames.append(payload[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    return frames


def with_video_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_frames: int = 4, width: int = 2, height: int = 2,
) -> DataFrame:
    """Deterministic multi-frame payloads from the documents table:
    frame ``f`` is a P6 PPM whose pixels are bytes
    ``[f*w*h*3, (f+1)*w*h*3)`` of the space-padded text — the
    oracle replays every frame's pixel math from plain ``ascii()``."""
    n = width * height * 3
    header = F.lit(b"P6\n%d %d\n255\n" % (width, height))
    frame_len = len(b"P6\n%d %d\n255\n" % (width, height)) + n
    # The frame prefix declares a FIXED byte length, but utf-8 encodes
    # non-ASCII chars multi-byte — one such char would desync every later
    # VID0 frame boundary. Clamp to the 1-byte range first, exactly as
    # with_wav_payload does for its PCM body (ADVICE r6). Staged through
    # its own projection so the regexp evaluates ONCE per row — inlined
    # into the per-frame substrings, CollapseProject would have run it
    # num_frames times (plan-counted).
    staged = df.withColumn(
        "_vp_padded",
        F.regexp_replace(
            F.rpad(F.col(text_col), n * num_frames, " "),
            "[^\x00-\x7F]", " ",
        ),
    )
    frames = [
        F.concat(
            F.lit(struct.pack("<I", frame_len)),
            header,
            F.encode(F.substring(F.col("_vp_padded"), f * n + 1, n), "utf-8"),
        )
        for f in range(num_frames)
    ]
    return staged.select(
        F.col(id_col).cast("long").alias("id"),
        F.concat(
            F.lit(VIDEO_MAGIC + struct.pack("<I", num_frames)), *frames
        ).alias("payload"),
        F.lit("video/x-vid0").alias("mime"),
    )


def frame_sample(payload_df: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every ``every_k``-th frame out of VID0 containers:
    ``(id, frame_no, payload)`` with one row per KEPT frame, each
    payload a standalone single-image payload. Arrow-batched
    ``mapInPandas``; the batch fans out rows, so downstream per-frame
    operators (features, resize) see an ordinary image table. At scale
    the sampled table is ``1/every_k`` the byte volume of the source —
    sampling BEFORE decode/feature work is the point."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1 (got {every_k})")
    k = every_k

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        for pdf in batches:
            ids, fnos, outs = [], [], []
            for pid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    raise ValueError("unknown payload magic")
                n = _struct.unpack_from("<I", b, 4)[0]
                pos = 8
                for f in range(n):
                    ln = _struct.unpack_from("<I", b, pos)[0]
                    if f % k == 0:
                        ids.append(pid)
                        fnos.append(f)
                        outs.append(b[pos + 4:pos + 4 + ln])
                    pos += 4 + ln
            yield _pd.DataFrame(
                {"id": ids, "frame_no": fnos, "payload": outs}
            )

    return payload_df.select("id", "payload").mapInPandas(
        sample_batches, schema="id long, frame_no long, payload binary"
    )


def video_frame_dhash(payload_df: DataFrame, every_k: int = 1) -> DataFrame:
    """``(id, frame_no, dhash)`` — frame sampling and 48-bit dHash in
    ONE Arrow boundary crossing: the fused twin of
    ``dhash_table(frame_sample(df, k), extra_cols=("frame_no",))``,
    bit-identical output (same VID0 walk, same PPM/BMP decode, same
    grid/luma/gradient math).

    Why fused (guide §4.1): the two-operator chain ships every sampled
    frame payload JVM -> Python -> JVM -> Python -> JVM — the bytes
    cross the boundary twice and the intermediate frame table is pure
    transit. Here the container crosses once and only 16-byte
    ``(id, frame_no, dhash)`` rows return; at video scale the saved
    traffic is the frame byte volume itself."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1 (got {every_k})")
    k = every_k

    # NESTED so cloudpickle ships everything by value — workers cannot
    # import lshrs_spark when the driver owns the session.
    def fused_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        G_ROWS, G_COLS = 8, 7

        def _ppm(b):
            # same scanner as dhash_table's decoder
            ws = b" \t\r\n\x0b\x0c"
            pos, vals = 2, []
            while len(vals) < 3:
                while b[pos] in ws:
                    pos += 1
                if b[pos:pos + 1] == b"#":
                    while b[pos:pos + 1] not in (b"\n", b""):
                        pos += 1
                    continue
                start = pos
                while b[pos:pos + 1] and b[pos] not in ws:
                    pos += 1
                vals.append(int(b[start:pos]))
            w, h = vals[0], vals[1]
            off = pos + 1
            px = _np.frombuffer(b[off:off + w * h * 3], dtype=_np.uint8)
            if px.size != w * h * 3:
                raise ValueError("truncated PPM body")
            return px.reshape(h, w, 3)

        def _bmp(b):
            off = _struct.unpack_from("<I", b, 10)[0]
            w = _struct.unpack_from("<i", b, 18)[0]
            h_raw = _struct.unpack_from("<i", b, 22)[0]
            h = abs(h_raw)
            bpp = _struct.unpack_from("<H", b, 28)[0]
            comp = _struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0:
                raise ValueError(
                    f"unsupported BMP (bpp={bpp}, compression={comp})"
                )
            row = w * 3
            stride = row + (4 - row % 4) % 4
            rows = [
                _np.frombuffer(
                    b[off + i * stride:off + i * stride + row], _np.uint8
                ).reshape(w, 3)
                for i in range(h)
            ]
            if h_raw > 0:
                rows.reverse()
            return _np.stack(rows) if rows else _np.empty((0, 0, 3), _np.uint8)

        def _one(b):
            if b[:2] == b"P6":
                px = _ppm(b)
            elif b[:2] == b"BM":
                px = _bmp(b)
            else:
                raise ValueError("video_frame_dhash: frame is not PPM/BMP")
            h, w = px.shape[0], px.shape[1]
            rr = [(r * h) // G_ROWS for r in range(G_ROWS)]
            cc = [(c * w) // G_COLS for c in range(G_COLS)]
            luma = px.astype(_np.int64).sum(axis=2)
            grid = luma[_np.ix_(rr, cc)]
            left, right = grid[:, :-1], grid[:, 1:]
            bits = (left > right).astype(_np.int64).reshape(-1)
            return int((bits << _np.arange(G_ROWS * (G_COLS - 1))).sum())

        for pdf in batches:
            ids, fnos, hashes = [], [], []
            for pid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    raise ValueError("unknown payload magic")
                n = _struct.unpack_from("<I", b, 4)[0]
                pos = 8
                for f in range(n):
                    ln = _struct.unpack_from("<I", b, pos)[0]
                    if f % k == 0:
                        ids.append(int(pid))
                        fnos.append(f)
                        hashes.append(_one(b[pos + 4:pos + 4 + ln]))
                    pos += 4 + ln
            yield _pd.DataFrame(
                {"id": ids, "frame_no": fnos, "dhash": hashes}
            )

    return payload_df.select("id", "payload").mapInPandas(
        fused_batches, schema="id long, frame_no long, dhash long"
    )


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an ``(h, w, 3)`` uint8 array — pure
    numpy index gather (the deterministic resize an oracle can replay;
    swap in a real resampler where quality matters)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


def media_resize(payload_df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize PPM payloads to ``out_w x out_h`` (nearest neighbor):
    ``(id, payload, width, height)``, payloads re-encoded as P6 PPM.
    Arrow-batched ``mapInPandas``; decode → index gather → re-encode is
    all numpy, no per-row Python on the driver and no image libraries."""
    if out_w < 1 or out_h < 1:
        raise ValueError("resize dimensions must be >= 1")
    ow, oh = out_w, out_h

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        ws = b" \t\r\n\x0b\x0c"

        def _ppm(b):
            # same scanner contract as media_features' worker decoder
            pos, vals = 2, []
            while len(vals) < 3:
                while b[pos] in ws:
                    pos += 1
                if b[pos:pos + 1] == b"#":
                    while b[pos:pos + 1] not in (b"\n", b""):
                        pos += 1
                    continue
                start = pos
                while b[pos] not in ws:
                    pos += 1
                vals.append(int(b[start:pos]))
            w, h, maxval = vals
            if maxval != 255:
                raise ValueError(f"unsupported PPM maxval {maxval}")
            need = w * h * 3
            data = b[pos + 1:pos + 1 + need]
            if len(data) < need:
                raise ValueError(f"PPM payload truncated: {len(data)} < {need}")
            return w, h, _np.frombuffer(data, dtype=_np.uint8).reshape(h, w, 3)

        for pdf in batches:
            ids, outs = [], []
            for pid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"P6":
                    raise ValueError("media_resize expects P6 PPM payloads")
                w, h, px = _ppm(b)
                ys = (_np.arange(oh) * h) // oh
                xs = (_np.arange(ow) * w) // ow
                resized = px[ys][:, xs]
                ids.append(pid)
                outs.append(
                    b"P6\n%d %d\n255\n" % (ow, oh) + resized.tobytes()
                )
            yield _pd.DataFrame({
                "id": ids, "payload": outs,
                "width": [ow] * len(ids), "height": [oh] * len(ids),
            })

    return payload_df.select("id", "payload").mapInPandas(
        resize_batches, schema="id long, payload binary, width long, height long"
    )


# --------------------------------------------------------------------- #
# Perceptual hashing: image near-duplicate fingerprints
# --------------------------------------------------------------------- #
# dHash (difference hash) is the standard image-dedup pass of a
# multimodal training pipeline: sample the decoded image down to a tiny
# luma grid and record, per row, whether each pixel is brighter than its
# right neighbor. Near-identical images (recompression, slight crops,
# brightness shifts) agree on most gradient signs, so near-dups sit
# within a small Hamming distance. 48 bits (8 rows x 6 gradients from a
# 7-column grid) keeps the fingerprint inside the same safe integer
# range as the repo's other portable hashes (h48 / SimHash), so a SQL
# oracle replays it exactly and the pigeonhole banding machinery
# (`operators.dedup.simhash_blocks`) applies unchanged.

DHASH_GRID_ROWS = 8
DHASH_GRID_COLS = 7
DHASH_BITS = DHASH_GRID_ROWS * (DHASH_GRID_COLS - 1)  # 48


def dhash48(pixels: np.ndarray) -> int:
    """Driver-side reference dHash of an ``(h, w, 3)`` uint8 array —
    the differential twin of the worker-side batch implementation in
    :func:`dhash_table`. Nearest-neighbor sampling onto the 8x7 grid
    (``row r -> r*h//8``, ``col c -> c*w//7`` — identity when the image
    IS 7x8), integer luma = r+g+b, bit ``r*6+c`` set iff
    ``luma(r, c) > luma(r, c+1)``."""
    h, w = pixels.shape[0], pixels.shape[1]
    rr = [(r * h) // DHASH_GRID_ROWS for r in range(DHASH_GRID_ROWS)]
    cc = [(c * w) // DHASH_GRID_COLS for c in range(DHASH_GRID_COLS)]
    luma = pixels.astype(np.int64).sum(axis=2)
    grid = luma[np.ix_(rr, cc)]
    out = 0
    for r in range(DHASH_GRID_ROWS):
        for c in range(DHASH_GRID_COLS - 1):
            if grid[r, c] > grid[r, c + 1]:
                out |= 1 << (r * (DHASH_GRID_COLS - 1) + c)
    return out


def dhash_table(
    payload_df: DataFrame, extra_cols: tuple = ()
) -> DataFrame:
    """``(id, *extra_cols, dhash)`` — 48-bit perceptual difference hash
    over binary image payloads (P6 PPM / 24bpp BMP sniffed by magic),
    decoded and hashed inside Arrow-batched ``mapInPandas``: no
    per-row Python, no external media libraries, and the whole pass is
    a narrow map over the payload column (scale shape: embarrassingly
    parallel, output is 16 bytes/row). ``extra_cols`` names long-typed
    columns carried through unchanged (e.g. ``frame_no`` when hashing
    a :func:`frame_sample` table, where ``id`` alone is not unique).
    Feed the result to
    :func:`~lshrs_spark.operators.dedup.image_dhash_pairs` for the
    Hamming-banded near-dup join."""
    extra_cols = tuple(extra_cols)

    # NESTED so cloudpickle ships everything by value — workers cannot
    # import lshrs_spark when the driver owns the session (see
    # media_features for the same pattern).
    def dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        G_ROWS, G_COLS = 8, 7

        def _ppm(b):
            # same scanner as media_features' decoder: '#' comments,
            # single whitespace after maxval, pixel data may start with
            # a whitespace-valued byte
            ws = b" \t\r\n\x0b\x0c"
            pos, vals = 2, []
            while len(vals) < 3:
                while b[pos] in ws:
                    pos += 1
                if b[pos:pos + 1] == b"#":
                    while b[pos:pos + 1] not in (b"\n", b""):
                        pos += 1
                    continue
                start = pos
                while b[pos:pos + 1] and b[pos] not in ws:
                    pos += 1
                vals.append(int(b[start:pos]))
            w, h = vals[0], vals[1]
            off = pos + 1
            px = _np.frombuffer(b[off:off + w * h * 3], dtype=_np.uint8)
            if px.size != w * h * 3:
                raise ValueError("truncated PPM body")
            return px.reshape(h, w, 3)

        def _bmp(b):
            off = _struct.unpack_from("<I", b, 10)[0]
            w = _struct.unpack_from("<i", b, 18)[0]
            h_raw = _struct.unpack_from("<i", b, 22)[0]
            h = abs(h_raw)
            bpp = _struct.unpack_from("<H", b, 28)[0]
            comp = _struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0:
                raise ValueError(
                    f"unsupported BMP (bpp={bpp}, compression={comp})"
                )
            row = w * 3
            stride = row + (4 - row % 4) % 4
            rows = [
                _np.frombuffer(
                    b[off + i * stride:off + i * stride + row], _np.uint8
                ).reshape(w, 3)
                for i in range(h)
            ]
            if h_raw > 0:       # positive height = bottom-up file order
                rows.reverse()  # -> top-down, same orientation as PPM
            return _np.stack(rows) if rows else _np.empty((0, 0, 3), _np.uint8)

        def _one(b):
            b = bytes(b)
            if b[:2] == b"P6":
                px = _ppm(b)
            elif b[:2] == b"BM":
                px = _bmp(b)
            else:
                raise ValueError("dhash_table: payload is not PPM/BMP")
            h, w = px.shape[0], px.shape[1]
            rr = [(r * h) // G_ROWS for r in range(G_ROWS)]
            cc = [(c * w) // G_COLS for c in range(G_COLS)]
            luma = px.astype(_np.int64).sum(axis=2)
            grid = luma[_np.ix_(rr, cc)]
            left, right = grid[:, :-1], grid[:, 1:]
            bits = (left > right).astype(_np.int64).reshape(-1)
            return int((bits << _np.arange(G_ROWS * (G_COLS - 1))).sum())

        for pdf in batches:
            out = {"id": pdf["id"].astype("int64")}
            for c in extra_cols:
                out[c] = pdf[c].astype("int64")
            out["dhash"] = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(out)

    schema = "id long, " + "".join(f"{c} long, " for c in extra_cols) + \
        "dhash long"
    return payload_df.select("id", *extra_cols, "payload").mapInPandas(
        dhash_batches, schema=schema
    )


# --------------------------------------------------------------------- #
# Audio perceptual fingerprint (near-dup dedup for audio payloads)
# --------------------------------------------------------------------- #

AFP_FRAMES = 6        # analysis frames over the clip head
AFP_FRAME_LEN = 8     # samples per frame (48 samples total)
AFP_BANDS = 7         # DCT-II bands k = 1..7 per frame (DC skipped)
AFP_BITS = AFP_FRAMES * (AFP_BANDS - 1)   # 36-bit fingerprint
AFP_COEF_SCALE = 1_000_000


def afp_coeffs() -> np.ndarray:
    """``(bands, frame_len)`` int64 DCT-II cosine coefficients in
    fixed point (``round(cos(pi*k*(2n+1)/(2L)) * 1e6)``). Fixed-point
    INTEGERS on purpose: band magnitudes become exact integer dot
    products, so the Spark workers, the driver reference and the
    DuckDB oracle compare identical ints — never floats whose last
    ulp could flip a bit between engines."""
    k = np.arange(1, AFP_BANDS + 1)[:, None]
    n = np.arange(AFP_FRAME_LEN)[None, :]
    return np.round(
        np.cos(np.pi * k * (2 * n + 1) / (2 * AFP_FRAME_LEN))
        * AFP_COEF_SCALE
    ).astype(np.int64)


def audio_fingerprint(samples) -> int:
    """Driver-side reference fingerprint of a PCM sample array — the
    differential twin of the worker-side batch implementation in
    :func:`audio_fingerprint_table` (Chromaprint-style, public
    technique: per frame, compare adjacent spectral-band magnitudes
    and keep the SIGNS). Frame f's band magnitudes are
    ``|sum_n coeff[k][n] * s[8f+n]|`` (integer DCT-II, DC skipped —
    level shifts cancel in band energy); bit ``f*6 + j`` is set iff
    band ``j+1``'s magnitude exceeds band ``j+2``'s. A re-encoded /
    slightly re-leveled copy keeps most band ORDERINGS even when
    absolute energies move — the audio analogue of dHash's gradient
    signs. Uses the first 48 samples, zero-padded when shorter."""
    need = AFP_FRAMES * AFP_FRAME_LEN
    flat = np.asarray(samples, dtype=np.int64).reshape(-1)  # (n, ch) ok
    s = np.zeros(need, dtype=np.int64)
    m = min(flat.size, need)
    s[:m] = flat[:m]
    mags = np.abs(s.reshape(AFP_FRAMES, AFP_FRAME_LEN) @ afp_coeffs().T)
    out = 0
    for f in range(AFP_FRAMES):
        for j in range(AFP_BANDS - 1):
            if mags[f, j] > mags[f, j + 1]:
                out |= 1 << (f * (AFP_BANDS - 1) + j)
    return out


def audio_fingerprint_table(payload_df: DataFrame) -> DataFrame:
    """``(id, afp)`` — 36-bit perceptual audio fingerprint over binary
    WAV payloads, decoded and hashed inside Arrow-batched
    ``mapInPandas``: no per-row Python on the hot loop (one integer
    matmul per batch), no external audio libraries, narrow map over
    the payload column. Feed the result to
    :func:`~lshrs_spark.operators.dedup.audio_fingerprint_pairs` for
    the Hamming-banded near-dup join."""

    # NESTED so cloudpickle ships everything by value — workers cannot
    # import lshrs_spark when the driver owns the session (see
    # media_features for the same pattern).
    def afp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        FRAMES, FLEN, BANDS, SCALE = 6, 8, 7, 1_000_000
        k = _np.arange(1, BANDS + 1)[:, None]
        n = _np.arange(FLEN)[None, :]
        coeffs = _np.round(
            _np.cos(_np.pi * k * (2 * n + 1) / (2 * FLEN)) * SCALE
        ).astype(_np.int64)

        def _samples(b):
            pos, rate, data = 12, None, None
            while pos + 8 <= len(b):
                cid = b[pos:pos + 4]
                clen = _struct.unpack_from("<I", b, pos + 4)[0]
                body = b[pos + 8:pos + 8 + clen]
                if cid == b"fmt ":
                    afmt, _, rate, _, _, bits = _struct.unpack_from(
                        "<HHIIHH", body, 0
                    )
                    if afmt != 1 or bits != 16:
                        raise ValueError(
                            f"unsupported WAV (fmt={afmt}, bits={bits})"
                        )
                elif cid == b"data":
                    data = body
                pos += 8 + clen + (clen % 2)
            if rate is None or data is None:
                raise ValueError("WAV missing fmt/data chunk")
            return _np.frombuffer(data, dtype="<i2")

        need = FRAMES * FLEN
        for pdf in batches:
            mat = _np.zeros((len(pdf), need), dtype=_np.int64)
            for row, payload in enumerate(pdf["payload"]):
                s = _samples(bytes(payload))
                m = min(s.size, need)
                mat[row, :m] = s[:m].astype(_np.int64)
            mags = _np.abs(
                mat.reshape(len(pdf), FRAMES, FLEN) @ coeffs.T
            )  # (rows, frames, bands)
            bits = mags[:, :, :-1] > mags[:, :, 1:]   # (rows, frames, 6)
            weights = (
                1 << _np.arange(FRAMES * (BANDS - 1), dtype=_np.int64)
            )
            afp = (
                bits.reshape(len(pdf), -1).astype(_np.int64) @ weights
            )
            yield _pd.DataFrame(
                {"id": pdf["id"].astype("int64"), "afp": afp}
            )

    return payload_df.select("id", "payload").mapInPandas(
        afp_batches, schema="id long, afp long"
    )
