"""Multimodal binary-column plumbing + REAL pure-numpy decoders
(PPM/BMP/WAV): roundtrip, cross-format agreement, and the Arrow-batched
mapInPandas feature path."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from lshrs_spark.multimodal import (
    decode_bmp,
    decode_image_stub,
    decode_payload,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    extract_features,
    media_features,
    with_binary_payload,
    with_ppm_payload,
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


def test_ppm_roundtrip_random_pixels():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    # force a whitespace-valued first pixel byte — the header scanner
    # must not swallow it
    px[0, 0, 0] = 0x20
    w, h, out = decode_ppm(encode_ppm(px))
    assert (w, h) == (7, 5)
    assert np.array_equal(out, px)


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.default_rng(4)
    # width 3 -> 9-byte rows -> 3 padding bytes: exercises the stride math
    px = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    w, h, out = decode_bmp(encode_bmp(px))
    assert (w, h) == (3, 4)
    assert np.array_equal(out, px)


def test_wav_roundtrip():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32767, size=512, dtype=np.int16)
    rate, out = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert out.shape == (512, 1)
    assert np.array_equal(out.ravel(), s)


def test_decode_payload_unified_features():
    px = np.full((2, 2, 3), 10, dtype=np.uint8)
    f = decode_payload(encode_ppm(px))
    assert f == {"kind": "ppm", "width": 2, "height": 2,
                 "n_samples": 12, "mean_val": 10.0}
    f = decode_payload(encode_bmp(px))
    assert (f["kind"], f["mean_val"]) == ("bmp", 10.0)
    f = decode_payload(encode_wav(np.array([-3, 3, 3, -3], dtype=np.int16)))
    assert (f["kind"], f["n_samples"], f["mean_val"]) == ("wav", 4, 3.0)
    with pytest.raises(ValueError, match="magic"):
        decode_payload(b"\x89PNG....")


def test_media_features_matches_driver_decode(spark):
    """The mapInPandas decode must agree with the driver-side decoders
    byte-for-byte, across all three formats in one DataFrame."""
    rng = np.random.default_rng(6)
    payloads = [
        encode_ppm(rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)),
        encode_bmp(rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)),
        encode_wav(rng.integers(-1000, 1000, size=64, dtype=np.int16)),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, payload binary"
    )
    got = {r.id: r.asDict() for r in media_features(df).collect()}
    for i, p in enumerate(payloads):
        want = decode_payload(p)
        assert got[i]["kind"] == want["kind"]
        assert got[i]["width"] == want["width"]
        assert got[i]["height"] == want["height"]
        assert got[i]["n_samples"] == want["n_samples"]
        assert got[i]["mean_val"] == pytest.approx(want["mean_val"])


def test_ppm_payload_entry_shape(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 48), (1, "b c d " * 10)], "doc_id long, text string"
    )
    feats = {r.id: r for r in
             media_features(with_ppm_payload(docs)).collect()}
    assert feats[0].width == 4 and feats[0].height == 4
    assert feats[0].n_samples == 48
    assert feats[0].mean_val == pytest.approx(ord("a"))


def test_decode_stub_raises_without_decoder():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="decode"):
        decode_image_stub(b"\x89PNG")


def test_malformed_payloads_fail_identically_on_both_paths(spark):
    """Worker-side decoders must enforce the same format guards as the
    driver-side ones (ADVICE r2): a 32-bit BMP or float WAV raises on
    BOTH paths instead of silently producing wrong-stride stats."""
    import struct

    rng = np.random.default_rng(7)
    bmp = bytearray(encode_bmp(rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)))
    struct.pack_into("<H", bmp, 28, 32)            # claim 32 bpp
    wav = bytearray(encode_wav(np.zeros(8, dtype=np.int16)))
    struct.pack_into("<H", wav, 20, 3)             # claim IEEE-float fmt
    for bad, msg in ((bytes(bmp), "unsupported BMP"),
                     (bytes(wav), "unsupported WAV")):
        with pytest.raises(ValueError, match=msg):
            decode_payload(bad)
        df = spark.createDataFrame([(0, bad)], "id long, payload binary")
        with pytest.raises(Exception, match=msg):
            media_features(df).collect()


def test_video_container_roundtrip():
    from lshrs_spark.multimodal import decode_video, encode_video

    frames = [b"frame0", b"", b"a longer frame payload \x00\xff"]
    assert decode_video(encode_video(frames)) == frames
    with pytest.raises(ValueError):
        decode_video(b"nope")


def test_frame_sample_keeps_every_kth(spark):
    from lshrs_spark.multimodal import (
        decode_ppm,
        frame_sample,
        with_video_payload,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 48), (2, "b" * 48)], ["doc_id", "text"]
    )
    vids = with_video_payload(docs, num_frames=4, width=2, height=2)
    got = frame_sample(vids, every_k=2).collect()
    assert sorted((r.id, r.frame_no) for r in got) == [
        (1, 0), (1, 2), (2, 0), (2, 2)
    ]
    # sampled frames are standalone, decodable PPMs
    w, h, px = decode_ppm(bytes(got[0].payload))
    assert (w, h, px.shape) == (2, 2, (2, 2, 3))
    with pytest.raises(ValueError):
        frame_sample(vids, every_k=0)


def test_media_resize_nearest_neighbor(spark):
    import numpy as np

    from lshrs_spark.multimodal import (
        decode_ppm,
        encode_ppm,
        media_resize,
        resize_nearest,
    )

    # 4x4 image with distinct per-pixel values
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame([(7, bytearray(encode_ppm(px)))],
                               "id long, payload binary")
    out = media_resize(df, 2, 2).collect()[0]
    assert (out.width, out.height) == (2, 2)
    _, _, got = decode_ppm(bytes(out.payload))
    # nearest-neighbor picks rows/cols 0 and 2
    assert (got == px[[0, 2]][:, [0, 2]]).all()
    # driver-side helper agrees with the worker path
    assert (resize_nearest(px, 2, 2) == got).all()
    # upscale: every source pixel replicated, lossless downscale-back
    up = resize_nearest(px, 8, 8)
    assert (resize_nearest(up, 4, 4) == px).all()


def test_frame_sample_empty_video(spark):
    from lshrs_spark.multimodal import encode_video, frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(encode_video([])))], "id long, payload binary"
    )
    assert frame_sample(df, every_k=2).count() == 0


def test_wav_payload_pure_catalyst_round_trip(spark):
    """with_wav_payload builds byte-exact WAV files without any UDF:
    decode_wav must recover the text bytes as int16 samples."""
    from lshrs_spark.multimodal import decode_wav, with_wav_payload

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "x" * 100)], "doc_id long, text string"
    )
    rows = {r.id: bytes(r.payload) for r in with_wav_payload(docs).collect()}
    for i, txt in ((0, "hello world"), (1, "x" * 100)):
        rate, samples = decode_wav(rows[i])
        assert rate == 16000 and samples.shape == (48, 1)
        want = [ord(c) for c in (txt + " " * 48)[:48]]
        assert list(samples[:, 0]) == want


def test_wav_payload_newline_and_non_ascii_safe(spark):
    """ADVICE r4: '.' without (?s) skips line terminators (their NUL
    never interleaves -> body shorter than the header claims) and
    non-ASCII chars encode multi-byte. Newlines now carry through as
    sample value 10; non-ASCII clamps to 32 (space), keeping the body
    exactly 2*n_samples bytes."""
    from lshrs_spark.multimodal import decode_wav, with_wav_payload

    df = spark.createDataFrame(
        [(1, "ab\ncd"), (2, "héllo☃")],  # newline, é, snowman
        "doc_id long, text string",
    )
    rows = {r.id: bytes(r.payload)
            for r in with_wav_payload(df, n_samples=8).collect()}
    for payload in rows.values():
        assert len(payload) == 44 + 2 * 8        # header + int16 samples
    rate, s1 = decode_wav(rows[1])
    assert list(s1) == [97, 98, 10, 99, 100, 32, 32, 32]
    _, s2 = decode_wav(rows[2])
    assert list(s2) == [104, 32, 108, 108, 111, 32, 32, 32]


def test_dhash48_reference_known_grid():
    """Hand-computed dHash on a 7x8 identity-grid image: bit r*6+c set
    iff luma(r,c) > luma(r,c+1)."""
    from lshrs_spark.multimodal import dhash48

    px = np.zeros((8, 7, 3), dtype=np.uint8)
    px[0, 0] = (10, 0, 0)          # luma row0: 10,0,0,... -> bit 0 set
    px[3, 2] = (0, 5, 1)           # luma row3 col2=6 > col3=0 -> bit 3*6+2
    want = (1 << 0) | (1 << (3 * 6 + 2))
    assert dhash48(px) == want


def test_dhash48_nearest_neighbor_sampling_identity_vs_scaled():
    """A 14x16 image that block-replicates a 7x8 image hashes
    identically — nearest-neighbor grid sampling hits the same pixels."""
    from lshrs_spark.multimodal import dhash48

    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    big = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    assert dhash48(big) == dhash48(small)


def test_dhash_table_matches_driver_reference(spark):
    """Worker-side batch dHash == driver-side dhash48 on real PPM
    payloads built from document text (differential test)."""
    from lshrs_spark.multimodal import (
        decode_ppm,
        dhash48,
        dhash_table,
        with_ppm_payload,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} " * 20) for i in range(20)]
        + [(100, "")],
        "doc_id long, text string",
    )
    payloads = with_ppm_payload(docs, width=7, height=8)
    got = {r.id: r.dhash for r in dhash_table(payloads).collect()}
    for r in payloads.collect():
        _, _, px = decode_ppm(bytes(r.payload))
        assert got[r.id] == dhash48(px), r.id
    assert len(got) == 21


def test_dhash_bmp_matches_ppm_orientation(spark):
    """The same pixels as PPM and (bottom-up) BMP hash identically —
    the BMP decoder restores top-down row order."""
    from lshrs_spark.multimodal import dhash_table, encode_bmp, encode_ppm

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px))), (2, bytearray(encode_bmp(px)))],
        "id long, payload binary",
    )
    got = {r.id: r.dhash for r in dhash_table(df).collect()}
    assert got[1] == got[2]


def test_image_dhash_pairs_exact_banding(spark):
    """Near-identical images (1 flipped gradient bit) pair up with the
    right Hamming distance; unrelated images don't; result equals the
    brute-force distance over all pairs (pigeonhole exactness)."""
    from lshrs_spark.multimodal import dhash48, encode_ppm
    from lshrs_spark.operators.dedup import image_dhash_pairs

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = (255, 255, 255)       # perturb a couple of gradients
    other = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    imgs = {1: base, 2: near, 3: other}
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(p))) for i, p in imgs.items()],
        "id long, payload binary",
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in image_dhash_pairs(df, max_hamming=6).collect()}
    # brute force over the driver-side reference hashes
    hs = {i: dhash48(p) for i, p in imgs.items()}
    want = {}
    for a in imgs:
        for b in imgs:
            if a < b:
                d = bin(hs[a] ^ hs[b]).count("1")
                if d <= 6:
                    want[(a, b)] = d
    assert got == want
    assert (1, 2) in got               # the near-dup pair is found


def test_audio_fingerprint_table_matches_driver_reference(spark):
    """Worker-side batch fingerprint == driver-side audio_fingerprint
    on real WAV payloads built from document text (differential test),
    and a DC level shift leaves the fingerprint unchanged (band k>=1
    magnitudes are mean-invariant up to coefficient rounding)."""
    from lshrs_spark.multimodal import (
        audio_fingerprint,
        audio_fingerprint_table,
        decode_wav,
        with_wav_payload,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} " * 5) for i in range(20)]
        + [(100, "")],
        "doc_id long, text string",
    )
    payloads = with_wav_payload(docs)
    got = {r.id: r.afp for r in audio_fingerprint_table(payloads).collect()}
    for r in payloads.collect():
        _, samples = decode_wav(bytes(r.payload))
        assert got[r.id] == audio_fingerprint(samples), r.id
    assert len(got) == 21
    # level-shift invariance on the reference
    s = [ord(c) for c in "batch part spark line column order".ljust(48)[:48]]
    assert audio_fingerprint(s) == audio_fingerprint([x + 7 for x in s])


def test_audio_fingerprint_pairs_exact_banding(spark):
    """Near-identical clips pair with the right Hamming distance;
    unrelated clips don't; result equals the brute-force distance over
    all pairs (pigeonhole exactness over the 36-bit space)."""
    from lshrs_spark.multimodal import audio_fingerprint, encode_wav
    from lshrs_spark.operators.dedup import audio_fingerprint_pairs

    rng = np.random.default_rng(17)
    base = rng.integers(-3000, 3000, size=48).astype(np.int16)
    near = base.copy()
    near[:4] = base[:4] + 50           # perturb one frame slightly
    other = rng.integers(-3000, 3000, size=48).astype(np.int16)
    clips = {1: base, 2: near, 3: other}
    df = spark.createDataFrame(
        [(i, bytearray(encode_wav(c))) for i, c in clips.items()],
        "id long, payload binary",
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in audio_fingerprint_pairs(df, max_hamming=8).collect()}
    fps = {i: audio_fingerprint(c) for i, c in clips.items()}
    want = {}
    for a in clips:
        for b in clips:
            if a < b:
                d = bin(fps[a] ^ fps[b]).count("1")
                if d <= 8:
                    want[(a, b)] = d
    assert got == want
    assert (1, 2) in got               # the near-dup pair is found


def test_video_near_dup_pairs_shared_frames_and_stop_cap(spark):
    """Clips sharing identical frames pair with the right
    distinct-hash count; a frame hash present in more clips than
    max_hash_freq (the boilerplate/black-frame cap) contributes no
    pairs; dhash_table's extra_cols rides frame_no through."""
    from lshrs_spark.multimodal import (
        dhash_table,
        encode_ppm,
        encode_video,
        frame_sample,
    )
    from lshrs_spark.operators.dedup import video_near_dup_pairs

    rng = np.random.default_rng(23)
    fa, fb, fc = (
        rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
        for _ in range(3)
    )
    blank = np.zeros((8, 7, 3), dtype=np.uint8)   # shared boilerplate
    clips = {
        1: [fa, fb, blank],
        2: [fa, fb, blank],      # shares fa+fb with 1
        3: [fa, fc, blank],      # shares fa with 1 and 2
        4: [fc, fc, blank],      # shares fc with 3 (duplicated frame
                                 # counts ONCE: distinct hash overlap)
        5: [blank, blank, blank],  # only boilerplate — no pairs
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_video([bytes(encode_ppm(f)) for f in fs])))
         for i, fs in clips.items()],
        "id long, payload binary",
    )
    got = {
        (r.id_a, r.id_b): r.shared_frames
        for r in video_near_dup_pairs(df, max_hash_freq=4).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1, (3, 4): 1}
    # without the cap the blank frame links EVERY clip pair
    got_all = {
        (r.id_a, r.id_b)
        for r in video_near_dup_pairs(df).collect()
    }
    assert len(got_all) == 10                     # all C(5,2) pairs
    # extra_cols passthrough: one hash row per (id, frame_no)
    fh = dhash_table(
        frame_sample(df, 1).select("id", "frame_no", "payload"),
        extra_cols=("frame_no",),
    )
    rows = fh.collect()
    assert len(rows) == 15 and {r.frame_no for r in rows} == {0, 1, 2}


def test_video_payload_non_ascii_keeps_frame_boundaries(spark):
    """ADVICE r6: with_video_payload packs a FIXED byte-length prefix per
    frame but encoded text with utf-8 — one multi-byte char desynced
    every later VID0 frame boundary. Non-ASCII now clamps to space
    (0x20), the same rule as with_wav_payload's PCM body."""
    from lshrs_spark.multimodal import (
        decode_ppm,
        decode_video,
        with_video_payload,
    )

    df = spark.createDataFrame(
        [(1, "héllo☃" + "a" * 42), (2, "ab\ncd" + "z" * 43)],
        "doc_id long, text string",
    )
    rows = {r.id: bytes(r.payload)
            for r in with_video_payload(df, num_frames=4,
                                        width=2, height=2).collect()}
    for payload in rows.values():
        frames = decode_video(payload)
        assert len(frames) == 4
        for fr in frames:
            w, h, px = decode_ppm(fr)
            assert (w, h, px.shape) == (2, 2, (2, 2, 3))
    # the clamped chars read back as 0x20, neighbours untouched
    _, _, px0 = decode_ppm(decode_video(rows[1])[0])
    flat = list(px0.reshape(-1))
    assert flat[:6] == [ord("h"), 32, ord("l"), ord("l"), ord("o"), 32]


def test_video_near_dup_pairs_hamming_tolerant(spark):
    """VERDICT r6 #5: max_hamming=h matches frames whose dHash drifted
    <= h bits (routed through the shared pigeonhole banding core);
    max_hamming=0 stays the exact-equality fast path."""
    from lshrs_spark.operators.dedup import video_near_dup_pairs
    from lshrs_spark.multimodal import with_video_payload

    # clip 2's single frame differs from clip 1's in ONE luma gradient:
    # byte 100 ('z' vs 'a') lifts pixel 33's luma, flipping exactly the
    # (row 4, col 5 > col 6) comparison -> frame-hash Hamming distance 1
    base = "a" * 168
    drift = "a" * 100 + "z" + "a" * 67
    docs = spark.createDataFrame(
        [(1, base), (2, drift)], "doc_id long, text string"
    )
    vids = with_video_payload(docs, num_frames=1, width=7, height=8)

    assert video_near_dup_pairs(vids).count() == 0          # exact: miss
    got = video_near_dup_pairs(vids, max_hamming=2).collect()
    assert [(r.id_a, r.id_b, r.shared_frames) for r in got] == [(1, 2, 1)]

    # identical clips through the tolerant path: the self-edge (v, v)
    # counts once — h=0 semantics preserved under h>0
    twins = with_video_payload(
        spark.createDataFrame([(1, base), (2, base)],
                              "doc_id long, text string"),
        num_frames=1, width=7, height=8,
    )
    got2 = video_near_dup_pairs(twins, max_hamming=2).collect()
    assert [(r.id_a, r.id_b, r.shared_frames) for r in got2] == [(1, 2, 1)]

    with pytest.raises(ValueError):
        video_near_dup_pairs(vids, max_hamming=-1)
