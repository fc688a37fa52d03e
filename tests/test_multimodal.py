"""Multimodal pipeline: payload plumbing, fake-codec determinism,
batch shapes, and the NotImplementedError codec gate."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from axolotls_spark import multimodal as M
from axolotls_spark.io.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _manifest(spark):
    return M.attach_payload(load_table(spark, SF_DIR, "documents"))


def test_payload_bytes_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    rows = M.attach_payload(docs).join(docs, "doc_id").collect()
    for r in rows:
        assert bytes(r.payload) == r.text.encode("utf-8")
        assert r.meta.byte_len == len(r.payload)


def test_decode_matches_fake_codec(spark):
    m = _manifest(spark).limit(20)
    dec = {r.doc_id: r for r in M.decode_media(m).collect()}
    for r in m.collect():
        raw = bytes(r.payload)
        d = dec[r.doc_id]
        assert d.dec_width == 64 + (len(raw) % 512)
        assert d.checksum == sum(raw[:64]) % 997


def test_decode_real_backend_is_gated(spark):
    """backend='pil' either works (PIL installed) or fails at PLAN
    time with the documented seam error — never per-task."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            M.decode_media(_manifest(spark), backend="pil")
    else:
        # With Pillow present the gate must NOT raise; decoding the
        # text payloads still fails per-image, so just build the plan.
        M.decode_media(_manifest(spark), backend="pil")
    with pytest.raises(NotImplementedError):
        M.decode_media(_manifest(spark), backend="av")


def test_decode_pil_backend_real_png(spark):
    """Gated real-codec path: generate a PNG with Pillow, decode it
    through the SAME mapInPandas plumbing as the fake backend, and
    check the real dimensions come back. Skips where Pillow is
    absent (this container) — the seam test above covers that."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()
    m = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    rows = M.decode_media(m, backend="pil").collect()
    assert rows[0].dec_width == 37 and rows[0].dec_height == 21
    assert rows[0].checksum == sum(png[:64]) % 997
    resized = M.resize_images(
        spark.createDataFrame(
            [(1, bytearray(png), ("image", len(png), 37, 21, 1))],
            "doc_id long, payload binary, "
            "meta struct<media_type:string,byte_len:bigint,width:int,"
            "height:int,n_frames:int>",
        ),
        max_side=16,
        backend="pil",
    ).collect()
    assert max(resized[0].width, resized[0].height) <= 16


def test_byte_histogram_features(spark):
    feats = M.byte_histogram_features(_manifest(spark).limit(10), bins=16).collect()
    for r in feats:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_resize_scales_dims_and_payload(spark):
    out = M.resize_images(_manifest(spark), max_side=128).collect()
    assert out, "expected image rows"
    for r in out:
        assert max(r.width, r.height) <= 128


def test_frame_sample_chunks(spark):
    from axolotls_spark.multimodal.ops import FRAME_BYTES

    m = _manifest(spark)
    r = M.frame_sample(m, every=4).orderBy("doc_id", "frame_idx").first()
    raw = bytes(m.filter(F.col("doc_id") == r.doc_id).first().payload)
    assert r.frame_idx == 0
    assert bytes(r.frame) == raw[:FRAME_BYTES]


def test_binary_file_ingestion(spark, tmp_path):
    """binaryFile source: bytes round-trip exactly, listing-time
    glob pruning works, and the content column feeds the existing
    multimodal byte-featurizer unchanged."""
    payloads = {
        "a.jpg": b"\xff\xd8\xff\xe0" + b"A" * 100,
        "b.jpg": b"\xff\xd8\xff\xe0" + b"B" * 50,
        "skip.txt": b"not an image",
    }
    for fn, data in payloads.items():
        (tmp_path / fn).write_bytes(data)

    from axolotls_spark.io.sources import read_binary_files

    df = read_binary_files(spark, str(tmp_path), glob="*.jpg")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.jpg"}
    assert bytes(rows["a.jpg"].content) == payloads["a.jpg"]
    assert rows["b.jpg"].length == len(payloads["b.jpg"])


def test_ahash64_matches_python_reference(spark):
    """Third implementation of the aHash: literal textbook loop
    (slice ranges, float means, > comparison) over constructed
    payloads — must reproduce the cross-multiplied integer version
    bit-for-bit, including n < 64 (empty ranges) and constant
    payloads (no bit ever set: mean never strictly exceeds mean)."""
    from axolotls_spark.multimodal import ahash64, attach_payload

    texts = [
        (1, "ab"),                      # n < 64: most ranges empty
        (2, "z" * 100),                 # constant: hash must be 0
        (3, "".join(chr(33 + (i * 7) % 90) for i in range(200))),
        (4, "the quick brown fox jumps over the lazy dog " * 4),
    ]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in ahash64(attach_payload(df)).collect()
    }
    for doc_id, text in texts:
        b = text.encode()
        n = len(b)
        mean = sum(b) / n
        bands = [0, 0, 0, 0]
        for k in range(64):
            seg = b[(k * n) // 64 : ((k + 1) * n) // 64]
            if seg and sum(seg) / len(seg) > mean:
                bands[k // 16] |= 1 << (k % 16)
        assert got[doc_id] == tuple(bands), doc_id
    assert got[2] == (0, 0, 0, 0)


def test_scene_changes_vs_pure_python(spark):
    """Pure byte-loop recomputation (no numpy, no hex) of the scene
    detector — a third derivation beside the numpy stage and the
    hex-nibble oracle."""
    m = _manifest(spark).filter(F.col("meta.media_type") == "video")
    got = {r.doc_id: r for r in M.scene_changes(m).collect()}
    src = {
        r.doc_id: r.text.encode("utf-8")
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 3 == 2)
        .collect()
    }
    assert set(got) == set(src)
    fired = 0
    for did, raw in src.items():
        frames = [raw[i:i + 256] for i in range(0, len(raw), 256)]
        cuts = []
        for f in range(1, len(frames)):
            s, ln = sum(frames[f]), len(frames[f])
            ps, pl = sum(frames[f - 1]), len(frames[f - 1])
            if abs(s * pl - ps * ln) > 4 * ln * pl:
                cuts.append(f)
        r = got[did]
        assert r.n_frames == len(frames)
        assert r.n_changes == len(cuts)
        assert r.first_change == (cuts[0] if cuts else -1)
        fired += len(cuts)
    # The threshold must be discriminative: some cuts fire, not all.
    assert 0 < fired < sum(
        max(len(v) // 256, 0) for v in src.values()
    )


def test_audio_vad_vs_pure_python(spark):
    m = _manifest(spark).filter(F.col("meta.media_type") == "audio")
    got = {r.doc_id: r for r in M.audio_activity(m).collect()}
    src = {
        r.doc_id: r.text.encode("utf-8")
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .collect()
    }
    assert set(got) == set(src)
    tot_active = tot_win = 0
    for did, raw in src.items():
        nw = len(raw) // 64
        active = 0
        for w in range(nw):
            win = raw[w * 64:(w + 1) * 64]
            s = sum(win)
            s2 = sum(b * b for b in win)
            if 64 * s2 - s * s > 900 * 64 * 64:
                active += 1
        r = got[did]
        assert r.n_windows == nw
        assert r.n_active == active
        tot_active += active
        tot_win += nw
    # Gate is discriminative on the synthetic corpus (~60/40 split).
    assert 0 < tot_active < tot_win


def test_entropy_ahash_pass_matches_standalone_ops(spark):
    """The r8 fused payload pass (one JVM->Python crossing) must
    reproduce byte_count_histogram(nibble='low') and ahash64
    bit-for-bit, and echo the manifest's media_type unchanged."""
    from axolotls_spark.multimodal import (
        ahash64,
        attach_payload,
        byte_count_histogram,
        entropy_ahash_pass,
    )

    texts = [
        (1, "ab"),
        (2, "z" * 100),
        (3, "".join(chr(33 + (i * 7) % 90) for i in range(200))),
        (4, "the quick brown fox jumps over the lazy dog " * 4),
    ]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    manifest = attach_payload(df)
    fused = {r.doc_id: r for r in entropy_ahash_pass(manifest).collect()}
    hist = {
        r.doc_id: r
        for r in byte_count_histogram(manifest, nibble="low").collect()
    }
    ah = {r.doc_id: r for r in ahash64(manifest).collect()}
    meta = {
        r.doc_id: r.mt
        for r in manifest.select(
            "doc_id", manifest["meta.media_type"].alias("mt")
        ).collect()
    }
    assert set(fused) == set(hist) == set(ah)
    for did, r in fused.items():
        assert r.n_bytes == hist[did].n_bytes
        assert list(r.counts) == list(hist[did].counts)
        assert (r.b0, r.b1, r.b2, r.b3) == (
            ah[did].b0, ah[did].b1, ah[did].b2, ah[did].b3
        )
        assert r.media_type == meta[did]
