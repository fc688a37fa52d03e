"""Multimodal columns: image/audio/video as opaque binary + metadata.

Model (SURVEY §2B / BASELINE north star): media travels through the
pipeline as an opaque ``binary`` payload column plus a *typed*
metadata struct — Spark never interprets the bytes until an explicit
decode/feature step, which runs as an Arrow-batched ``mapInPandas``
over whole payload batches (the only sane shape for per-item Python
work at 100 TB: vectorized transfer, no per-row pickling, and the
binary column prunes away for any query that doesn't touch it).

Codec stubs: the container has no image/audio libraries, so the
actual byte decoding is behind ``backend=`` — the default
``"fake"`` backend derives deterministic pseudo-metadata from the
payload bytes themselves (stable across engines and runs, so tests
and oracles can check the plumbing end-to-end); ``backend="pil"`` /
``"av"`` raise ``NotImplementedError`` marking exactly where a real
deployment plugs in Pillow / PyAV. Everything around the stub —
schemas, batch iteration, partitioning, explode shapes — is real.

Payload provenance in this repo: the driver tables carry no binary
columns, so ``attach_payload`` manufactures payloads as the UTF-8
bytes of ``documents.text`` (deterministic, oracle-reproducible via
DuckDB ``encode()``). On a real lake the payload column comes from
``spark.read.format("binaryFile")`` or pre-materialized parquet.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata carried alongside every payload.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

_MEDIA_TYPES = ("image", "audio", "video")
FRAME_BYTES = 256  # fake-codec frame size


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → media manifest: (doc_id, payload binary, meta struct).

    Deterministic: payload = UTF-8 bytes of the text; media_type
    cycles by doc_id; fake intrinsic dims derive from byte length.
    All JVM-side expressions — the binary column is born columnar.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    blen = F.length(payload).cast("long")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            blen.alias("byte_len"),
            (F.lit(64) + (blen % 512)).cast("int").alias("width"),
            (F.lit(64) + ((blen * 7) % 512)).cast("int").alias("height"),
            F.ceil(blen / FRAME_BYTES).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _payload_checksum(payload: bytes) -> int:
    """Content checksum shared by BOTH decode backends (fake and PIL)
    — one definition so the formula cannot drift between them."""
    return sum(payload[:64]) % 997


def _require_pil(feature: str) -> None:
    """Plan-time codec gate: a missing Pillow must fail the DRIVER
    before any executor work, not per-task, with one shared message
    for every PIL-backed op."""
    try:
        import PIL  # noqa: F401 — plan-time gate only
    except ImportError as exc:
        raise NotImplementedError(
            f"{feature} needs Pillow, which is not installed in this "
            "environment; the fake backend exercises the same plumbing "
            "deterministically"
        ) from exc


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: 'decodes' dimensions
    and a checksum from the raw bytes. Replace with PIL/PyAV in a
    real deployment — signature and output schema stay identical."""
    n = len(payload)
    return {
        "dec_width": 64 + (n % 512),
        "dec_height": 64 + ((n * 7) % 512),
        "checksum": _payload_checksum(payload),
    }


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dec_width", IntegerType()),
        StructField("dec_height", IntegerType()),
        StructField("checksum", IntegerType()),
    ]
)


def _pil_decode(payload: bytes) -> dict:
    """Real image decode via Pillow — same signature and output
    schema as ``_fake_decode`` so the two backends are drop-in
    interchangeable. Only reachable when PIL imports (the plan-time
    gate in ``decode_media`` fails fast otherwise)."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        w, h = im.size
    return {
        "dec_width": int(w),
        "dec_height": int(h),
        "checksum": _payload_checksum(payload),
    }


def decode_media(manifest: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode payloads via Arrow-batched mapInPandas.

    ``backend="fake"`` → deterministic pseudo-decode (tests/oracle);
    ``backend="pil"`` → real Pillow image decode, gated on PIL being
    importable at *plan* time (so a missing codec fails the driver
    before any executor work, not per-task); anything else raises:
    further codecs (PyAV for video/audio) plug in here.
    """
    if backend == "fake":
        dec = _fake_decode
    elif backend == "pil":
        _require_pil("backend='pil'")
        dec = _pil_decode
    else:
        raise NotImplementedError(
            f"media codec backend {backend!r} is not implemented; "
            "plug in PyAV/librosa here"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame([dec(bytes(p)) for p in pdf["payload"]])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return manifest.select("doc_id", "payload").mapInPandas(run, DECODED_SCHEMA)


HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("feat_norm", DoubleType()),
    ]
)


def byte_histogram_features(manifest: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction: L1-normalized byte histogram per payload.

    Real vectorized numpy work over Arrow batches — the exact shape
    an embedding-model featurizer takes (payload batch in, fixed-dim
    float vector out)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats, norms = [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[
                    :bins
                ].astype("float64")
                total = hist.sum() or 1.0
                v = hist / total
                feats.append(v.tolist())
                norms.append(float(np.sqrt((v * v).sum())))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": feats, "feat_norm": norms}
            )

    return manifest.select("doc_id", "payload").mapInPandas(run, HIST_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    manifest: DataFrame, max_side: int = 128, backend: str = "fake"
) -> DataFrame:
    """'Resize' images to fit max_side (fake backend: scales the
    metadata dims and truncates the payload proportionally — the
    plumbing, batching, and schema of a real PIL resize).
    ``backend="pil"`` runs a real ``Image.thumbnail`` and re-encodes
    PNG, gated on Pillow importing at plan time."""
    if backend == "pil":
        _require_pil("backend='pil'")

        def run(batches: Iterator) -> Iterator:
            from io import BytesIO

            import pandas as pd
            from PIL import Image

            for pdf in batches:
                rows = []
                for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                    with Image.open(BytesIO(bytes(p))) as im:
                        im.thumbnail((max_side, max_side))
                        buf = BytesIO()
                        im.save(buf, format="PNG")
                        rows.append(
                            (doc_id, im.width, im.height, buf.getvalue())
                        )
                yield pd.DataFrame(
                    rows, columns=["doc_id", "width", "height", "payload"]
                )

        imgs = manifest.filter(F.col("meta.media_type") == "image")
        return imgs.select("doc_id", "payload", "meta").mapInPandas(
            run, RESIZED_SCHEMA
        )
    if backend != "fake":
        raise NotImplementedError(
            f"resize backend {backend!r} is not implemented"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                raw = bytes(p)
                keep = max(1, int(len(raw) * scale))
                rows.append((doc_id, nw, nh, raw[:keep]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "payload"]
            )

    imgs = manifest.filter(F.col("meta.media_type") == "image")
    return imgs.select("doc_id", "payload", "meta").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(manifest: DataFrame, every: int = 4) -> DataFrame:
    """Sample every ``every``-th frame of video payloads.

    Fake codec: a 'frame' is a FRAME_BYTES chunk. Pure JVM-side
    expressions — sequence → transform(substring) → explode — so
    frame extraction is codegen'd and shuffle-free; a real codec
    would swap the chunking lambda for a mapInPandas decode."""
    vids = manifest.filter(F.col("meta.media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.substring(
                F.col("payload"), i * FRAME_BYTES + 1, FRAME_BYTES
            ).alias("frame"),
        ),
    )
    return vids.select(
        "doc_id", F.explode(frames).alias("f")
    ).select(
        "doc_id",
        F.col("f.frame_idx").alias("frame_idx"),
        F.col("f.frame").alias("frame"),
    )


TILE = 224  # ViT-style patch size


def tile_grid(manifest: DataFrame, tile: int = TILE) -> DataFrame:
    """Per-image tile/patch manifest: explode each image into its
    ceil(w/tile) × ceil(h/tile) grid with clipped edge-tile sizes —
    the preprocessing plan a ViT-style encoder consumes. Pure
    JVM-side integer arithmetic on the metadata struct (the binary
    payload column is pruned away entirely); zero shuffles.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    nx = F.ceil(w / tile).cast("int")
    ny = F.ceil(h / tile).cast("int")
    imgs = manifest.filter(F.col("meta.media_type") == "image").select(
        "doc_id", w.alias("width"), h.alias("height"),
        nx.alias("nx"), ny.alias("ny"),
    )
    tiles = imgs.select(
        "doc_id", "width", "height", "nx",
        F.explode(F.sequence(F.lit(0), F.col("ny") - 1)).alias("j"),
    ).select(
        "doc_id", "width", "height", "nx", "j",
        F.explode(F.sequence(F.lit(0), F.col("nx") - 1)).alias("i"),
    )
    x0 = F.col("i") * tile
    y0 = F.col("j") * tile
    return tiles.select(
        "doc_id",
        (F.col("j") * F.col("nx") + F.col("i")).cast("long").alias("tile_id"),
        x0.cast("long").alias("x0"),
        y0.cast("long").alias("y0"),
        F.least(F.lit(tile), F.col("width") - x0).cast("long").alias("tile_w"),
        F.least(F.lit(tile), F.col("height") - y0).cast("long").alias("tile_h"),
    )


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("b0", LongType()),
        StructField("b1", LongType()),
        StructField("b2", LongType()),
        StructField("b3", LongType()),
    ]
)


def ahash64(manifest: DataFrame) -> DataFrame:
    """Perceptual average-hash over the payload bytes: the payload is
    split into 64 equal byte ranges ("pixels" of the 8x8 aHash
    grid); bit k is set iff range k's mean byte value exceeds the
    whole payload's mean. Returned as four 16-bit band keys
    (b0..b3) — exactly the split a banded hamming-LSH join needs.

    The mean comparison is cross-multiplied (sum_k * n > total * c_k)
    so the whole hash is INTEGER arithmetic — bit-reproducible by the
    DuckDB oracle from hex(payload) substrings. Real codec note: on
    decoded images the same function runs over the 8x8-downsampled
    grayscale plane; the byte-range stand-in exercises identical
    plumbing and join shapes.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                n = len(b)
                tot = int(b.sum())
                bands = [0, 0, 0, 0]
                for k in range(64):
                    lo, hi = (k * n) // 64, ((k + 1) * n) // 64
                    seg = b[lo:hi]
                    if int(seg.sum()) * n > tot * len(seg):
                        bands[k // 16] |= 1 << (k % 16)
                rows.append((doc_id, *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return manifest.select("doc_id", "payload").mapInPandas(
        run, AHASH_SCHEMA
    )


COUNT_HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("counts", ArrayType(LongType())),
    ]
)


def byte_count_histogram(
    manifest: DataFrame, bins: int = 16, nibble: str = "high"
) -> DataFrame:
    """INTEGER nibble histogram per payload — the exact-count
    sibling of :func:`byte_histogram_features` (which L1-normalizes
    to floats).  Emitting raw counts keeps the Python stage's output
    hash-exact across engines; any float statistic (entropy, norms)
    is derived afterwards JVM-side where the op order can be pinned
    against the oracle.  ``nibble="low"`` histograms the low 4 bits
    (for ASCII text the discriminative half — high nibbles collapse
    onto the 0x2/0x6/0x7 rows)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        shift = 8 - bins.bit_length() + 1
        for pdf in batches:
            ns, counts = [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                keyed = (arr & 0xF) if nibble == "low" else (arr >> shift)
                hist = np.bincount(keyed, minlength=bins)[:bins]
                ns.append(int(arr.size))
                counts.append([int(x) for x in hist])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": ns,
                    "counts": counts,
                }
            )

    return manifest.select("doc_id", "payload").mapInPandas(
        run, COUNT_HIST_SCHEMA
    )


ENTROPY_AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("counts", ArrayType(LongType())),
        StructField("b0", LongType()),
        StructField("b1", LongType()),
        StructField("b2", LongType()),
        StructField("b3", LongType()),
    ]
)


def entropy_ahash_pass(
    manifest: DataFrame, bins: int = 16, nibble: str = "low"
) -> DataFrame:
    """ONE Arrow-batched payload pass emitting BOTH the nibble
    histogram of :func:`byte_count_histogram` AND the banded aHash of
    :func:`ahash64` (bit-identical code per part), plus the manifest's
    ``media_type`` echoed through — for composites that need all three
    (``multimodal_ingestion``): the payload bytes cross the JVM→Python
    boundary once instead of twice, and the downstream meta/hash joins
    on doc_id disappear because every per-doc column rides one row
    (guide §4.1 — you cannot remove the boundary cost, so cross it
    once)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        shift = 8 - bins.bit_length() + 1
        for pdf in batches:
            rows = []
            for doc_id, mt, p in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                keyed = (arr & 0xF) if nibble == "low" else (arr >> shift)
                hist = np.bincount(keyed, minlength=bins)[:bins]
                b = arr.astype(np.int64)
                n = len(b)
                tot = int(b.sum())
                bands = [0, 0, 0, 0]
                for k in range(64):
                    lo, hi = (k * n) // 64, ((k + 1) * n) // 64
                    seg = b[lo:hi]
                    if int(seg.sum()) * n > tot * len(seg):
                        bands[k // 16] |= 1 << (k % 16)
                rows.append(
                    (doc_id, mt, int(arr.size), [int(x) for x in hist], *bands)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "counts",
                    "b0", "b1", "b2", "b3",
                ],
            )

    return manifest.select(
        "doc_id", F.col("meta.media_type").alias("media_type"), "payload"
    ).mapInPandas(run, ENTROPY_AHASH_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_changes", LongType()),
        StructField("first_change", LongType()),
    ]
)

#: Scene-cut threshold: consecutive frames whose mean byte values
#: differ by more than _SCENE_THRESH fire a boundary.  Measured on
#: the synthetic payloads: the 90th percentile of consecutive-frame
#: mean deltas is ~3.4, so 4 marks the genuinely discontinuous
#: transitions (~12% of them) instead of ambient drift.
_SCENE_THRESH = 4


def scene_changes(
    manifest: DataFrame, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """Scene-cut detection over video payloads (fake codec: a frame
    is a ``frame_bytes`` chunk): frame f >= 1 is a cut when the mean
    byte value jumps by more than ``_SCENE_THRESH`` vs frame f-1.
    Emits per video: frame count, cut count, first cut index (-1 when
    none) — the shot-boundary manifest a video curation pipeline
    derives before sampling frames per-shot instead of uniformly
    (`frame_sample` is the uniform sibling).

    Arrow-batched mapInPandas over (doc_id, payload) only; numpy does
    the per-frame reduction.  The boundary comparison is CROSS-
    MULTIPLIED INTEGER arithmetic — |sum_f*len_g - sum_g*len_f| >
    T*len_f*len_g — never a float mean, so the ragged last frame
    divides out exactly and the Python stage is hash-identical to the
    oracle's hex-nibble restatement (the byte_count_histogram
    discipline).
    """
    vids = manifest.filter(F.col("meta.media_type") == "video")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            nfs, ncs, firsts = [], [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                nf = -(-arr.size // frame_bytes)
                if nf:
                    # dtype=int64 accumulates without materializing an
                    # 8x int64 copy of the whole payload (ADVICE r7).
                    sums = np.add.reduceat(
                        arr,
                        np.arange(0, arr.size, frame_bytes),
                        dtype=np.int64,
                    )
                    lens = np.full(nf, frame_bytes, dtype=np.int64)
                    lens[-1] = arr.size - (nf - 1) * frame_bytes
                else:
                    sums = lens = np.zeros(0, dtype=np.int64)
                if nf > 1:
                    lhs = np.abs(
                        sums[1:] * lens[:-1] - sums[:-1] * lens[1:]
                    )
                    cut = lhs > _SCENE_THRESH * lens[1:] * lens[:-1]
                    idx = np.nonzero(cut)[0]
                    n_changes = int(cut.sum())
                    first = int(idx[0]) + 1 if idx.size else -1
                else:
                    n_changes, first = 0, -1
                nfs.append(int(nf))
                ncs.append(n_changes)
                firsts.append(first)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_frames": nfs,
                    "n_changes": ncs,
                    "first_change": firsts,
                }
            )

    return vids.select("doc_id", "payload").mapInPandas(run, SCENE_SCHEMA)


VAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("n_active", LongType()),
    ]
)

#: Voice-activity window length (bytes of fake PCM) and the variance
#: gate: a 64-byte window is "active" when its population variance
#: exceeds 900 (measured: the synthetic payloads' window variance
#: spans ~807-977, median ~889, so the gate splits windows ~60/40 —
#: a discriminative threshold, not a constant-true one).
_VAD_WINDOW = 64
_VAD_VAR_THRESH = 900


def audio_activity(
    manifest: DataFrame, window: int = _VAD_WINDOW
) -> DataFrame:
    """Energy-based voice-activity detection over audio payloads
    (fake codec: bytes as 8-bit PCM samples): a full ``window``-byte
    window is ACTIVE when its sample variance clears the gate —
    the silence-trimming primitive an audio curation pipeline runs
    before any expensive transcription, so 100 TB of raw audio
    shrinks to its active spans early.

    Integer discipline: variance > T is evaluated as
    ``W * sum(v^2) - sum(v)^2 > T * W^2`` on int64 — exact in both
    the numpy stage and the oracle's hex-nibble restatement; the
    trailing partial window is EXCLUDED (a shorter window's variance
    gate would need a different threshold to mean the same thing).
    """
    auds = manifest.filter(F.col("meta.media_type") == "audio")
    thresh = _VAD_VAR_THRESH * window * window

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            nws, nas = [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                nw = arr.size // window
                if nw:
                    w = (
                        arr[: nw * window]
                        .astype(np.int64)
                        .reshape(nw, window)
                    )
                    s = w.sum(axis=1)
                    s2 = (w * w).sum(axis=1)
                    active = int((window * s2 - s * s > thresh).sum())
                else:
                    active = 0
                nws.append(int(nw))
                nas.append(active)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_windows": nws,
                    "n_active": nas,
                }
            )

    return auds.select("doc_id", "payload").mapInPandas(run, VAD_SCHEMA)
