"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Model (BASELINE.json north-star): image/audio/video payloads are binary
columns with a metadata struct; decode/resize/frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas``. The image/audio codecs
(PIL/librosa/av) are NOT in this container, so the codec call itself is
stubbed — clearly marked, import-gated — while everything Spark cares about
(schema, batch shape, partitioning, Arrow transfer) is real and tested.

``byte_features`` is NOT a stub: byte histogram + Shannon entropy is real
per-blob math (numpy, vectorized per Arrow batch) — the standard cheap
filter for corrupt/duplicate media before decode.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, channels int, ok boolean"
)
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, entropy double, top_byte int"


def attach_binary(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, fmt, n_bytes). The fixture has
    no real media, so the payload is the utf-8 text bytes and ``fmt`` is a
    deterministic assignment — the column *types* and downstream plumbing
    are exactly what a real media table uses."""
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        fmt.alias("fmt"),
        F.length(payload).alias("n_bytes"),
    )


def byte_features(media: DataFrame) -> DataFrame:
    """Arrow-batched per-blob byte statistics (real computation)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    rows.append((doc_id, 0, 0.0, -1))
                    continue
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / arr.size
                entropy = float(-(p * np.log2(p)).sum())
                rows.append((doc_id, int(arr.size), entropy, int(counts.argmax())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "entropy", "top_byte"]
            )

    return media.select("doc_id", "payload").mapInPandas(op, FEATURE_SCHEMA)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode metadata (width/height/channels) per blob.

    STUB: the real decoder needs PIL/av, absent from this container. With
    ``fake=True`` it derives deterministic fake dimensions from the byte
    length so the full Spark pipeline (mapInPandas batching, schema, joins
    downstream) is exercised end-to-end; with ``fake=False`` it raises
    NotImplementedError unless PIL is importable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401  (absent in this image)

            have_codec = True
        except ImportError:
            have_codec = False
        if not fake and not have_codec:
            raise NotImplementedError(
                "media decode requires PIL/av — not available in this "
                "environment; use fake=True for plumbing tests"
            )
        for pdf in batches:
            rows = []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["payload"], pdf["fmt"]
            ):
                n = len(payload)
                # deterministic fake: dimensions from byte length
                w = 16 + (n % 64)
                h = 16 + ((n // 64) % 64)
                ch = 1 if fmt == "wav" else 3
                rows.append((doc_id, fmt, w, h, ch, True))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "channels", "ok"],
            )

    return media.select("doc_id", "payload", "fmt").mapInPandas(op, DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning (pure metadata math — real): target dims preserving
    aspect ratio, capped at ``max_side``. The pixel resample itself would
    live in the decode UDF."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return decoded.select(
        "doc_id",
        "fmt",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_h"),
    )


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset bigint, frame_bytes binary"
)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_size: int = 16) -> DataFrame:
    """Evenly-spaced frame sampling from a video-like binary payload —
    the one-row-in / many-rows-out mapInPandas shape (UDTF-like).

    STUB boundary: a real implementation hands the payload to a demuxer
    (av/ffmpeg, absent here) and yields decoded frames at the sampled
    timestamps; this one slices ``frame_size`` bytes at the same evenly
    spaced offsets, so the sampling plan, the exploding batch shape, and
    the binary round-trip through Arrow are all real.

    Scale: one payload never crosses partitions (frames derive from their
    own row), so the operator is embarrassingly parallel; output size is
    bounded at n_frames × frame_size per blob regardless of blob size.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n == 0:
                    continue
                k = min(n_frames, n)
                for i in range(k):
                    # even spacing over [0, n): same rule a timestamp
                    # sampler uses over the duration
                    off = (i * n) // k
                    out.append(
                        (doc_id, i, off, bytes(payload[off : off + frame_size]))
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "frame_offset", "frame_bytes"],
            )

    return media.select("doc_id", "payload").mapInPandas(op, FRAME_SCHEMA)


def binary_meta(docs: DataFrame) -> DataFrame:
    """JVM-side binary metadata (no Python): byte length + hex prefix —
    the magic-bytes sniff a real ingest runs before routing to decoders."""
    media = attach_binary(docs)
    return media.select(
        "doc_id",
        "fmt",
        "n_bytes",
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("prefix_hex"),
    )


# ---------------------------------------------------------------------------
# WebDataset-style sharded tar export — the layout multimodal training
# loaders stream (shard tars of {key}.{ext} members, read sequentially).
# ---------------------------------------------------------------------------

MANIFEST_SCHEMA = (
    "doc_id bigint, shard_id int, member_idx int, n_bytes bigint, "
    "data_offset bigint"
)


def shard_manifest(media: DataFrame, n_shards: int = 8) -> DataFrame:
    """Deterministic shard assignment + exact tar byte offsets, computed
    declaratively BEFORE any file is written — the index a streaming
    loader uses for random access into sequential shards.

    Assignment is md5(doc_id) mod n_shards (engine-portable, stable under
    re-runs; a range partitioner would skew under non-uniform ids).
    Offsets are USTAR math: each member costs a 512-byte header plus data
    padded to the next 512 boundary; ``data_offset`` is where the payload
    bytes start, verified byte-for-byte against Python's tarfile by
    test_shard_export_offsets_match_tarfile.

    Scale shape: one narrow projection + one window per shard (the sort
    key is (shard, doc_id) — each shard's members are independent, so the
    window parallelizes across shards; n_shards at real scale is chosen so
    one shard ~ 1-10 GB, i.e. thousands of shards, ample parallelism)."""
    from pyspark.sql import Window as W

    from ..functions.hashing import md5_hash32

    m = media.select(
        "doc_id",
        (md5_hash32(F.col("doc_id").cast("string")) % n_shards)
        .cast("int")
        .alias("shard_id"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
    )
    entry = F.lit(512) + F.expr("(n_bytes + 511) div 512") * 512
    w = W.partitionBy("shard_id").orderBy("doc_id")
    cum = F.sum(entry).over(w) - entry  # bytes before this member
    return m.select(
        "doc_id",
        "shard_id",
        (F.row_number().over(w) - 1).alias("member_idx"),
        "n_bytes",
        (cum + 512).alias("data_offset"),
    )


def write_webdataset(
    media: DataFrame, out_dir: str, n_shards: int = 8
) -> DataFrame:
    """Write the shards as real USTAR tars (one ``shard-{i:05d}.tar`` per
    shard, members ``{doc_id}.bin`` in manifest order) and return the
    manifest. Grouping with ``applyInPandas`` puts each shard's rows in
    exactly one task, which streams its tar sequentially — the write
    parallelism IS the shard count. ``out_dir`` must be storage all
    executors can reach (shared FS / object store mount), the same
    contract as any file sink."""
    import io
    import os
    import tarfile

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["shard_id"].iloc[0])
        rows = []
        # stage + rename-on-close: a tar matching shard-*.tar is COMPLETE
        # by construction, so a concurrent reader (the webdataset source's
        # presence-is-commit contract) can never stream a half-written
        # archive
        final = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        staging = final + ".tmp"
        with tarfile.open(
            staging,
            "w",
            format=tarfile.USTAR_FORMAT,
        ) as tf:
            for idx, r in pdf.iterrows():
                payload = bytes(r["payload"])
                info = tarfile.TarInfo(name=f"{int(r['doc_id'])}.bin")
                info.size = len(payload)
                info.mtime = 0  # deterministic archives
                tf.addfile(info, io.BytesIO(payload))
                rows.append(
                    (
                        int(r["doc_id"]),
                        shard,
                        int(idx),
                        len(payload),
                        int(tf.fileobj.tell()) - _padded(len(payload)),
                    )
                )
        os.replace(staging, final)
        return pd.DataFrame(
            rows,
            columns=[
                "doc_id", "shard_id", "member_idx", "n_bytes", "data_offset",
            ],
        )

    def _padded(n: int) -> int:
        return ((n + 511) // 512) * 512

    from ..functions.hashing import md5_hash32

    tagged = media.select(
        "doc_id",
        "payload",
        (md5_hash32(F.col("doc_id").cast("string")) % n_shards)
        .cast("int")
        .alias("shard_id"),
    )
    return tagged.groupBy("shard_id").applyInPandas(
        write_shard, MANIFEST_SCHEMA
    )


def inference_batches(
    docs: DataFrame,
    batch_size: int = 32,
    size_bucket_bytes: int = 4096,
) -> DataFrame:
    """Inference batch planning (mm07) — group media rows into fixed-size
    batches of SIMILAR payloads (same format, same size bucket) so a
    downstream encoder sees shape-homogeneous batches with minimal
    padding: the batching pass in front of any vision/audio tower. Pure
    metadata arithmetic — payload bytes never move.

    Returns per row: ``(doc_id, fmt, size_bucket, batch_idx,
    pos_in_batch)`` — batch_idx is dense per (fmt, size_bucket), filled
    in doc_id order.

    Scale shape: ONE keyed window per (fmt, size_bucket) — the bucket is
    the partition key, so this is a hash-partitioned sort of each
    bucket, never a global sort; all arithmetic integer.
    """
    from pyspark.sql import Window as W

    if batch_size < 1 or size_bucket_bytes < 1:
        raise ValueError("batch_size and size_bucket_bytes must be >= 1")
    media = attach_binary(docs)
    b = media.select(
        "doc_id",
        "fmt",
        F.expr(f"n_bytes div {int(size_bucket_bytes)}")
        .cast("bigint")
        .alias("size_bucket"),
    )
    w = W.partitionBy("fmt", "size_bucket").orderBy("doc_id")
    slot = F.row_number().over(w) - 1
    # `slot div N` (exact integer division) — `slot / N` is float division
    # whose bigint cast is a latent rounding hazard for non-power-of-two
    # batch sizes (same class as the px18/px13 oracle hazard).
    return b.select(
        "doc_id",
        "fmt",
        "size_bucket",
        slot.alias("_slot"),
    ).select(
        "doc_id",
        "fmt",
        "size_bucket",
        F.expr(f"CAST(_slot div {int(batch_size)} AS BIGINT)").alias(
            "batch_idx"
        ),
        (F.col("_slot") % F.lit(int(batch_size)))
        .cast("int")
        .alias("pos_in_batch"),
    )


# ---------------------------------------------------------------------------
# REAL codecs (mm08): RIFF/WAVE PCM-16 and BMP (BITMAPINFOHEADER, 24-bit)
# are pure-struct formats needing no external library — so unlike the
# PIL-gated decode_media stub above, this path ENCODES real media bytes
# and DECODES them back by parsing the actual headers/payload, end to
# end in this image. The encode plan is deterministic integer arithmetic
# over (doc_id, n_chars, text bytes), which is what makes the round
# trip hash-oracleable: a SQL engine recomputes the expected metadata
# arithmetically, and the oracle only matches if the encoder produced
# exactly those bytes AND the parser read them back.
# ---------------------------------------------------------------------------
def _wav_bytes(samples: list[int], rate: int) -> bytes:
    """Minimal RIFF/WAVE, PCM 16-bit mono."""
    import struct

    data = b"".join(struct.pack("<h", max(-32768, min(32767, s))) for s in samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def _bmp_bytes(w: int, h: int, pix: list[tuple[int, int, int]]) -> bytes:
    """Minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BGR,
    rows bottom-up, 4-byte padded. ``pix`` is row-major RGB, len w*h."""
    import struct

    row_size = (3 * w + 3) // 4 * 4
    img = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = pix[y * w + x]
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        row += b"\x00" * (row_size - len(row))
        img += row
    size = 54 + len(img)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return hdr + bytes(img)


def _real_media_plan(doc_id: int, n_chars: int) -> dict:
    """The deterministic encode plan — integer arithmetic a SQL oracle
    recomputes. Changing this changes the mm08 oracle too."""
    if doc_id % 2 == 0:
        w = 4 + (n_chars % 13)
        h = 3 + (n_chars % 7)
        return {"fmt": "bmp", "w": w, "h": h,
                "n_bytes": 54 + ((3 * w + 3) // 4 * 4) * h}
    rate = 8000 + 4000 * (doc_id % 3)
    n_samples = 32 + (n_chars % 101)
    return {"fmt": "wav", "rate": rate, "n_samples": n_samples,
            "n_bytes": 44 + 2 * n_samples}


REAL_MEDIA_SCHEMA = "doc_id bigint, fmt string, payload binary"


def attach_real_binary(docs: DataFrame) -> DataFrame:
    """documents → REAL media payloads: even doc_ids become 24-bit BMPs,
    odd ones PCM-16 WAVs, dimensions/rates/samples derived from
    (doc_id, n_chars) by ``_real_media_plan`` and pixel/sample values
    from the text bytes — fully deterministic, no RNG, no codec libs."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                plan = _real_media_plan(int(doc_id), int(n_chars))
                tb = (text or " ").encode("utf-8") or b" "
                if plan["fmt"] == "bmp":
                    w, h = plan["w"], plan["h"]
                    pix = []
                    for k in range(w * h):
                        b = tb[k % len(tb)]
                        pix.append((b, 255 - b, (b * 7) % 256))
                    payload = _bmp_bytes(w, h, pix)
                else:
                    samples = [
                        (tb[k % len(tb)] - 64) * 128
                        for k in range(plan["n_samples"])
                    ]
                    payload = _wav_bytes(samples, plan["rate"])
                assert len(payload) == plan["n_bytes"]
                rows.append((int(doc_id), plan["fmt"], payload))
            yield pd.DataFrame(rows, columns=["doc_id", "fmt", "payload"])

    return docs.select("doc_id", "text", "n_chars").mapInPandas(
        op, REAL_MEDIA_SCHEMA
    )


REAL_DECODED_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, channels int, "
    "sample_rate int, n_samples bigint, n_bytes bigint, ok boolean"
)


def decode_media_real(media: DataFrame) -> DataFrame:
    """REAL decode: parse the BMP/WAV headers out of the payload bytes
    (magic, header sizes, data lengths all validated — a malformed blob
    yields ok=false with NULL metadata instead of failing the task).
    Arrow-batched mapInPandas; one blob never crosses partitions."""
    import struct

    def parse(fmt: str, payload: bytes):
        try:
            if fmt == "bmp":
                if payload[:2] != b"BM" or len(payload) < 54:
                    return None
                size, _, _, off = struct.unpack("<IHHI", payload[2:14])
                hsz, w, h, planes, bpp = struct.unpack("<IiiHH", payload[14:30])
                if hsz != 40 or planes != 1 or bpp != 24 or size != len(payload):
                    return None
                row_size = (3 * w + 3) // 4 * 4
                if off + row_size * h != len(payload):
                    return None
                return (w, h, 3, None, None)
            if fmt == "wav":
                if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                    return None
                (fmt_sz, audio, ch, rate) = struct.unpack("<IHHI", payload[16:28])
                bits = struct.unpack("<H", payload[34:36])[0]
                if payload[36:40] != b"data" or audio != 1 or fmt_sz != 16:
                    return None
                dlen = struct.unpack("<I", payload[40:44])[0]
                if 44 + dlen != len(payload) or bits != 16:
                    return None
                return (None, None, ch, rate, dlen // (2 * ch))
        except (struct.error, IndexError):
            return None
        return None

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                meta = parse(fmt, bytes(payload))
                if meta is None:
                    rows.append(
                        (int(doc_id), fmt, None, None, None, None, None,
                         len(payload), False)
                    )
                else:
                    w, h, ch, rate, ns = meta
                    rows.append(
                        (int(doc_id), fmt, w, h, ch, rate, ns,
                         len(payload), True)
                    )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "channels",
                         "sample_rate", "n_samples", "n_bytes", "ok"],
            )
            for c, t in (("width", "Int32"), ("height", "Int32"),
                         ("channels", "Int32"), ("sample_rate", "Int32"),
                         ("n_samples", "Int64")):
                out[c] = out[c].astype(t)
            yield out

    return media.select("doc_id", "fmt", "payload").mapInPandas(
        op, REAL_DECODED_SCHEMA
    )


AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_in_frame int, sum_sq bigint, peak int"
)


def audio_frame_energy(media: DataFrame, frame_len: int = 32) -> DataFrame:
    """REAL audio DSP over the mm08 WAV payloads: parse the PCM-16 data
    section back into int16 samples (numpy, little-endian) and emit
    per-frame INTEGER energy stats — ``sum_sq`` (exact Σ s², the frame
    energy) and ``peak`` (max |s|) over non-overlapping ``frame_len``
    windows; the last frame may be partial (``n_in_frame``). The framing
    pass every audio featurizer starts with (VAD, loudness filters,
    spectrogram windows), done on genuinely decoded samples — all
    integer, so the mm09 oracle recomputes it exactly from the encode
    plan.

    Scale: one row in → n_samples/frame_len rows out, each payload
    decoded inside its own row's Arrow batch; embarrassingly parallel,
    output bounded by total samples."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: list[tuple] = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                if fmt != "wav":
                    continue
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[36:40] != b"data":
                    continue
                dlen = struct.unpack("<I", b[40:44])[0]
                s = np.frombuffer(b[44 : 44 + dlen], dtype="<i2").astype(
                    np.int64
                )
                for f in range(0, len(s), frame_len):
                    fr = s[f : f + frame_len]
                    out.append(
                        (
                            int(doc_id),
                            f // frame_len,
                            int(len(fr)),
                            int((fr * fr).sum()),
                            int(np.abs(fr).max()) if len(fr) else 0,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "n_in_frame", "sum_sq", "peak"],
            )

    return media.select("doc_id", "fmt", "payload").mapInPandas(
        op, AUDIO_FRAME_SCHEMA
    )


RESIZE_REAL_SCHEMA = (
    "doc_id bigint, width int, height int, out_w int, out_h int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, n_px int"
)


def resize_real(media: DataFrame, max_side: int = 8) -> DataFrame:
    """REAL image resize (mm11 — retires the mm03 PIL-gate as the last
    rows-only claim on the image path): decode the mm08 BMP payloads'
    pixels exactly like ``image_pixel_stats``, then NEAREST-NEIGHBOR
    downsample to aspect-preserving ``max_side``-capped dims and emit
    exact integer channel sums of the RESIZED image — so the hash oracle
    only matches if genuine bytes were encoded, parsed back, flipped to
    logical RGB, AND resampled pixel-for-pixel to the contract below.

    Integer resize contract (no floats anywhere, SQL-recomputable):
      mx = max(w, h)
      (out_w, out_h) = (w, h) if mx <= max_side
                       else (max(1, w*max_side div mx),
                             max(1, h*max_side div mx))
      resized[i][j] = src[(i*h) div out_h][(j*w) div out_w]
    — the standard floor-mapping nearest-neighbor everyone (PIL NEAREST,
    OpenCV INTER_NEAREST up to half-pixel convention) approximates;
    fixing the exact integer rule is what makes two engines agree.

    Scale: one row in → one row out, per-row numpy fancy-indexing;
    embarrassingly parallel, output O(1) per blob."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                if fmt != "bmp":
                    continue
                b = bytes(payload)
                if b[:2] != b"BM":
                    continue
                off = struct.unpack("<I", b[10:14])[0]
                w, h = struct.unpack("<ii", b[18:26])
                row_size = (3 * w + 3) // 4 * 4
                img = np.frombuffer(
                    b[off : off + row_size * h], dtype=np.uint8
                ).reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
                rgb = img[::-1, :, ::-1]  # logical row-major RGB
                mx = max(w, h)
                if mx <= max_side:
                    ow, oh = w, h
                else:
                    ow = max(1, w * max_side // mx)
                    oh = max(1, h * max_side // mx)
                sy = (np.arange(oh) * h) // oh
                sx = (np.arange(ow) * w) // ow
                out = rgb[sy][:, sx].astype(np.int64)
                rows.append(
                    (
                        int(doc_id), int(w), int(h), int(ow), int(oh),
                        int(out[:, :, 0].sum()),
                        int(out[:, :, 1].sum()),
                        int(out[:, :, 2].sum()),
                        int(ow * oh),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_w", "out_h",
                         "sum_r", "sum_g", "sum_b", "n_px"],
            )

    return media.select("doc_id", "fmt", "payload").mapInPandas(
        op, RESIZE_REAL_SCHEMA
    )


BYTE_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sum_bytes bigint, distinct_bytes int, "
    "top_byte int, top_count int"
)


def byte_stats_exact(docs: DataFrame) -> DataFrame:
    """Integer-exact byte statistics (mm12 — the hash-oracled twin that
    retires mm02's rows-only gate): per-payload byte count, byte-value
    sum, distinct byte count, and the modal byte with its count
    (smallest byte wins count ties — numpy argmax order, same tie-break
    mm02's float path uses). Histogram math identical to
    ``byte_features``; entropy stays on the float path (mm02), every
    integer-expressible statistic lands here.

    Both engines see the SAME bytes by construction, with no ASCII
    assumption: the payload is the utf-8 encoding of the text sanitized
    to printable ASCII (non-[\\x20-\\x7e] chars stripped, empty → one
    space) — the sanitize runs in the Spark plan AND the DuckDB oracle,
    so char indexing == byte indexing holds by construction rather than
    by fixture luck (the mm09/mm10 advice applied at the operator
    level)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                top = int(counts.argmax())
                rows.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        int(arr.sum(dtype=np.int64)),
                        int((counts > 0).sum()),
                        top,
                        int(counts[top]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "sum_bytes", "distinct_bytes",
                         "top_byte", "top_count"],
            )

    clean = F.regexp_replace(F.col("text"), "[^\\x20-\\x7e]", "")
    clean = F.when(F.length(clean) == 0, F.lit(" ")).otherwise(clean)
    payload = F.encode(clean, "utf-8")
    return docs.select("doc_id", payload.alias("payload")).mapInPandas(
        op, BYTE_STATS_SCHEMA
    )


PIXEL_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, sum_r bigint, sum_g bigint, "
    "sum_b bigint, max_r int, n_px int"
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL image decode over the mm08 BMP payloads: walk the bottom-up
    4-byte-padded BGR rows back out of the file and emit exact integer
    channel statistics (Σr, Σg, Σb, max r, pixel count) — the image
    half of mm09's audio framing: brightness/tint filters and
    mean-normalization start exactly here, on genuinely decoded pixels.

    Scale: per-row numpy reshape of the pixel block; one row in → one
    row out, embarrassingly parallel."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                if fmt != "bmp":
                    continue
                b = bytes(payload)
                if b[:2] != b"BM":
                    continue
                off = struct.unpack("<I", b[10:14])[0]
                w, h = struct.unpack("<ii", b[18:26])
                row_size = (3 * w + 3) // 4 * 4
                img = np.frombuffer(
                    b[off : off + row_size * h], dtype=np.uint8
                ).reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
                # rows are stored bottom-up, channels BGR — flip both so
                # the stats are over the logical (row-major, RGB) image
                rgb = img[::-1, :, ::-1].astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        int(w),
                        int(h),
                        int(rgb[:, :, 0].sum()),
                        int(rgb[:, :, 1].sum()),
                        int(rgb[:, :, 2].sum()),
                        int(rgb[:, :, 0].max()),
                        int(w * h),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_r", "sum_g",
                         "sum_b", "max_r", "n_px"],
            )

    return media.select("doc_id", "fmt", "payload").mapInPandas(
        op, PIXEL_STATS_SCHEMA
    )


AUDIO_DECIMATE_SCHEMA = (
    "doc_id bigint, rate_in int, rate_out int, n_in bigint, n_out bigint, "
    "sum_out bigint, sum_sq_out bigint, peak_out int"
)


def audio_decimate(media: DataFrame, factor: int = 4) -> DataFrame:
    """REAL audio downsample over the mm08 WAV payloads (mm13): parse the
    RIFF header (sample rate) and the PCM-16 data section, keep every
    ``factor``-th sample (plain decimation — integer-exact by
    construction; a production resampler low-pass-filters first, which is
    float DSP and belongs behind the same env gate as PIL — the
    INDEX-SELECTION semantics, header rewrite and rate math are what this
    operator pins), and emit per-doc integer stats of the decimated
    signal: kept-sample count, Σs, Σs² and max|s|, plus the new nominal
    rate = rate_in div factor. The pre-tokenization step of every audio
    pipeline that normalizes heterogeneous sample rates before
    feature-extraction (rates here are 8/12/16 kHz by the encode plan, so
    factor=4 maps them onto 2/3/4 kHz deterministically).

    All arithmetic is integer, so the mm13 oracle recomputes every value
    exactly from the encode plan (sample k of doc d is
    (byte(text, k mod len) - 64) * 128; kept iff k mod factor = 0).

    Scale: one row in → one row out, each payload decoded inside its own
    Arrow batch; embarrassingly parallel, no shuffle at all."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: list[tuple] = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                if fmt != "wav":
                    continue
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[36:40] != b"data":
                    continue
                rate = struct.unpack("<I", b[24:28])[0]
                dlen = struct.unpack("<I", b[40:44])[0]
                s = np.frombuffer(b[44 : 44 + dlen], dtype="<i2").astype(
                    np.int64
                )
                kept = s[::factor]
                out.append(
                    (
                        int(doc_id),
                        int(rate),
                        int(rate // factor),
                        int(len(s)),
                        int(len(kept)),
                        int(kept.sum()) if len(kept) else 0,
                        int((kept * kept).sum()) if len(kept) else 0,
                        int(np.abs(kept).max()) if len(kept) else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "rate_in", "rate_out", "n_in", "n_out",
                    "sum_out", "sum_sq_out", "peak_out",
                ],
            )

    return media.select("doc_id", "fmt", "payload").mapInPandas(
        op, AUDIO_DECIMATE_SCHEMA
    )


VIDEO_MAGIC = b"VID0"
VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, sample_idx int, src_frame int, n_frames int, "
    "width int, height int, sum_r bigint, sum_g bigint, sum_b bigint, "
    "n_px int"
)


def _video_plan(n_chars: int) -> tuple[int, int, int]:
    """(n_frames, w, h) of a doc's synthetic video — integer arithmetic
    a SQL oracle recomputes. Changing this changes the mm14 oracle."""
    return 2 + n_chars % 5, 3 + n_chars % 5, 2 + n_chars % 3


def attach_real_video(docs: DataFrame) -> DataFrame:
    """documents → REAL multi-frame video payloads (mm14's encode half):
    ``VID0`` magic + uint32 frame count + that many CONCATENATED genuine
    24-bit BMPs (equal dims per doc, from ``_video_plan``); frame f's
    pixel k derives from text byte (k + f) mod len — the same
    deterministic pixel rule as mm08's stills, phase-shifted per frame
    so every frame is distinct. No RNG, no codec libs; one blob per
    row."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                k_frames, w, h = _video_plan(int(n_chars))
                tb = (text or " ").encode("utf-8") or b" "
                frames = []
                for f in range(k_frames):
                    pix = []
                    for k in range(w * h):
                        b = tb[(k + f) % len(tb)]
                        pix.append((b, 255 - b, (b * 7) % 256))
                    frames.append(_bmp_bytes(w, h, pix))
                payload = (
                    VIDEO_MAGIC
                    + struct.pack("<I", k_frames)
                    + b"".join(frames)
                )
                rows.append((int(doc_id), payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return docs.select("doc_id", "text", "n_chars").mapInPandas(
        op, "doc_id bigint, payload binary"
    )


def video_frame_sample_real(media: DataFrame, n_sample: int = 2) -> DataFrame:
    """REAL video frame sampling (mm14 — retires mm04's stub boundary
    for the container this repo can construct): parse the VID0 header,
    slice the ``n_sample`` evenly-spaced frames (src = (j·K) div
    n_sample — mm04's timestamp-sampler rule), and FULLY DECODE each
    sampled frame's BMP (magic, pixel offset, dims from the header;
    bottom-up padded BGR rows walked back out with numpy) into exact
    integer channel sums. The sampling plan, container parse, per-frame
    decode and the one-row-in/N-rows-out batch shape are all real; only
    the codec is the repo's pure-struct BMP instead of H.264 (the
    av/ffmpeg demuxer stays the documented env gate, mm04).

    Scale: a blob never crosses partitions; output is n_sample rows per
    video regardless of frame count or size. The non-sampled frames'
    bytes are never touched — the demuxer-seek behavior that makes
    frame sampling cheap on real containers."""
    import struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != VIDEO_MAGIC or len(b) < 8:
                    continue
                k_frames = struct.unpack("<I", b[4:8])[0]
                body = b[8:]
                if k_frames == 0 or len(body) % k_frames:
                    continue
                fsize = len(body) // k_frames
                for j in range(min(n_sample, k_frames)):
                    f = (j * k_frames) // min(n_sample, k_frames)
                    fb = body[f * fsize : (f + 1) * fsize]
                    # full validation before the reshape: a truncated
                    # container whose body HAPPENS to divide k_frames
                    # slices misaligned frames — malformed blobs must
                    # skip, never fail the task (decode_media_real's
                    # contract)
                    if len(fb) < 26 or fb[:2] != b"BM":
                        continue
                    off = struct.unpack("<I", fb[10:14])[0]
                    w, h = struct.unpack("<ii", fb[18:26])
                    row_size = (3 * w + 3) // 4 * 4
                    if (
                        w <= 0
                        or h <= 0
                        or off + row_size * h > len(fb)
                    ):
                        continue
                    img = np.frombuffer(
                        fb[off : off + row_size * h], dtype=np.uint8
                    ).reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
                    rgb = img[::-1, :, ::-1].astype(np.int64)
                    rows.append(
                        (
                            int(doc_id),
                            int(j),
                            int(f),
                            int(k_frames),
                            int(w),
                            int(h),
                            int(rgb[:, :, 0].sum()),
                            int(rgb[:, :, 1].sum()),
                            int(rgb[:, :, 2].sum()),
                            int(w * h),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_idx", "src_frame", "n_frames",
                    "width", "height", "sum_r", "sum_g", "sum_b", "n_px",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        op, VIDEO_FRAME_SCHEMA
    )
