"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested. Decoders, by modality:
- audio: REAL — stdlib ``wave`` parses WAV containers and PCM
  (``audio_features``), no external library needed;
- image: real via Pillow when importable (executor-resolved,
  ``decode_resize``), else a clearly-marked deterministic fake;
- video frames: deterministic fake slicer (no codec libs in-container) —
  swap in PyAV without touching the dataflow.
Corrupt/undecodable blobs degrade per-row (decoded=false) rather than
failing the batch — mandatory at 100 TB where some blobs are always bad.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Media rows are big (MBs); schema carries bytes + enough metadata to plan
# without decoding.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, content_hash string, feature array<float>"
)


def _decode_image(raw: bytes) -> list[float]:
    """STUB: real impl would decode + embed (Pillow/timm). Deterministic
    fake: 8 floats derived from byte statistics, so tests are stable."""
    if raw is None:
        return [0.0] * 8
    n = len(raw)
    return [
        float(n % 251),
        float(raw[0]) if n else 0.0,
        float(raw[-1]) if n else 0.0,
        float(sum(raw[:64]) % 997),
        float(min(raw[:64], default=0)),
        float(max(raw[:64], default=0)),
        float(n % 17),
        float(n % 31),
    ]


def _pil():
    """Import-guarded Pillow: the decoder is real wherever Pillow is
    installed; None in codec-less containers (this sandbox)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_resize(
    df: DataFrame, size: tuple[int, int], require_codec: bool = False
) -> DataFrame:
    """Image decode + resize: MEDIA_SCHEMA in, MEDIA_SCHEMA out with
    ``content`` re-encoded (PNG) at ``size`` and width/height updated.

    Decode ladder, resolved per-row on the EXECUTOR:
    1. Pillow when importable (any format Pillow reads, fast C resample);
    2. the dependency-free stdlib PNG codec (``pipeline/png.py`` — full
       filter reconstruction, nearest-neighbor resample, PNG re-encode) —
       REAL decode with no external library, mirroring the stdlib-wave
       audio path;
    3. a clearly-marked deterministic fake (mime ``image/x-fake``) that
       byte-samples the blob to ``w*h`` bytes — same dataflow and Arrow
       batch shape, keeping non-PNG plumbing testable in codec-less
       containers. ``require_codec=True`` raises instead of faking
       (production guard; PNG rows still decode for real without Pillow).
    Non-image rows pass through untouched."""
    w, h = size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        import io

        from hpcc_platform_spark.pipeline.png import (
            png_decode,
            png_encode,
            rgb_resize_nearest,
        )

        def one(rec):
            if rec.kind != "image" or rec.content is None:
                return rec.content, rec.mime, rec.width, rec.height
            raw = bytes(rec.content)
            if Image is not None:
                img = Image.open(io.BytesIO(raw)).convert("RGB").resize((w, h))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue(), "image/png", w, h
            try:  # stdlib PNG path: real decode, no dependency
                sw, sh, rgb = png_decode(raw)
                resized = rgb_resize_nearest(sw, sh, rgb, w, h)
                return png_encode(w, h, bytes(resized)), "image/png", w, h
            except ValueError:
                pass
            if require_codec:
                raise NotImplementedError(
                    "media decode requires Pillow for non-PNG formats and "
                    "Pillow is not installed; install it or call with "
                    "require_codec=False for the deterministic fake"
                )
            # Deterministic fake: stride-sample the blob to w*h bytes.
            n = max(len(raw), 1)
            fake = bytes(raw[(i * n) // (w * h)] for i in range(w * h)) if raw else b""
            return fake, "image/x-fake", w, h

        for pdf in batches:
            out = pdf.copy()
            decoded = [one(rec) for rec in pdf.itertuples(index=False)]
            out["content"] = [d[0] for d in decoded]
            out["mime"] = [d[1] for d in decoded]
            out["width"] = [d[2] for d in decoded]
            out["height"] = [d[3] for d in decoded]
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Feature extraction over binary media via mapInPandas.

    Batches are re-chunked to ``batch_rows`` so a partition of MB-sized
    blobs never materializes GBs per Arrow batch — the knob that matters
    when this runs against real media at scale (pair with
    ``spark.sql.files.maxPartitionBytes`` on ingest).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["content"].map(
                            lambda b: 0 if b is None else len(b)
                        ),
                        # Fingerprint = md5 of the lowercase-hex encoding of
                        # the bytes (not the raw bytes): equivalent collision
                        # strength, and computable by any SQL engine with
                        # only a string md5 — which keeps this column
                        # cross-engine oracle-checkable.
                        "content_hash": chunk["content"].map(
                            lambda b: ""
                            if b is None
                            else __import__("hashlib").md5(b.hex().encode()).hexdigest()
                        ),
                        "feature": chunk["content"].map(_decode_image),
                    }
                )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_media_table(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded bytes)."""
    rows = []
    for i in range(n):
        raw = bytes((i * 7 + j * 13) % 256 for j in range(32 + (i % 5) * 16))
        rows.append(
            (i, ["image", "audio", "video"][i % 3], raw, "application/octet-stream",
             64 + i % 8, 64 + i % 8, 1000 + i)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary, frame_hash string"


def frame_sample(df: DataFrame, every_n: int = 2, max_frames: int = 8) -> DataFrame:
    """Video frame sampling: emit every ``every_n``-th frame, capped at
    ``max_frames`` per media row — the fan-out transform of a video
    pipeline (one input row → k frame rows).

    The frame *decode* is a deterministic fake (fixed-size byte slices of
    the content standing in for decoded frames — no codec libs
    in-container); the plumbing is real: mapInPandas fan-out, per-frame
    rows with ordinals, batch shape independent of blob size. Swap the
    slicer for PyAV's ``container.decode(video=0)`` without touching the
    dataflow."""
    import hashlib
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                if rec.kind != "video" or rec.content is None:
                    continue
                raw = bytes(rec.content)
                # fake decode: 16-byte windows act as "frames"
                n_frames = max(len(raw) // 16, 1)
                taken = 0
                for idx in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    fb = raw[idx * 16 : idx * 16 + 16] or raw[:16]
                    # md5-of-hex, same cross-engine-oracle rationale as
                    # extract_features' content_hash.
                    rows.append(
                        (rec.media_id, idx, fb, hashlib.md5(fb.hex().encode()).hexdigest())
                    )
                    taken += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def synth_wav_table(spark, n: int = 60) -> DataFrame:
    """Deterministic REAL WAV files (stdlib ``wave``, 16-bit mono PCM at
    8 kHz): sample j of media i is ((i*31 + j*17) % 2003) - 1001 — a
    formula a SQL oracle can replay exactly (integer math, exact in
    doubles). Unlike the opaque fake_media_table bytes, these decode with
    any WAV reader."""
    import io
    import struct
    import wave

    rows = []
    for i in range(n):
        n_samples = 800 + (i % 5) * 160
        pcm = struct.pack(
            f"<{n_samples}h",
            *[((i * 31 + j * 17) % 2003) - 1001 for j in range(n_samples)],
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm)
        rows.append(
            (i, "audio", buf.getvalue(), "audio/wav", None, None,
             n_samples * 1000 // 8000)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_png_table(spark, n: int = 60) -> DataFrame:
    """Deterministic REAL PNG images (stdlib encoder, 8-bit RGB): pixel
    (x, y) of media i is R=(i*7+x*3+y*5)%256, G=(i*11+x*2+y*7)%256,
    B=(i*13+x*5+y*2)%256 — integer formulas a SQL oracle can replay
    exactly. Unlike the opaque fake_media_table bytes, these decode with
    any PNG reader (Pillow included)."""
    from hpcc_platform_spark.pipeline.png import png_encode

    rows = []
    for i in range(n):
        w, h = 8 + (i % 4) * 4, 8 + (i % 3) * 4
        rgb = bytearray()
        for y in range(h):
            for x in range(w):
                rgb += bytes(
                    (
                        (i * 7 + x * 3 + y * 5) % 256,
                        (i * 11 + x * 2 + y * 7) % 256,
                        (i * 13 + x * 5 + y * 2) % 256,
                    )
                )
        rows.append((i, "image", png_encode(w, h, bytes(rgb)), "image/png", w, h, None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id long, decoded boolean, width int, height int, "
    "avg_r double, avg_g double, avg_b double"
)


def image_features(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Image feature extraction with a REAL decoder: the dependency-free
    stdlib PNG codec (``pipeline/png.py``) parses the container, undoes
    scanline filters, and yields per-channel mean intensities — no
    external codec library needed, so unlike ``decode_resize``'s Pillow
    fast path this is never stubbed. Undecodable blobs (not PNG /
    truncated / unsupported shape) degrade to decoded=false with
    byte-derived placeholders instead of failing the batch. Same
    re-chunked mapInPandas shape as extract_features/audio_features."""
    from collections.abc import Iterator

    from hpcc_platform_spark.pipeline.png import png_decode

    def one(media_id, raw):
        if raw is None:
            return (media_id, False, 0, 0, 0.0, 0.0, 0.0)
        try:
            w, h, rgb = png_decode(bytes(raw))
            npix = w * h
            sums = [0, 0, 0]
            for p in range(0, len(rgb), 3):
                sums[0] += rgb[p]
                sums[1] += rgb[p + 1]
                sums[2] += rgb[p + 2]
            return (
                media_id,
                True,
                w,
                h,
                round(sums[0] / npix, 4),
                round(sums[1] / npix, 4),
                round(sums[2] / npix, 4),
            )
        except ValueError:
            n = len(raw)
            return (media_id, False, n, 0, float(n % 251), 0.0, 0.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    [one(r.media_id, r.content) for r in chunk.itertuples(index=False)],
                    columns=[
                        "media_id", "decoded", "width", "height",
                        "avg_r", "avg_g", "avg_b",
                    ],
                )

    return df.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def _y4m_parse(raw: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a YUV4MPEG2 (Y4M) stream: returns (width, height, [Y planes]).

    Y4M is the standard UNCOMPRESSED video interchange container (ffmpeg
    `-f yuv4mpeg`), so this is a REAL video decode with zero dependencies
    — the video analogue of the stdlib-wave/zlib-PNG paths. Supports
    C420/C422/C444/Cmono chroma; only luma is returned (features use Y).
    Raises ValueError on malformed input so callers degrade per-row."""
    if raw is None:
        raise ValueError("no content")
    raw = bytes(raw)
    nl = raw.find(b"\n")
    if nl < 0 or not raw.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = None
    chroma = "420"
    for tok in raw[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode("ascii", "replace")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    if chroma.startswith("420"):
        uv = (w // 2) * (h // 2)
    elif chroma.startswith("422"):
        uv = (w // 2) * h
    elif chroma.startswith("444"):
        uv = w * h
    elif chroma.startswith("mono"):
        uv = 0
    else:
        raise ValueError(f"unsupported chroma {chroma!r}")
    ysz = w * h
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(raw):
        fnl = raw.find(b"\n", pos)
        if fnl < 0 or raw[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        if pos + ysz + 2 * uv > len(raw):
            raise ValueError("truncated frame")
        frames.append(raw[pos : pos + ysz])
        pos += ysz + 2 * uv
    return w, h, frames


def synth_y4m_table(spark, n: int = 40) -> DataFrame:
    """Deterministic REAL Y4M videos: frame j's luma pixel (x, y) of media
    i is (i*7 + j*11 + x*3 + y*5) % 256 — replayable by a SQL oracle.
    Chroma planes alternate C420/C444 per media so the parser's plane
    arithmetic is exercised; their content is arbitrary (features use Y
    only)."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 3) * 4, 8 + (i % 2) * 4
        n_frames = 2 + (i % 4)
        chroma = "420" if i % 2 == 0 else "444"
        uv = (w // 2) * (h // 2) if chroma == "420" else w * h
        buf = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 C{chroma}\n".encode())
        for j in range(n_frames):
            buf += b"FRAME\n"
            buf += bytes(
                (i * 7 + j * 11 + x * 3 + y * 5) % 256
                for y in range(h)
                for x in range(w)
            )
            buf += bytes((i + j + p) % 256 for p in range(2 * uv))
        rows.append(
            (i, "video", bytes(buf), "video/x-yuv4mpeg", w, h, n_frames * 40)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, decoded boolean, width int, height int, "
    "avg_y double"
)


def video_frame_features(
    df: DataFrame, every_n: int = 2, max_frames: int = 8, batch_rows: int = 64
) -> DataFrame:
    """Video frame sampling with a REAL decoder: parse the Y4M container,
    take every ``every_n``-th frame capped at ``max_frames``, and emit per
    frame the mean luma — the fan-out transform (one media row → k frame
    rows) of a video pipeline with genuine pixel access, no codec library.
    Undecodable blobs degrade to one decoded=false row instead of failing
    the batch. Swap ``_y4m_parse`` for PyAV to read compressed formats —
    the dataflow, schema, and batch shape do not change."""
    from collections.abc import Iterator

    def rows_for(media_id, raw):
        try:
            w, h, frames = _y4m_parse(raw)
            npix = w * h
            out = []
            taken = 0
            for j in range(0, len(frames), every_n):
                if taken >= max_frames:
                    break
                y = frames[j]
                out.append(
                    (media_id, j, True, w, h, round(sum(y) / npix, 4))
                )
                taken += 1
            return out
        except ValueError:
            nb = 0 if raw is None else len(raw)
            return [(media_id, -1, False, 0, 0, float(nb % 251))]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                recs = [
                    r
                    for rec in chunk.itertuples(index=False)
                    for r in rows_for(rec.media_id, rec.content)
                ]
                yield pd.DataFrame(
                    recs,
                    columns=[
                        "media_id", "frame_idx", "decoded", "width", "height",
                        "avg_y",
                    ],
                )

    return df.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, decoded boolean, n_frames int, framerate int, "
    "duration_ms int, rms double"
)


def audio_features(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Audio feature extraction with a REAL decoder: stdlib ``wave``
    parses the container and the PCM samples yield RMS amplitude — no
    external codec library needed, so unlike image decode this path is
    never stubbed. Undecodable blobs (not WAV / truncated) degrade to
    decoded=false with byte-derived placeholders instead of failing the
    batch — at 100 TB some blobs are always corrupt, and a pipeline that
    dies on row 3 billion is wrong. Same re-chunked mapInPandas shape as
    extract_features."""
    import io
    import math
    import struct
    import wave
    from collections.abc import Iterator

    def one(media_id, raw):
        if raw is None:
            return (media_id, False, 0, 0, 0, 0.0)
        try:
            with wave.open(io.BytesIO(bytes(raw)), "rb") as w:
                nf, rate, width = w.getnframes(), w.getframerate(), w.getsampwidth()
                ch = w.getnchannels()
                pcm = w.readframes(nf)
            if width != 2 or ch != 1:
                raise ValueError("only 16-bit mono handled here")
            vals = struct.unpack(f"<{nf}h", pcm)
            rms = math.sqrt(sum(v * v for v in vals) / nf) if nf else 0.0
            return (media_id, True, nf, rate, nf * 1000 // rate, round(rms, 4))
        except Exception:
            n = len(raw)
            return (media_id, False, n, 0, 0, float(n % 251))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    [one(r.media_id, r.content)
                     for r in chunk.itertuples(index=False)],
                    columns=["media_id", "decoded", "n_frames", "framerate",
                             "duration_ms", "rms"],
                )

    return df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


# --- JPEG header metadata (real marker walk, no dependency) -----------------

def parse_jpeg_header(raw: bytes) -> dict | None:
    """Walk JFIF markers to the SOF segment and return real metadata —
    width, height, component count (1=gray, 3=YCbCr), progressive flag,
    bit precision — without decoding entropy data (full baseline/
    progressive pixel decode genuinely needs a DCT codec; metadata does
    not, and corpus pipelines filter on dimensions long before decode).
    Returns None for anything that isn't a well-formed JPEG prefix."""
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":  # SOI
        return None
    i = 2
    sof_baseline = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while i + 4 <= len(raw):
        if raw[i] != 0xFF:
            return None
        marker = raw[i + 1]
        if marker == 0xD9:  # EOI before SOF
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RST/TEM: no length
            i += 2
            continue
        seglen = int.from_bytes(raw[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > len(raw):
            return None
        if marker in sof_baseline:
            seg = raw[i + 4 : i + 2 + seglen]
            if len(seg) < 6:
                return None
            return {
                "precision": seg[0],
                "height": int.from_bytes(seg[1:3], "big"),
                "width": int.from_bytes(seg[3:5], "big"),
                "components": seg[5],
                "progressive": marker == 0xC2,
            }
        i += 2 + seglen
    return None


def synth_jpeg_header(width: int, height: int, components: int = 3,
                      progressive: bool = False) -> bytes:
    """A structurally valid JPEG prefix (SOI + APP0/JFIF + SOF) for
    metadata-path tests — not a decodable image (no entropy data)."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_kind = b"\xff\xc2" if progressive else b"\xff\xc0"
    comp = b"".join(
        bytes([cid + 1, 0x11, 0x00]) for cid in range(components)
    )
    sof_payload = (
        b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([components])
        + comp
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
        + sof_kind + (len(sof_payload) + 2).to_bytes(2, "big") + sof_payload
        + b"\xff\xd9"
    )


def jpeg_metadata(df: DataFrame, blob_col: str = "data",
                  id_col: str = "media_id", batch_rows: int = 64) -> DataFrame:
    """Per-blob JPEG metadata extraction over mapInPandas (Arrow batches,
    re-chunked so MB blobs can't balloon a batch); malformed blobs
    degrade per-row (parsed=false), never fail the task."""
    schema = (
        f"{id_col} long, parsed boolean, width int, height int, "
        "components int, progressive boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for rec in chunk.itertuples(index=False):
                    meta = parse_jpeg_header(bytes(getattr(rec, blob_col)))
                    if meta is None:
                        rows.append((getattr(rec, id_col), False, None, None,
                                     None, None))
                    else:
                        rows.append((getattr(rec, id_col), True, meta["width"],
                                     meta["height"], meta["components"],
                                     meta["progressive"]))
                yield pd.DataFrame(
                    rows,
                    columns=[id_col, "parsed", "width", "height",
                             "components", "progressive"],
                )

    return df.mapInPandas(run, schema=schema)
