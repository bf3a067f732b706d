"""Multimodal columns: opaque binary media + typed metadata (SURVEY §2.11).

Design for 100 TB of mixed media:
- media bytes live in a ``BinaryType`` column (Parquet handles binary
  natively, with page-level compression);
- typed metadata travels alongside in a struct column so filters/pruning
  (``media_meta.media_type = 'image/png'``) never touch the bytes;
- decode / feature-extraction is the one legitimately-Python stage, so it
  runs as ``mapInPandas`` — Arrow-batched, one Python worker per task,
  vectorized within the batch.  Partition count controls decode
  parallelism; the schema out of the UDF is explicit.

Codec status (round 10): ``decode_media`` REALLY decodes the three
raster formats reachable without any dependency — BMP
(BITMAPINFOHEADER), binary PNM (P5/P6), and **PNG** (non-interlaced
8-bit gray/RGB/gray+alpha/RGBA: stdlib zlib inflate + the five
scanline filters, chunk CRCs verified) — with a pure-stdlib parser
shipped by value inside the mapInPandas closure: parsed width/height
from the header and the mean sample value over the decoded payload
(padding-aware for 24-bit BMP rows, unfiltered scanlines for PNG).
Every other byte stream (including this corpus' text/plain media) takes
the ``opaque`` fallback: deterministic byte statistics with
checksum-derived pseudo-dimensions, the original stub semantics — so a
corrupt or unknown file NEVER crashes a 100 TB decode job, it just
reports ``media_kind='opaque'``.  ``decode_audio`` does the same for
the audio leg: real RIFF/WAVE PCM chunk parsing (channels / sample rate
/ bit depth / frames / duration / numpy-vectorized mean amplitude),
opaque-with-NULLs otherwise.  JPEG/MP3/video still need PIL/libav,
absent from this container (re-probed each round); they would slot
into ``_media_parser``/``_audio_parser`` without touching the Spark
plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary media column + typed metadata struct.

    (Here the "media" is the utf-8 bytes of the text — the container has no
    real media; the column types and layout are the real design.)
    """
    return df.withColumns(
        {
            "media": F.encode(F.col(text_col), "UTF-8"),
            "media_meta": F.struct(
                F.lit("text/plain").alias("media_type"),
                F.octet_length(F.col(text_col)).alias("n_bytes"),
            ),
        }
    )


def _media_parser():
    """Factory for the per-row media feature extractor — defined inside
    a factory (not at module top level) so cloudpickle ships the
    returned function BY VALUE with the mapInPandas closure: Spark's
    Python workers do not have this package on ``sys.path`` (the driver
    controls the session), and a module-global reference would fail
    with ``ModuleNotFoundError`` on the worker.  Tests call the factory
    directly, so there is exactly ONE definition to keep correct.

    The returned ``parse(media) -> (n_bytes, checksum, media_kind,
    width, height, mean_pixel)``:

    - **BMP** (``BM`` magic, BITMAPINFOHEADER): width/height are the
      signed int32 LE fields at offsets 18/22 (|height| — negative
      means top-down row order); for the uncompressed 24-bit layout the
      mean pixel EXCLUDES the per-row padding to the 4-byte boundary,
      other layouts fall back to the raw payload mean.
    - **PNM** (``P5`` grayscale / ``P6`` RGB, binary): header tokens
      (whitespace-separated, ``#`` comments legal) give width, height,
      maxval; mean over the sample payload bytes.
    - **PNG** (8-byte signature): IHDR-validated non-interlaced 8-bit
      gray/RGB/gray+alpha/RGBA; IDAT chunks concatenated, zlib
      inflated, the five scanline filters (None/Sub/Up/Average/Paeth)
      reversed; mean over the reconstructed sample bytes.  Chunk CRCs
      verified; palette/16-bit/interlaced/corrupt → opaque.
    - anything else (or any malformed header): ``opaque`` — byte count,
      checksum, checksum-derived pseudo-dimensions (``% 640``/``% 480``,
      the original stub semantics, still what the registry oracle
      recomputes for this corpus' text media) and NULL mean_pixel.
      Malformed real-format bytes degrade to opaque instead of raising:
      one corrupt file must not kill a 100 TB decode job.
    """

    def parse_bmp(m: bytes):
        # anything shorter than the 14-byte file header + 40-byte
        # INFOHEADER cannot be a decodable file — opaque, not a guess
        if len(m) < 54:
            return None
        # BITMAPINFOHEADER (and its V4/V5 extensions) only — the ancient
        # 12-byte COREHEADER packs int16 dims at different offsets and
        # would read as garbage here, so it degrades to opaque.  The
        # size must be one of the EXACT published header sizes, not
        # merely >= 40: a text document that happens to start with
        # "BM" ("BMW dealership …") decodes its ASCII bytes at offset
        # 14 to some huge int, and a >= test would sail past it and
        # report garbage dimensions as a real bitmap
        if int.from_bytes(m[14:18], "little") not in (40, 52, 56, 108, 124):
            return None
        # plausibility gates a real encoder always satisfies and ASCII
        # text essentially never does: planes is mandated == 1, bpp is
        # one of the legal depths, pixel data starts at or after the
        # 54-byte headers and inside the buffer
        if int.from_bytes(m[26:28], "little") != 1:
            return None
        w = int.from_bytes(m[18:22], "little", signed=True)
        h = int.from_bytes(m[22:26], "little", signed=True)
        if w <= 0 or h == 0:
            return None
        height = abs(h)
        offset = int.from_bytes(m[10:14], "little")
        if not 54 <= offset <= len(m):
            return None
        bpp = int.from_bytes(m[28:30], "little")
        if bpp not in (1, 4, 8, 16, 24, 32):
            return None
        compression = int.from_bytes(m[30:34], "little")
        payload = m[offset:]
        if bpp == 24 and compression == 0:
            row = ((w * 3 + 3) // 4) * 4
            if len(payload) >= row * height:
                tot = cnt = 0
                for r in range(height):
                    chunk = payload[r * row : r * row + w * 3]
                    tot += sum(chunk)
                    cnt += len(chunk)
                return w, height, round(tot / cnt, 4) if cnt else None
        if payload:
            return w, height, round(sum(payload) / len(payload), 4)
        return w, height, None

    def parse_pnm(m: bytes):
        # P5/P6 header: magic, width, height, maxval — whitespace
        # separated with '#'-to-EOL comments; payload starts after the
        # single whitespace byte following maxval
        pos, tokens = 2, []
        while len(tokens) < 3 and pos < len(m):
            c = m[pos : pos + 1]
            if c == b"#":
                nl = m.find(b"\n", pos)
                if nl < 0:
                    return None
                pos = nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(m) and not m[end : end + 1].isspace():
                    end += 1
                tokens.append(m[pos:end])
                pos = end
        if len(tokens) < 3 or pos >= len(m):
            return None
        try:
            w, h, maxval = (int(t) for t in tokens)
        except ValueError:
            return None
        if w <= 0 or h <= 0 or not 0 < maxval < 65536:
            return None
        channels = 3 if m[:2] == b"P6" else 1
        sample = 2 if maxval > 255 else 1
        need = w * h * channels * sample
        payload = m[pos + 1 : pos + 1 + need]
        if len(payload) < need:
            return None
        return w, h, round(sum(payload) / len(payload), 4)

    def parse_png(m: bytes):
        # PNG (round 10): the dominant real-corpus raster format,
        # decodable with ONLY stdlib zlib — non-interlaced 8-bit
        # gray(0)/RGB(2)/gray+alpha(4)/RGBA(6).  Chunk CRCs are
        # verified (zlib.crc32 over type+data) and the decompressed
        # scanline length must match the header exactly; anything else
        # — palette images, 16-bit, Adam7 interlace, truncation, CRC
        # damage — degrades to opaque rather than guessing.
        import zlib

        if len(m) < 33 or m[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, w, h, channels = 8, None, None, None
        idat = bytearray()
        saw_iend = False
        while pos + 12 <= len(m):
            ln = int.from_bytes(m[pos:pos + 4], "big")
            typ = m[pos + 4:pos + 8]
            if pos + 12 + ln > len(m):
                return None
            data = m[pos + 8:pos + 8 + ln]
            crc = int.from_bytes(m[pos + 8 + ln:pos + 12 + ln], "big")
            if crc != zlib.crc32(typ + data):
                return None
            if typ == b"IHDR":
                # must be the FIRST chunk, exactly 13 bytes
                if ln != 13 or pos != 8:
                    return None
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, color, comp, filt, inter = data[8:13]
                if depth != 8 or comp != 0 or filt != 0 or inter != 0:
                    return None
                channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
                if channels is None or w <= 0 or h <= 0:
                    return None
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                saw_iend = True
                break
            pos += 12 + ln
        if w is None or not idat or not saw_iend:
            return None
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return None
        stride = w * channels
        if len(raw) != h * (1 + stride):
            return None
        bpp = channels  # bytes per pixel at depth 8
        prev = bytearray(stride)
        tot = 0
        for r in range(h):
            off = r * (1 + stride)
            ft = raw[off]
            line = bytearray(raw[off + 1:off + 1 + stride])
            if ft == 0:
                pass
            elif ft == 1:  # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    line[i] = (line[i] + pr) & 0xFF
            else:
                return None
            tot += sum(line)
            prev = line
        return w, h, round(tot / (h * stride), 4)

    def parse(media):
        # NULL media (null text upstream) → NULL features, never a crash
        if media is None:
            return None, None, None, None, None, None
        m = bytes(media)
        n = len(m)
        checksum = sum(m) % 2147483647
        parsed, kind = None, "opaque"
        if m[:2] == b"BM":
            parsed = parse_bmp(m)
            kind = "bmp"
        elif m[:2] in (b"P5", b"P6"):
            parsed = parse_pnm(m)
            kind = "pnm"
        elif m[:8] == b"\x89PNG\r\n\x1a\n":
            parsed = parse_png(m)
            kind = "png"
        if parsed is None:
            return n, checksum, "opaque", checksum % 640, checksum % 480, None
        w, h, mean = parsed
        return n, checksum, kind, w, h, mean

    return parse


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column —
    real header+payload decode for BMP/PNM, deterministic byte stats
    for everything else (module docstring).  The parser comes from
    ``_media_parser`` so the shipped closure is self-contained."""
    parse = _media_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [parse(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [f[0] for f in feats], dtype="Int32"
                    ),
                    "checksum": pd.Series(
                        [f[1] for f in feats], dtype="Int64"
                    ),
                    "media_kind": pd.Series(
                        [f[2] for f in feats], dtype="object"
                    ),
                    "width": pd.Series(
                        [f[3] for f in feats], dtype="Int32"
                    ),
                    "height": pd.Series(
                        [f[4] for f in feats], dtype="Int32"
                    ),
                    "mean_pixel": pd.Series(
                        [f[5] for f in feats], dtype="Float64"
                    ),
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, DECODED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_abs_amplitude", T.DoubleType()),
    ]
)


def _audio_parser():
    """Factory for the WAV feature extractor — same by-value shipping
    rationale as ``_media_parser`` (workers lack this package).

    The returned ``parse(media) -> (n_bytes, media_kind, n_channels,
    sample_rate, bits_per_sample, n_frames, duration_s,
    mean_abs_amplitude)`` REALLY decodes RIFF/WAVE PCM — the one audio
    container parseable with zero dependencies:

    - walks the chunk list (4-byte id, uint32 LE size, word-aligned
      bodies — a LIST/INFO chunk before ``fmt `` is legal and skipped),
      takes the FIRST ``fmt `` and ``data`` chunks;
    - accepts only what it can honestly decode: format tag 1 (integer
      PCM), 8- or 16-bit, ``block_align == n_channels * bytes_per_sample``
      (a lying block_align would mis-frame every sample after the first);
    - amplitude is the mean |sample| normalized to [0, 1] (8-bit is
      unsigned around 128, 16-bit signed LE), vectorized via
      ``numpy.frombuffer`` — no per-sample Python loop on a 100 TB
      decode job;
    - anything else — truncated chunk, float/ADPCM/extensible formats,
      a text document starting with "RIFF" — degrades to ``opaque``
      with NULL audio fields, never an executor crash.
    """

    def parse_wav(m: bytes):
        if len(m) < 44 or m[:4] != b"RIFF" or m[8:12] != b"WAVE":
            return None
        fmt = data = None
        pos = 12
        while pos + 8 <= len(m):
            cid = m[pos : pos + 4]
            size = int.from_bytes(m[pos + 4 : pos + 8], "little")
            body = m[pos + 8 : pos + 8 + size]
            if len(body) < size:
                return None  # truncated chunk — not a decodable file
            if cid == b"fmt " and fmt is None:
                fmt = body
            elif cid == b"data" and data is None:
                data = body
            pos += 8 + size + (size & 1)  # bodies are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_format = int.from_bytes(fmt[0:2], "little")
        n_channels = int.from_bytes(fmt[2:4], "little")
        sample_rate = int.from_bytes(fmt[4:8], "little")
        block_align = int.from_bytes(fmt[12:14], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_format != 1 or n_channels < 1 or sample_rate <= 0:
            return None
        if bits not in (8, 16) or block_align != n_channels * (bits // 8):
            return None
        n_frames = len(data) // block_align
        duration = round(n_frames / sample_rate, 6)
        usable = data[: n_frames * block_align]
        if not usable:
            mean = None
        else:
            import numpy as np

            if bits == 8:  # unsigned, silence at 128
                s = np.frombuffer(usable, dtype=np.uint8).astype(np.int16)
                mean = float(np.abs(s - 128).mean() / 128.0)
            else:  # signed 16-bit little-endian
                s = np.frombuffer(usable, dtype="<i2")
                mean = float(np.abs(s.astype(np.int32)).mean() / 32768.0)
            mean = round(mean, 6)
        return n_channels, sample_rate, bits, n_frames, duration, mean

    def parse(media):
        if media is None:  # NULL media → NULL features, never a crash
            return (None,) * 8
        m = bytes(media)
        parsed = parse_wav(m) if m[:4] == b"RIFF" else None
        if parsed is None:
            return (len(m), "opaque") + (None,) * 6
        return (len(m), "wav") + parsed

    return parse


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched audio decode over the binary column — real
    RIFF/WAVE PCM parsing (``_audio_parser``), ``opaque`` with NULL
    audio fields for everything else.  Same 100 TB shape as
    ``decode_media``: metadata-first schema, partition-parallel,
    one self-contained closure."""
    parse = _audio_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [parse(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series([f[0] for f in feats], dtype="Int32"),
                    "media_kind": pd.Series(
                        [f[1] for f in feats], dtype="object"
                    ),
                    "n_channels": pd.Series(
                        [f[2] for f in feats], dtype="Int32"
                    ),
                    "sample_rate": pd.Series(
                        [f[3] for f in feats], dtype="Int32"
                    ),
                    "bits_per_sample": pd.Series(
                        [f[4] for f in feats], dtype="Int32"
                    ),
                    "n_frames": pd.Series([f[5] for f in feats], dtype="Int32"),
                    "duration_s": pd.Series(
                        [f[6] for f in feats], dtype="Float64"
                    ),
                    "mean_abs_amplitude": pd.Series(
                        [f[7] for f in feats], dtype="Float64"
                    ),
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, AUDIO_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("target_w", T.IntegerType()),
                    T.StructField("target_h", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Binary→binary transform with metadata update (the image-resize shape).

    A real codec would decode, resample, and re-encode; the stub truncates
    or pads the byte stream to ``width·height`` deterministically, keeping
    the exact contract a real resize has: binary in, binary out, metadata
    struct updated, schema explicit, Arrow-batched, partition-parallel.
    The closure is self-contained (workers lack this package).
    """

    if width <= 0 or height <= 0:
        raise ValueError(f"width/height must be positive, got {width}x{height}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def fake_resize(media):
            if media is None:  # NULL media → NULL output, no crash
                return None
            if len(media) >= target:
                return bytes(media[:target])
            return bytes(media) + b"\x00" * (target - len(media))

        for pdf in it:
            resized = [fake_resize(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": resized,
                    "media_meta": [
                        None
                        if m is None
                        else {
                            "media_type": "image/raw",
                            "n_bytes": len(m),
                            "target_w": width,
                            "target_h": height,
                        }
                        for m in resized
                    ],
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 16,
    stride: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per sampled frame — the video frame-sampling fan-out shape.

    The stub treats the byte stream as ``frame_size``-byte frames and emits
    every ``stride``-th one.  A real implementation swaps the slicing for a
    container demuxer; the fan-out (one input row → N output rows through
    ``mapInPandas``), the explicit schema, and the frame indexing carry
    over unchanged.  At 100 TB the output row count dominates — sampled
    frames, never all frames.
    """

    if frame_size <= 0 or stride <= 0:
        # driver-side, not a ZeroDivisionError deep inside an executor
        raise ValueError(
            f"frame_size and stride must be positive, got "
            f"{frame_size}/{stride}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, totals = [], [], [], []
            for doc_id, media in zip(
                pdf[id_col].astype("int64"), pdf["media"]
            ):
                if media is None:  # NULL media emits no frames
                    continue
                m = bytes(media)
                n_total = len(m) // frame_size
                for i in range(0, n_total, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(m[i * frame_size:(i + 1) * frame_size])
                    totals.append(n_total)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                }
            )

    return df.select(id_col, "media").mapInPandas(batches, FRAME_SCHEMA)
