"""Multimodal column plumbing (north star: image/audio/video as opaque
binary columns with typed metadata).

Two layers:

* **Real header decoding** (:func:`parse_media_header`,
  :func:`synthesize_media`): container-format parsing — PNG IHDR, GIF
  logical screen descriptor, JPEG SOF scan, WAV RIFF/fmt — implemented
  with stdlib ``struct``/``zlib`` only, so width/height/frame metadata
  extraction from binary payloads is REAL and oracle-checkable (k41).
* **Pixel/sample decoding**: PIL/ffmpeg-style full decode is NOT available
  in this container; that step stays a clearly-marked
  ``NotImplementedError`` slot (``real_codec=True``), with deterministic
  fake features for unknown payloads so batch shape and schema stay
  exercised.

Spark-side shape in both layers:

* schema: ``binary`` payload + a typed metadata struct;
* batching: decode runs in ``mapInPandas`` (Arrow batches, one Python
  worker per partition — the right shape for per-item CPU-heavy codecs);
* partitioning: media blobs repartition by id so decode parallelism is
  data-size driven, not file driven.

At 100 TB the binary payloads dominate; the plumbing keeps them in one
column that column pruning drops whenever a query touches metadata only.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, checksum string, "
    "width int, height int, n_frames int"
)

HEADER_SCHEMA = "doc_id long, media_type string, width int, height int, n_frames int"


def synthesize_png(width: int, height: int) -> bytes:
    """A minimal VALID grayscale PNG of the given dimensions: signature,
    IHDR with correct CRC, one zlib IDAT of all-zero scanlines, IEND."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"\x00" * ((1 + width) * height)  # filter byte + row, per scanline
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 1))
        + chunk(b"IEND", b"")
    )


def synthesize_gif(width: int, height: int) -> bytes:
    """A minimal GIF89a: header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def synthesize_wav(n_samples: int, channels: int, sample_rate: int = 8000) -> bytes:
    """A minimal valid PCM-16 WAV with ``n_samples`` zero frames."""
    data = b"\x00" * (n_samples * channels * 2)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_media_header(b: bytes) -> tuple[str, int | None, int | None, int | None]:
    """Parse (media_type, width, height, n_frames) from a binary payload's
    container header — real format parsing, stdlib only. Unknown payloads
    return ('unknown', None, None, None); the caller decides the fallback."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "image/png", w, h, 1
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "image/gif", w, h, 1
    if b[:3] == b"\xff\xd8\xff":  # JPEG: scan markers for a SOF frame
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "image/jpeg", w, h, 1
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "image/jpeg", None, None, 1
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # walk RIFF chunks for fmt + data
        channels = bits = data_len = None
        i = 12
        while i + 8 <= len(b):
            tag, size = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
            if tag == b"fmt ":
                channels = struct.unpack("<H", b[i + 10 : i + 12])[0]
                bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
            elif tag == b"data":
                data_len = size
            i += 8 + size + (size % 2)
        if channels and bits and data_len is not None:
            return "audio/wav", None, None, data_len // (channels * bits // 8)
        return "audio/wav", None, None, None
    return "unknown", None, None, None


def decode_media_headers(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real container-header decode over Arrow batches: payload bytes in,
    typed (media_type, width, height, n_frames) out via
    :func:`parse_media_header`. This is the metadata-extraction stage of a
    media pipeline run at full scale — only the full pixel/sample decode
    (``decode_media(real_codec=True)``) needs external codec libraries."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "n_frames": pd.array([p[3] for p in parsed], dtype="Int32"),
                }
            )

    return df.mapInPandas(decode, HEADER_SCHEMA)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload: treat the utf-8 text bytes as an opaque media blob with
    a typed metadata struct — the schema/pruning shape of a real media table."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("declared_len"),
        ).alias("media_meta"),
    )


def decode_media(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """'Decode' the binary payload per Arrow batch via mapInPandas.

    ``real_codec=True`` is the slot where PIL/ffmpeg-style decoding would
    run; it raises NotImplementedError here (libs not installed). The
    default path computes deterministic fake features (sizes, checksum,
    fake dimensions derived from the checksum) so the batch shape, schema
    and partition behavior are fully exercised and testable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if real_codec:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "environment; plug the real decoder in here"
                )
            payloads = pdf["payload"]
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["mime"] for m in pdf["media_meta"]],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "checksum": digests,
                    # deterministic fake dimensions derived from content
                    "width": [int(d[:4], 16) % 1920 for d in digests],
                    "height": [int(d[4:8], 16) % 1080 for d in digests],
                    "n_frames": [1] * len(pdf),
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)
