"""Multimodal column plumbing (north star: image/audio/video as opaque
binary columns with typed metadata).

The decode/feature-extraction media libraries are NOT in this container, so
the codec step is a clearly-marked stub (deterministic fake features or
NotImplementedError), but everything Spark-side is real and tested:

* schema: ``binary`` payload + a typed metadata struct;
* batching: decode runs in ``mapInPandas`` (Arrow batches, one Python
  worker per partition — the right shape for per-item CPU-heavy codecs);
* partitioning: media blobs repartition by id so decode parallelism is
  data-size driven, not file driven.

At 100 TB the binary payloads dominate; the plumbing keeps them in one
column that column pruning drops whenever a query touches metadata only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, checksum string, "
    "width int, height int, n_frames int"
)


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
