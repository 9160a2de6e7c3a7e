"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the decode/feature steps as Arrow-batched Pandas UDFs.

The Spark-side plumbing (schema, ingestion, partitioning, UDF batch
shape) is real and tested; the actual media decode is STUBBED — the
image/audio libraries are not in this container — behind
`_decode_image_stub`, a deterministic fake that parses only what a
real decoder would (magic bytes → format; fixed fake dimensions).
Swap `_decode_image_stub` for a PIL/ffmpeg call in production; the
operator contract (mapInPandas over binary batches, metadata struct
out) does not change.

Ingestion matches the reference's whole-file binary taps
(binaryDirTap Controller.hs:700-707, fileListTap Controller.hs:463-471)
via the distributed `binaryFile` source.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# typed metadata schema attached to every media column
MEDIA_META_SCHEMA = (
    "path string, media_type string, byte_len bigint, "
    "format string, width int, height int, n_frames int"
)


def ingest_binary_dir(spark: SparkSession, directory: str, glob: str | None = None) -> DataFrame:
    """Directory of media files → (path, content binary, length) rows,
    split per-file across executors."""
    from hadron_spark.sources.taps import binary_dir_tap

    return binary_dir_tap(spark, directory, glob).select(
        "path", "content", F.col("length").alias("byte_len")
    )


_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi container
    b"ID3": "mp3",
}


def _sniff_format(content: bytes | None) -> str:
    if not content:
        return "empty"
    for magic, name in _MAGIC.items():
        if content[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_image_stub(content: bytes | None) -> tuple[str, int, int, int]:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg (libs
    not in this container). Returns (format, width, height, n_frames);
    dimensions are derived from the byte length so tests are stable.
    Production: replace body with e.g. PIL.Image.open(BytesIO(...))."""
    fmt = _sniff_format(content)
    if fmt in ("empty",):
        return fmt, 0, 0, 0
    n = len(content)
    # fake-but-deterministic geometry; a real decoder reads the header
    return fmt, 64 + n % 512, 64 + (n // 7) % 512, 1 + n % 16


def extract_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """(path, content, ...) → typed metadata rows (MEDIA_META_SCHEMA).

    mapInPandas: Arrow-batched, per-partition — the decode cost
    parallelizes with the scan; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "media_type": ["image"] * len(pdf),
                    "byte_len": [len(c) if c is not None else 0 for c in pdf[content_col]],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_frames": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, content_col: str = "content") -> DataFrame:
    """Video-style frame sampling plumbing: 1→N explode of sampled
    frame indices per media row, frame payload STUBBED as a slice of
    the source bytes (real impl: ffmpeg seek+decode). Output:
    (path, frame_idx, frame_bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_path, out_idx, out_bytes = [], [], []
            for path, content in zip(pdf["path"], pdf[content_col]):
                _, _, _, n_frames = _decode_image_stub(content)
                for i in range(0, n_frames, every_n):
                    out_path.append(path)
                    out_idx.append(i)
                    # stub frame payload: deterministic byte slice
                    sl = bytes(content[i : i + 16]) if content else b""
                    out_bytes.append(sl)
            yield pd.DataFrame(
                {"path": out_path, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(run, schema="path string, frame_idx int, frame_bytes binary")


def resize_stub(df: DataFrame, width: int, height: int, content_col: str = "content") -> DataFrame:
    """Resize plumbing: passes bytes through a Pandas-UDF stage with
    target geometry attached (real impl: PIL resize). Demonstrates the
    batch-shape contract for transform-in-place media ops."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "media resize requires an image library not present in "
                "this container; plumbing contract is exercised by "
                "extract_media_meta/frame_sample"
            )

    return df.mapInPandas(run, schema=f"path string, {content_col} binary, width int, height int")
