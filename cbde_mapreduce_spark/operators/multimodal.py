"""Multimodal column plumbing (SURVEY.md §2.11): opaque binary + typed metadata.

Design: media payloads are ``BinaryType`` columns with a typed metadata
struct alongside (kind, n_bytes, content hash). All per-payload processing
runs as Arrow-batched ``mapInPandas`` — the batch shape, schema, and
partitioning are real and tested; only the *codec* step is stubbed, because
image/audio libraries are not available in this environment.

At 100 TB: payloads live in parquet binary columns (or object-store paths
loaded via ``spark.read.format('binaryFile')``); partition sizing must count
bytes, not rows — keep ``spark.sql.files.maxPartitionBytes`` at/below
executor batch memory and never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, kind string, n_bytes bigint, content_md5 string"


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Promote a text corpus to a multimodal-shaped table.

    (doc_id, payload: binary, kind, declared_bytes) — in production the
    payload would be image/audio bytes; here it is the utf-8 encoded text,
    which keeps every downstream step real and verifiable.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("kind"),
        F.octet_length("text").cast("bigint").alias("declared_bytes"),
    )


def decode_media(payload: bytes, kind: str):
    """Codec stub. Real decode (PIL/ffmpeg/torchaudio) is unavailable in this
    environment; anything that needs pixels/samples must raise — loudly, not
    with fake data — so pipelines fail fast rather than train on garbage.
    """
    raise NotImplementedError(
        f"media codec for kind={kind!r} not available in this environment; "
        "plug a decoder into extract_binary_features()"
    )


def extract_binary_features(multimodal: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (no decode needed):
    payload size + content MD5. The mapInPandas shape here is exactly where
    a real decoder (resize / frame-sample / fingerprint) plugs in.
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return multimodal.mapInPandas(features, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"
RESIZE_SCHEMA = "doc_id bigint, width int, height int, pixels binary"


def sample_frames(
    multimodal: DataFrame, frame_bytes: int = 256, every_k: int = 2
) -> DataFrame:
    """1→N frame sampling: each payload splits into fixed-size frames and
    every k-th frame is emitted — the video-frame-sampling plumbing, with
    byte-chunking standing in for a real demuxer (none in this container).

    The Spark-side shape is exactly real: Arrow-batched mapInPandas, a
    row-multiplying output (doc_id, frame_idx, frame: binary), partition
    sizing by bytes. A real ffmpeg-style demuxer replaces only the chunking
    line. Deterministic, so the stats are oracle-checkable
    (plans/multimodal_q.py::frame_sample_stats).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": blobs})

    return multimodal.select("doc_id", "payload").mapInPandas(frames, FRAME_SCHEMA)


def resize_media(multimodal: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """DETERMINISTIC FAKE resize — not a real image decode (no codec in this
    container, and faking pixels silently would be worse than failing; see
    decode_media). What IS real: the Arrow batch flow, the fixed-size output
    contract (len(pixels) == width·height, u8), and the schema a real
    PIL/opencv kernel would produce. The fake maps the byte stream onto the
    target grid by nearest-neighbor index sampling, so outputs are stable
    across partitionings and testable.
    """
    import numpy as np

    n_px = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not b:
                    out.append(bytes(n_px))
                    continue
                idx = (np.arange(n_px) * len(b)) // n_px
                out.append(np.frombuffer(b, dtype=np.uint8)[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)
