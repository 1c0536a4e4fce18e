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
            # NULL payload (missing media) -> NULL features, matching the
            # oracle's md5(NULL) / strlen(NULL)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "content_md5": pdf["payload"].map(
                        lambda b: None
                        if b is None
                        else hashlib.md5(bytes(b)).hexdigest()
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
                if payload is None:  # missing media: no frames
                    continue
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


PHASH_SCHEMA = "doc_id bigint, phash bigint"


#: cached DCT-II basis per grid size (round-8: the basis was recomputed per
#: PAYLOAD, which together with the per-bit packing loop made phash the
#: slowest full-registry name at sf1 — 40.6 s for what is one batched matmul)
_DCT_BASIS: dict[int, "object"] = {}


def _dct_basis(grid: int):
    import numpy as np

    cm = _DCT_BASIS.get(grid)
    if cm is None:
        k = np.arange(grid)
        cm = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * grid))
        _DCT_BASIS[grid] = cm
    return cm


def _phash_batch(payloads, grid: int = 32):
    """Vectorized pHash of a sequence of byte payloads -> int64 ndarray.

    Per payload: deterministic-fake 'resize' of the byte stream onto a
    grid×grid u8 image (the resize_media sampling), then ONE batched 2-D
    DCT-II over the whole stack (cm @ imgs @ cm.T broadcast over the batch
    axis), low-frequency 8×8 block (DC dropped), median-threshold sign bits
    packed into 63 bits by a weighted sum — no per-image Python beyond the
    length-dependent resize indexing. Empty payloads hash to 0.
    """
    import numpy as np

    n, n_px = len(payloads), grid * grid
    nonempty = np.zeros(n, dtype=bool)
    ar = np.arange(n_px)
    cm = _dct_basis(grid)
    d = np.zeros((n, 8, 8), dtype=np.float64)
    # the DCT stays a per-image (grid,grid) GEMM pair ON PURPOSE: any other
    # GEMM shape (stacked reshape, 8-row basis slice, broadcast batched
    # matmul) changes BLAS summation order, and the median threshold below
    # amplifies eps-level reorderings into multi-bit hash flips — measured
    # 7/3000 changed hashes with the sliced-basis variant. The pre-round-8
    # cost was never the matmul: it was the per-image basis recompute and
    # the 63-step numpy-scalar packing loop, both hoisted/batched here.
    for i, p in enumerate(payloads):
        b = bytes(p)
        if b:
            img = np.frombuffer(b, dtype=np.uint8)[(ar * len(b)) // n_px]
            img = img.astype(np.float64).reshape(grid, grid)
            d[i] = (cm @ img @ cm.T)[:8, :8]
            nonempty[i] = True
    low = d.reshape(n, 64)[:, 1:]  # drop the DC coefficient
    med = np.median(low, axis=1, keepdims=True)
    bits = (low > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(62, -1, -1, dtype=np.uint64)
    h = (bits * weights).sum(axis=1, dtype=np.uint64)
    h[~nonempty] = np.uint64(0)
    return h.astype(np.int64)


def _phash_kernel(b: bytes, grid: int = 32) -> int:
    """Reference pHash of ONE payload — delegates to the batch kernel, so
    the pytest twin and the distributed path share one implementation and
    cannot drift."""
    return int(_phash_batch([b], grid)[0])


def perceptual_hash(multimodal: DataFrame, grid: int = 32) -> DataFrame:
    """Distributed perceptual fingerprint: (doc_id, phash) via Arrow-batched
    mapInPandas over the binary payload column. The codec-dependent step is
    the deterministic byte-grid fake (see resize_media); a real image
    decoder swaps in above the DCT without touching the Spark plumbing."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # missing media carries no fingerprint
            keep = pdf["payload"].notna()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"][keep],
                    "phash": _phash_batch(list(pdf["payload"][keep]), grid),
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(hashes, PHASH_SCHEMA)


def phash_neardup_pairs(
    multimodal: DataFrame,
    max_hamming: int = 6,
    grid: int = 32,
    band_bits: int = 4,
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs (hamming(phash) <= max_hamming)
    via band blocking, never all-pairs: the 63-bit hash splits into
    ceil(63/band_bits) bands, and by pigeonhole any pair with hamming
    distance < n_bands agrees on at least one whole band — so for
    max_hamming < n_bands the (band_idx, band_value) bucket join has EXACT
    recall, and the popcount(xor) verify step keeps only true near-pairs.
    Same LSH discipline as MinHash banding and SimHash prefix blocking —
    the shuffle moves (band, hash) pairs, verification is per-bucket.

    The band width is the recall/selectivity dial (multi-index Hamming
    search, Norouzi et al.): tight thresholds afford wide bands (small
    buckets); loose thresholds need narrow bands, whose coarser buckets
    admit more candidates — pick band_bits per threshold, the plan shape
    does not change.

    Duplicate-collapse (round-8 — this operator predated the r6 campaign):
    identical payloads hash identically and share every band, so a g-copy
    hash group multiplied every (band, val) bucket by g and the bucket
    self-join by g² — at 10× replication the join degenerated to ~2.5G
    rows (4-bit buckets hold corpus/16 docs each), which was the entire
    cost of the slowest full-registry sf1 name (the DCT was 3.9 s of ~60).
    Banding, the bucket join, and the popcount verify now run over DISTINCT
    hashes; expansion is exact because hamming depends only on the hash:
    a group with ≥2 members is a hamming-0 clique (and hamming 0 implies
    the SAME group, so clique and cross rows cannot overlap), and a
    verified rep pair's hamming holds for every member pair. Identity on
    all-distinct hashes.
    """
    n_bands = (63 + band_bits - 1) // band_bits
    if max_hamming >= n_bands:
        raise ValueError(
            f"exact recall needs max_hamming < n_bands ({n_bands}); "
            f"got {max_hamming} — narrow band_bits"
        )
    mask = (1 << band_bits) - 1
    h = perceptual_hash(multimodal, grid=grid)
    gh = h.groupBy("phash").agg(
        F.min("doc_id").alias("gid"), F.count(F.lit(1)).alias("gsz")
    )
    mem = h.join(gh, "phash").select("doc_id", "gid", "gsz")
    bands = gh.select(
        "gid",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), band_bits * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("gid", "phash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(
        F.col("band"), F.col("val"), F.col("gid").alias("g1"), F.col("phash").alias("ha")
    )
    b = bands.select(
        F.col("band"), F.col("val"), F.col("gid").alias("g2"), F.col("phash").alias("hb")
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    rep_pairs = (
        a.join(b, ["band", "val"])
        .filter(F.col("g1") < F.col("g2"))
        .select("g1", "g2", "ha", "hb")
        .distinct()
        .select("g1", "g2", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    cross = (
        rep_pairs.join(mem.select(F.col("gid").alias("g1"), F.col("doc_id").alias("da")), "g1")
        .join(mem.select(F.col("gid").alias("g2"), F.col("doc_id").alias("db")), "g2")
        .select(
            F.least("da", "db").alias("a"),
            F.greatest("da", "db").alias("b"),
            "hamming",
        )
    )
    dup = mem.filter(F.col("gsz") >= 2)
    clique = (
        dup.select("gid", F.col("doc_id").alias("a"))
        .join(dup.select("gid", F.col("doc_id").alias("b")), "gid")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.lit(0).cast("integer").alias("hamming"))
    )
    return cross.unionByName(clique).orderBy("a", "b")
