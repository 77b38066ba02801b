"""Multimodal columns (SURVEY.md §2.12): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas iterators (``mapInPandas``).

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. The actual media *decode* is stubbed: the
container has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is
injected (tests use the fake). Swapping in Pillow/torchaudio is a
one-function change; the distributed plan is identical.

Scale notes:
- media bytes stay in executor memory one Arrow batch at a time —
  never collected, never shuffled unless explicitly repartitioned;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch RAM for
  fat rows (set it low for video blobs);
- feature extraction is map-only; only the (small) feature vectors and
  metadata flow into downstream joins/aggregations.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata schema for a media column (width/height for images,
# duration/sample-rate for audio — nullable union, one struct).
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Cheap, decode-free metadata: byte length + md5 checksum, computed
    JVM-side (no Python). This is the 100 TB triage pass — dedup and
    size-filter on checksums *before* any expensive decode."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(None).cast("string").alias("media_type"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(binary_col)).alias("checksum"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_image(data: bytes) -> dict:
    """Image decoder. Netpbm binary formats (P5 grayscale / P6 RGB) are
    decoded natively — pure header parse, no libraries. Anything else
    (JPEG/PNG/...) needs an imaging library this container doesn't
    ship: replace or wrap with e.g. Pillow (``img = PIL.Image.open(
    io.BytesIO(data)); return {"width": img.width, ...}``) via
    ``extract_media_features(decoder=...)``.
    """
    if data[:2] in (b"P5", b"P6"):
        return _decode_netpbm(data)
    raise NotImplementedError(
        "only netpbm (P5/P6) decodes natively; other formats require an "
        "imaging library not present in this environment — inject a "
        "decoder via extract_media_features(decoder=...)"
    )


def _decode_netpbm(data: bytes) -> dict:
    """Parse a binary netpbm header: magic, then width/height/maxval
    tokens separated by whitespace, '#' comments allowed."""
    magic = data[:2].decode("ascii")
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
    if len(tokens) < 3:
        raise ValueError("truncated netpbm header")
    width, height, maxval = tokens
    channels = 3 if magic == "P6" else 1
    expected = width * height * channels * (2 if maxval > 255 else 1)
    if len(data) - pos - 1 < expected:
        raise ValueError("truncated netpbm pixel data")
    return {
        "media_type": f"image/x-portable-{'pixmap' if magic == 'P6' else 'graymap'}",
        "width": width,
        "height": height,
        "duration_ms": None,
        # private keys for pixel-level consumers (resize_images);
        # metadata consumers ignore them
        "_magic": magic,
        "_pixel_offset": pos + 1,
        "_channels": channels,
        "_maxval": maxval,
    }


def fake_decoder(data: bytes) -> dict:
    """Deterministic fake decoder for tests/local runs: derives pseudo
    dimensions from the byte content (stable across runs/partitionings)."""
    h = sum(data[:16]) if data else 0
    return {
        "media_type": "image/fake",
        "width": 64 + (h % 64),
        "height": 64 + ((h // 64) % 64),
        "duration_ms": None,
    }


def extract_media_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] = decode_image,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + featurize media blobs via mapInPandas.

    Output: (id, media_meta struct, feature array<float>). The feature
    here is a deterministic byte-histogram projection — a stand-in with
    the exact shape a CNN/audio embedding would have.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("media_meta", MEDIA_META),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            metas, feats = [], []
            for data in pdf[binary_col]:
                raw = bytes(data) if data is not None else b""
                dec = decoder(raw)
                metas.append(
                    {
                        "media_type": dec.get("media_type"),
                        "n_bytes": len(raw),
                        "checksum": hashlib.md5(raw).hexdigest(),
                        "width": dec.get("width"),
                        "height": dec.get("height"),
                        "duration_ms": dec.get("duration_ms"),
                    }
                )
                # byte-histogram projection -> fixed-dim float vector
                hist = [0.0] * feature_dim
                for b in raw:
                    hist[b % feature_dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame(
                {id_col: pdf[id_col], "media_meta": metas, "feature": feats}
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_frames: int = 4,
    frame_bytes: int = 32,
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame (id, frame_idx,
    frame binary). With a real video decoder the chunking becomes
    keyframe extraction; the explode shape and downstream schema are
    identical. Pure JVM-side byte slicing here — no Python."""
    n = F.length(F.col(binary_col))
    stride = F.greatest((n / n_frames).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.substring(F.col(binary_col), (i * stride + 1).cast("int"), frame_bytes).alias(
                "frame"
            ),
        ),
    )
    return (
        df.select(id_col, F.explode(frames).alias("f"))
        .select(id_col, F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
        .where(F.length("frame") > 0)
    )


def resize_images(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
    pixel_decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Nearest-neighbor image resize via ``mapInPandas`` — the standard
    normalize-resolution step before visual feature extraction.

    Netpbm (P5/P6, 8-bit) resizes NATIVELY (numpy index-gather on the
    decoded pixel array, re-encoded as netpbm) — a real end-to-end
    resize with zero imaging libraries. Other formats go through
    ``pixel_decoder`` (must return {"magic": "P5"|"P6", "pixels":
    HxWxC uint8 ndarray}); without one they raise ``NotImplementedError``
    — same injectable-decoder policy as ``extract_media_features``.

    Output: (id, resized binary, width, height, media_type). Scale
    shape: map-only, one Arrow batch of blobs in executor memory at a
    time; resized bytes are strictly smaller than inputs for any
    downscale, so the operator only shrinks what flows downstream.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("resized", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("media_type", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def decode_pixels(raw: bytes) -> tuple[str, "np.ndarray"]:
            if raw[:2] in (b"P5", b"P6"):
                meta = _decode_netpbm(raw)
                if meta["_maxval"] > 255:
                    raise NotImplementedError("16-bit netpbm not supported")
                w, h, ch = meta["width"], meta["height"], meta["_channels"]
                arr = np.frombuffer(
                    raw, dtype=np.uint8, count=w * h * ch, offset=meta["_pixel_offset"]
                ).reshape(h, w, ch)
                return meta["_magic"], arr
            if pixel_decoder is not None:
                dec = pixel_decoder(raw)
                return dec["magic"], dec["pixels"]
            raise NotImplementedError(
                "only netpbm (P5/P6) resizes natively; inject pixel_decoder "
                "for other formats (e.g. Pillow -> np.asarray(img))"
            )

        for pdf in batches:
            ids, blobs, mts = [], [], []
            for rid, data in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(data) if data is not None else b""
                magic, arr = decode_pixels(raw)
                src_h, src_w = arr.shape[0], arr.shape[1]
                # nearest-neighbor index gather (deterministic, pure numpy)
                rows = (np.arange(height) * src_h) // height
                cols = (np.arange(width) * src_w) // width
                out = np.ascontiguousarray(arr[rows][:, cols])
                header = f"{magic}\n{width} {height}\n255\n".encode("ascii")
                ids.append(rid)
                blobs.append(header + out.tobytes())
                mts.append(
                    f"image/x-portable-{'pixmap' if magic == 'P6' else 'graymap'}"
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": blobs,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "media_type": mts,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def decode_audio(data: bytes) -> dict:
    """Audio decoder: WAV (RIFF/PCM) headers parse natively — pure
    struct reads, no libraries — yielding real sample-rate/channel/
    duration metadata. Compressed formats (MP3/FLAC/OGG) need an audio
    library: inject via ``extract_media_features(decoder=...)``, same
    seam as images.
    """
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _decode_wav(data)
    raise NotImplementedError(
        "only WAV (RIFF/PCM) decodes natively; compressed audio requires "
        "a library not present in this environment — inject a decoder via "
        "extract_media_features(decoder=...)"
    )


def _decode_wav(data: bytes) -> dict:
    """Walk RIFF chunks for fmt (sample rate, channels, bits) and data
    (payload size); duration_ms = data bytes / byte rate."""
    import struct

    pos, n = 12, len(data)
    fmt, data_size = None, None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt " and body + 16 <= n:
            fmt = struct.unpack_from("<HHIIHH", data, body)
        elif cid == b"data":
            data_size = size
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    _audio_fmt, channels, sample_rate, byte_rate, _block, bits = fmt
    duration_ms = int(data_size * 1000 // byte_rate) if byte_rate else None
    return {
        "media_type": "audio/wav",
        "width": None,
        "height": None,
        "duration_ms": duration_ms,
        "_channels": channels,
        "_sample_rate": sample_rate,
        "_bits_per_sample": bits,
        "_data_bytes": data_size,
    }


def image_dhash(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    pixel_decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: grayscale, resize
    to 9x8 (nearest-neighbor index gather, same arithmetic as
    ``resize_images``), emit one bit per horizontally adjacent pixel
    pair (left > right), packed into a 64-bit long. Output (id, dhash).

    The visual twin of the text fingerprints: byte-level checksums
    (``attach_media_metadata``) only catch EXACT blob dupes -- the same
    picture re-encoded, resized, or brightness-shifted hashes to a
    nearby dhash instead (gradient signs survive monotone transforms).
    Netpbm decodes natively; other formats via ``pixel_decoder``
    (injectable-decoder policy as everywhere in this module). Map-only,
    Arrow-batched; only (id, 8-byte hash) flows downstream.
    """
    import numpy as np

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("dhash", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_pixels(raw: bytes) -> "np.ndarray":
            if raw[:2] in (b"P5", b"P6"):
                meta = _decode_netpbm(raw)
                if meta["_maxval"] > 255:
                    raise NotImplementedError("16-bit netpbm not supported")
                w, h, ch = meta["width"], meta["height"], meta["_channels"]
                return np.frombuffer(
                    raw, dtype=np.uint8, count=w * h * ch, offset=meta["_pixel_offset"]
                ).reshape(h, w, ch)
            if pixel_decoder is not None:
                return pixel_decoder(raw)["pixels"]
            raise NotImplementedError(
                "only netpbm (P5/P6) decodes natively; inject pixel_decoder"
            )

        for pdf in batches:
            ids, hashes = [], []
            for rid, data in zip(pdf[id_col], pdf[binary_col]):
                # Triage-first (like attach_media_metadata): a NULL or
                # undecodable blob yields a NULL hash instead of failing
                # the whole stage — one bad row must not kill a corpus-
                # scale job. Downstream near-dup joins drop NULL hashes.
                try:
                    arr = decode_pixels(bytes(data) if data is not None else b"")
                except (NotImplementedError, ValueError, IndexError, TypeError):
                    ids.append(rid)
                    hashes.append(None)
                    continue
                gray = arr.astype(np.uint32).sum(axis=2) // arr.shape[2]
                src_h, src_w = gray.shape
                rows = (np.arange(8) * src_h) // 8
                cols = (np.arange(9) * src_w) // 9
                g = gray[rows][:, cols]
                bits = (g[:, :-1] > g[:, 1:]).flatten()  # 8x8 sign bits
                val = 0
                for i, b in enumerate(bits):
                    if b:
                        val |= 1 << i
                # two's-complement into a signed long
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(rid)
                hashes.append(val)
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def dhash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup image pairs by dHash Hamming distance <= ``max_hamming``
    -- the visual analog of ``dedup.simhash_neardup_pairs``, same
    pigeonhole banding: split the 64-bit hash into ``max_hamming + 1``
    chunks; any pair within the distance budget must agree on at least
    one whole chunk, so candidates come from (chunk_idx, chunk_value)
    equi-joins -- never an all-pairs comparison -- and are verified
    with one JVM ``bit_count(xor)``. Output (id_a, id_b, hamming).
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftrightunsigned(F.col(hash_col), c * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )
    exploded = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"),
        F.explode(chunks).alias("_c")
    ).select("_id", "_h", "_c.chunk_idx", "_c.chunk_val")

    a = exploded.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "chunk_idx", "chunk_val"
    )
    b = exploded.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "chunk_idx", "chunk_val"
    )
    cand = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def audio_dhash(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_segments: int = 65,
) -> DataFrame:
    """Perceptual audio fingerprint (energy-profile dHash) per WAV
    blob: mono-mix the PCM samples, split into ``n_segments`` equal
    time segments, take each segment's mean absolute amplitude, and
    emit one bit per adjacent-segment comparison (rising energy = 1) --
    64 bits for the default 65 segments, packed into a long. Output
    (id, ahash).

    Like image dHash, the SIGN of adjacent comparisons survives any
    positive volume scaling, so the same recording at different gains
    fingerprints identically, while byte checksums only catch
    bit-exact blobs. WAV (RIFF/PCM 16-bit) decodes natively -- struct
    walk + numpy frombuffer, no audio libraries. Pair with
    ``dhash_neardup_pairs(hashes, hash_col="ahash")`` for banded
    Hamming near-dup -- the operator is hash-agnostic.
    """
    import struct

    import numpy as np

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("ahash", T.LongType())]
    )

    def fingerprint(raw: bytes) -> int:
        meta = _decode_wav(raw)
        if meta["_bits_per_sample"] != 16:
            raise NotImplementedError("only 16-bit PCM WAV fingerprints natively")
        # find the data chunk payload offset (second walk, same rules)
        pos, n = 12, len(raw)
        off = size = None
        while pos + 8 <= n:
            cid = raw[pos : pos + 4]
            (csize,) = struct.unpack_from("<I", raw, pos + 4)
            if cid == b"data":
                off, size = pos + 8, csize
                break
            pos = pos + 8 + csize + (csize & 1)
        samples = np.frombuffer(raw, dtype="<i2", count=(size or 0) // 2, offset=off or 0)
        ch = meta["_channels"]
        if ch > 1:
            samples = samples[: len(samples) // ch * ch].reshape(-1, ch).mean(axis=1)
        if len(samples) < n_segments:  # degenerate: pad with zeros
            samples = np.pad(samples.astype(np.float64), (0, n_segments - len(samples)))
        bounds = (np.arange(n_segments + 1) * len(samples)) // n_segments
        energy = np.array(
            [np.abs(samples[bounds[i] : bounds[i + 1]]).mean() for i in range(n_segments)]
        )
        val = 0
        for i in range(n_segments - 1):
            if energy[i + 1] > energy[i]:
                val |= 1 << i
        if val >= 1 << 63:
            val -= 1 << 64
        return val

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def safe(b) -> int | None:
            # Triage-first: NULL/undecodable audio → NULL hash, never a
            # stage failure (one bad blob must not kill a corpus job).
            try:
                return fingerprint(bytes(b) if b is not None else b"")
            except (NotImplementedError, ValueError, IndexError, TypeError, struct.error):
                return None

        for pdf in batches:
            ids = list(pdf[id_col])
            hashes = [safe(b) for b in pdf[binary_col]]
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)
