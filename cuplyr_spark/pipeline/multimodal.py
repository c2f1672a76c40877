"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed through Arrow-batched ``mapInPandas``.

Design (the part that matters at 100 TB):

- media is a ``binary`` column plus a metadata struct — bytes never
  leave the executors, never hit the driver;
- decode/resize/feature-extract run per PARTITION via ``mapInPandas``
  (Arrow batch in, Arrow batch out) — the sanctioned slow path when
  JVM expressions can't express the op;
- partitioning: media rows are usually fat, so operators expose a
  ``target_rows_per_batch`` and callers should repartition to keep a
  batch of decoded frames within executor memory.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container:
decoders are pluggable, and the default is a clearly-marked
deterministic fake so the Spark plumbing (schemas, batching, UDF
signatures) is real and tested. Swap ``decoder=`` for a real one in
production; the plan shape does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuplyr_spark.frame import Frame

# media metadata struct carried alongside the raw bytes
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_media_meta(frame: Frame, bytes_col: str = "media") -> Frame:
    """Populate the metadata struct from the bytes column. Hash and
    length are JVM-side; width/height need a decoder (NULL here,
    filled by decode_images)."""
    b = F.col(bytes_col)
    meta = F.struct(
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
    )
    return Frame(frame.df.withColumn("media_meta", meta), frame.group_vars())


# -- decoders -----------------------------------------------------------


def fake_image_decoder(data: bytes) -> tuple[np.ndarray, int, int]:
    """STUB decoder (no image libs in this container): deterministic
    8x8 grayscale 'image' derived from the sha256 of the bytes. Real
    deployments pass a PIL/torchvision decoder with the same
    signature: bytes -> (pixels ndarray, width, height)."""
    digest = hashlib.sha256(data).digest()
    px = np.frombuffer((digest * 2)[:64], dtype=np.uint8).reshape(8, 8)
    return px, 8, 8


def _pil_decoder(data: bytes):  # pragma: no cover - lib not in container
    from io import BytesIO

    from PIL import Image  # noqa: F401

    img = Image.open(BytesIO(data))
    arr = np.asarray(img.convert("L"))
    return arr, img.width, img.height


def get_image_decoder() -> Callable:
    """Real decoder when PIL is importable, deterministic fake
    otherwise (clearly marked — see fake_image_decoder)."""
    try:
        import PIL  # noqa: F401

        return _pil_decoder
    except ImportError:
        return fake_image_decoder


def decode_images(
    frame: Frame,
    bytes_col: str = "media",
    id_col: str = "doc_id",
    decoder: Callable | None = None,
    feature_dim: int = 16,
) -> Frame:
    """Decode + feature-extract through mapInPandas.

    Output schema: (id, width, height, features array<float>). The
    iterator-of-batches form keeps memory at one Arrow batch of
    decoded pixels, not one partition."""
    decoder = decoder or get_image_decoder()
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, feats = [], [], [], []
            for _id, data in zip(pdf[id_col], pdf[bytes_col]):
                px, w, h = decoder(bytes(data))
                ids.append(_id)
                widths.append(w)
                heights.append(h)
                # pooled-intensity features: deterministic, shape-stable
                flat = px.astype(np.float32).ravel()
                pooled = np.resize(flat, feature_dim) / 255.0
                feats.append(pooled.tolist())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    return Frame(
        frame.df.select(id_col, bytes_col).mapInPandas(process, out_schema), ()
    )


def fake_video_decoder(data: bytes) -> Iterator[tuple[int, bytes]]:
    """STUB video decoder (no ffmpeg/av in this container): treats the
    byte stream as fixed-size 256-byte pseudo-frames — deterministic,
    so frame counts and sampling are testable. Real deployments pass
    an av-backed decoder with the same signature:
    bytes -> iterator of (frame_index, encoded_frame_bytes)."""
    frame_size = 256
    for i in range(0, max(len(data), 1), frame_size):
        yield i // frame_size, data[i : i + frame_size]


def _av_decoder(data: bytes) -> Iterator[tuple[int, bytes]]:  # pragma: no cover - lib not in container
    from io import BytesIO

    import av

    with av.open(BytesIO(data)) as container:
        for idx, frm in enumerate(container.decode(video=0)):
            yield idx, frm.to_image().tobytes()


def get_video_decoder() -> Callable:
    """av-backed decoder when importable, deterministic fake otherwise
    (clearly marked — see fake_video_decoder)."""
    try:
        import av  # noqa: F401

        return _av_decoder
    except ImportError:
        return fake_video_decoder


def sample_video_frames(
    frame: Frame,
    bytes_col: str = "media",
    id_col: str = "doc_id",
    every_n: int = 30,
    decoder: Callable | None = None,
) -> Frame:
    """Sample every ``every_n``-th frame from a binary video column
    through mapInPandas (Arrow batch in/out, bytes never reach the
    driver). Output: (id, frame_idx, frame bytes) — one row per kept
    frame; downstream ops (decode_images, dedup on frame hash) chain
    on the exploded grain.

    The decoder is pluggable (same pattern as decode_images): an
    av/ffmpeg decoder when the lib is present, a deterministic
    fixed-size-chunk fake otherwise so the partitioning/batching/
    schema plumbing is real and tested in this container."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    decoder = decoder or get_video_decoder()
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _id, data in zip(pdf[id_col], pdf[bytes_col]):
                for idx, frm in decoder(bytes(data)):
                    if idx % every_n:
                        continue
                    ids.append(_id)
                    idxs.append(idx)
                    frames.append(frm)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return Frame(
        frame.df.select(id_col, bytes_col).mapInPandas(process, out_schema), ()
    )


def pcm_audio_decoder(data: bytes) -> np.ndarray:
    """Dependency-free audio decoder: 16-bit integer PCM WAV when the
    RIFF/WAVE header is present (real — the format is a fixed header +
    raw samples, no codec needed), otherwise the bytes themselves as
    unsigned 8-bit samples (the deterministic fixture path). Real
    deployments swap in a soundfile/ffmpeg decoder with the same
    signature: bytes -> 1-D integer sample array.

    The fmt chunk IS inspected (ADVICE r4): a WAV whose audio format
    isn't integer PCM (tag 1) with 16 bits per sample raises instead
    of silently misdecoding 8/24-bit or IEEE-float payloads into
    garbage samples. Multi-channel 16-bit PCM decodes with channels
    interleaved (documented)."""
    if len(data) >= 44 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        # walk chunks: validate 'fmt ' before decoding 'data'
        off = 12
        fmt_tag = bits = None
        while off + 8 <= len(data):
            cid = data[off : off + 4]
            size = int.from_bytes(data[off + 4 : off + 8], "little")
            if cid == b"fmt " and size >= 16:
                body = data[off + 8 : off + 8 + size]
                fmt_tag = int.from_bytes(body[0:2], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                if fmt_tag is None:
                    raise ValueError(
                        "malformed WAV: 'data' chunk before any 'fmt ' chunk"
                    )
                # 0xFFFE = WAVE_FORMAT_EXTENSIBLE; its SubFormat can
                # still be PCM but decoding it needs the 24-byte
                # extension — out of scope for the dependency-free path.
                if fmt_tag != 1 or bits != 16:
                    raise ValueError(
                        f"pcm_audio_decoder handles 16-bit integer PCM only; "
                        f"this WAV has format tag {fmt_tag} with {bits} bits "
                        "per sample — plug in a soundfile/ffmpeg decoder via "
                        "the decoder= parameter"
                    )
                payload = data[off + 8 : off + 8 + size]
                return np.frombuffer(
                    payload[: len(payload) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
            off += 8 + size + (size & 1)
    return np.frombuffer(data, dtype=np.uint8).astype(np.int64)


def extract_audio_features(
    frame: Frame,
    bytes_col: str = "media",
    id_col: str = "doc_id",
    window: int = 256,
    decoder: Callable | None = None,
) -> Frame:
    """Windowed audio features over a binary audio column through
    mapInPandas: one row per ``window``-sample frame with the exact
    integer sums (count, sum of amplitudes, sum of squares) from which
    RMS energy / mean amplitude derive downstream.

    Sums are emitted instead of floats so results are bit-exact and
    engine-independent (the DuckDB oracle reproduces them); divide at
    the consumer (``sqrt(sum_sq/n)`` = RMS). Bytes stay on the
    executors; each Arrow batch decodes independently."""
    if window < 1:
        raise ValueError("window must be >= 1")
    decoder = decoder or pcm_audio_decoder
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sum_amp", T.LongType()),
            T.StructField("sum_sq", T.LongType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, sums, sqs = [], [], [], [], []
            for _id, data in zip(pdf[id_col], pdf[bytes_col]):
                samples = decoder(bytes(data))
                for w in range(0, len(samples), window):
                    chunk = samples[w : w + window]
                    ids.append(_id)
                    idxs.append(w // window)
                    ns.append(len(chunk))
                    sums.append(int(chunk.sum()))
                    sqs.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "window_idx": idxs,
                    "n_samples": ns,
                    "sum_amp": sums,
                    "sum_sq": sqs,
                }
            )

    return Frame(
        frame.df.select(id_col, bytes_col).mapInPandas(process, out_schema), ()
    )


def media_from_text(frame: Frame, text_col: str = "text", id_col: str = "doc_id") -> Frame:
    """Test-fixture helper: synthesize a binary media column from text
    (utf-8 bytes) so the multimodal plumbing is exercisable with the
    driver's documents table."""
    return Frame(
        frame.df.select(
            F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("media")
        ),
        (),
    )
