"""Multimodal plumbing tests: binary columns + metadata + Arrow-batched
mapInPandas decode path (deterministic fake decoder — no image libs in
this container; the Spark-side schema/batching/partitioning is real)."""

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.pipeline.multimodal import (
    attach_media_meta,
    decode_images,
    fake_image_decoder,
    media_from_text,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = from_pandas(
        spark,
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["alpha", "beta", "gamma-long-doc"]}),
    )
    return media_from_text(docs)


def test_media_binary_column(media):
    schema = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert schema["media"] == "binary"
    out = media.collect()
    assert bytes(out[out.doc_id == 0]["media"].iloc[0]) == b"alpha"


def test_attach_media_meta(media):
    out = attach_media_meta(media).collect()
    r0 = out[out.doc_id == 0].iloc[0]["media_meta"]
    assert r0["n_bytes"] == 5
    import hashlib

    assert r0["sha256"] == hashlib.sha256(b"alpha").hexdigest()


def test_decode_images_mapinpandas(media):
    out = decode_images(media, feature_dim=16).collect()
    assert len(out) == 3
    assert set(out.columns) == {"doc_id", "width", "height", "features"}
    assert out["width"].tolist() == [8, 8, 8]
    feats = out.set_index("doc_id")["features"]
    assert all(len(f) == 16 for f in feats)
    # deterministic: same bytes -> same features as the local decoder
    px, w, h = fake_image_decoder(b"alpha")
    import numpy as np

    expected = (np.resize(px.astype("float32").ravel(), 16) / 255.0).tolist()
    assert feats.loc[0] == pytest.approx(expected)


def test_decode_repartitioned(media):
    """Partitioned path: decode still correct after repartition (the
    100 TB shape — fat media rows spread across executors)."""
    out = decode_images(media.repartition(3), feature_dim=8).collect()
    assert len(out) == 3


def test_video_frame_sampling(spark):
    """Frame sampling end-to-end through mapInPandas with the
    deterministic chunk decoder: a 1000-byte 'video' is 4 pseudo-frames
    of 256 bytes; every_n=2 keeps frames 0 and 2."""
    docs = from_pandas(
        spark,
        pd.DataFrame({"doc_id": [7], "text": ["x" * 1000]}),
    )
    vids = media_from_text(docs)
    out = sample_video_frames(vids, every_n=2).collect()
    assert out["frame_idx"].tolist() == [0, 2]
    assert [len(bytes(b)) for b in out["frame"]] == [256, 256]
    assert bytes(out["frame"].iloc[0]) == b"x" * 256


def test_video_frame_sampling_every_frame(media):
    """every_n=1 keeps all frames; short docs yield exactly one frame,
    and output schema matches the declared (id, frame_idx, frame)."""
    out = sample_video_frames(media, every_n=1).collect()
    assert set(out.columns) == {"doc_id", "frame_idx", "frame"}
    # 'alpha' (5 bytes) -> one 5-byte frame
    assert bytes(out[out.doc_id == 0]["frame"].iloc[0]) == b"alpha"
    assert (out["frame_idx"] == 0).all()


def test_video_decoder_pluggable(media):
    """A custom decoder (the real-av substitution point) drives the
    same plumbing."""

    def two_frames(data: bytes):
        yield 0, data
        yield 1, data[::-1]

    out = sample_video_frames(media, every_n=1, decoder=two_frames).collect()
    assert len(out) == 6
    r = out[(out.doc_id == 1) & (out.frame_idx == 1)]
    assert bytes(r["frame"].iloc[0]) == b"ateb"


def test_audio_features_raw_bytes(spark):
    """Raw-bytes path: uint8 samples, exact windowed integer sums."""
    from cuplyr_spark.pipeline.multimodal import extract_audio_features

    docs = from_pandas(spark, pd.DataFrame({"doc_id": [1], "text": ["abcABC xyz"]}))
    out = (
        extract_audio_features(media_from_text(docs), window=4)
        .collect()
        .sort_values("window_idx")
    )
    vals = [ord(c) for c in "abcABC xyz"]
    assert out["n_samples"].tolist() == [4, 4, 2]
    assert out["sum_amp"].tolist() == [
        sum(vals[0:4]), sum(vals[4:8]), sum(vals[8:10])
    ]
    assert out["sum_sq"].tolist() == [
        sum(v * v for v in vals[0:4]),
        sum(v * v for v in vals[4:8]),
        sum(v * v for v in vals[8:10]),
    ]


def test_audio_features_wav_decode(spark):
    """Real WAV decode (16-bit PCM, stdlib-written header): samples
    round-trip exactly through the RIFF parser."""
    import io
    import wave

    import numpy as np

    from cuplyr_spark.pipeline.multimodal import (
        extract_audio_features,
        pcm_audio_decoder,
    )

    samples = np.array([0, 1000, -1000, 32767, -32768, 7], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    wav_bytes = buf.getvalue()

    # decoder alone round-trips the samples
    assert pcm_audio_decoder(wav_bytes).tolist() == samples.astype(int).tolist()

    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes))], "doc_id long, media binary"
    )
    from cuplyr_spark.frame import Frame

    out = (
        extract_audio_features(Frame(df), window=4).collect().sort_values("window_idx")
    )
    s = samples.astype(int)
    assert out["n_samples"].tolist() == [4, 2]
    assert out["sum_amp"].tolist() == [int(s[:4].sum()), int(s[4:].sum())]
    assert out["sum_sq"].tolist() == [int((s[:4] ** 2).sum()), int((s[4:] ** 2).sum())]


def test_pcm_decoder_rejects_non_16bit_pcm():
    """The fmt chunk is parsed (r5): 8-bit PCM, IEEE-float, and
    extensible WAVs raise instead of silently misdecoding; a data
    chunk before fmt is malformed."""
    import struct

    import numpy as np
    import pytest

    from cuplyr_spark.pipeline.multimodal import pcm_audio_decoder

    def wav(fmt_tag, bits, payload, fmt_first=True):
        fmt_body = struct.pack(
            "<HHIIHH", fmt_tag, 1, 8000, 8000 * (bits // 8), bits // 8, bits
        )
        fmt_ck = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        data_ck = b"data" + struct.pack("<I", len(payload)) + payload
        body = (fmt_ck + data_ck) if fmt_first else (data_ck + fmt_ck)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    good = wav(1, 16, np.array([1, -2, 3], "<i2").tobytes())
    assert pcm_audio_decoder(good).tolist() == [1, -2, 3]

    for tag, bits in [(1, 8), (1, 24), (3, 32), (0xFFFE, 16)]:
        with pytest.raises(ValueError, match="16-bit integer PCM only"):
            pcm_audio_decoder(wav(tag, bits, b"\x00" * 16))

    with pytest.raises(ValueError, match="malformed WAV"):
        pcm_audio_decoder(wav(1, 16, b"\x00" * 16, fmt_first=False))

    # non-WAV bytes keep the deterministic u8 fixture path
    assert pcm_audio_decoder(b"\x01\x02").tolist() == [1, 2]
