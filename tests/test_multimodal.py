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


def test_video_stub_raises_clearly(media):
    with pytest.raises(Exception) as ei:
        sample_video_frames(media).collect()
    assert "ffmpeg" in str(ei.value) or "NotImplementedError" in str(ei.value)
