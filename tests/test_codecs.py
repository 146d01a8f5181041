"""Real PNG/WAV codecs (stdlib zlib/struct) and the Spark decode path."""

import numpy as np
import pytest

from demeter_spark.functions import codecs
from tests.conftest import SF_DIR


@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (12, 9, 3), (6, 11, 4), (5, 5, 2), (16, 16, 3)]
)
def test_png_roundtrip_all_filters(shape):
    """The encoder cycles all five filter types per row; >=5-row images
    exercise every unfilter path against the independently-written forward
    filter."""
    rng = np.random.RandomState(hash(shape) % 2**31)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    back = codecs.png_decode(codecs.png_encode(img))
    want = img if img.ndim == 3 else img[:, :, None]
    assert back.shape == want.shape
    assert (back == want).all()


def test_png_rejects_corruption():
    data = bytearray(codecs.png_encode(np.ones((4, 4), np.uint8)))
    with pytest.raises(ValueError, match="CRC"):
        flipped = bytearray(data)
        flipped[20] ^= 0xFF
        codecs.png_decode(bytes(flipped))
    with pytest.raises(ValueError, match="signature"):
        codecs.png_decode(b"JFIF" + bytes(data))
    with pytest.raises(ValueError, match="truncated"):
        codecs.png_decode(bytes(data[:-6]))


def test_wav_roundtrip_and_corruption():
    s = (np.arange(1000) % 7 * 100 - 300).astype(np.int16)
    rate, ch, back = codecs.wav_decode(codecs.wav_encode(s, 44100))
    assert rate == 44100 and ch == 1 and (back == s).all()
    with pytest.raises(ValueError, match="RIFF"):
        codecs.wav_decode(b"OggS" + b"\x00" * 40)


def test_resize_nearest_through_png():
    """Decode -> resize -> re-encode -> decode must equal the direct
    resize: the pixel half of resize planning is real."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(12, 16, 3), dtype=np.uint8)
    direct = codecs.resize_nearest(img, 6, 8)
    via_png = codecs.png_decode(
        codecs.png_encode(codecs.resize_nearest(codecs.png_decode(codecs.png_encode(img)), 6, 8))
    )
    assert (via_png == direct).all()
    assert direct.shape == (6, 8, 3)


def test_real_media_decode_matches_oracle(spark, ddb):
    """Pre-check the driver gate row: Spark decodes REAL PNG/WAV bitstreams;
    DuckDB derives the same features closed-form from the generator params."""
    import __spark_entry__ as entry

    key = lambda t: tuple((v is None, str(v)) for v in t)
    s = sorted(
        [tuple(r) for r in entry.queries()["media_real_decode"](spark, SF_DIR).collect()],
        key=key,
    )
    d = sorted(ddb.sql(entry.oracle_sql()["media_real_decode"]).fetchall(), key=key)
    assert len(s) == len(d) == 500
    for a, b in zip(s, d):
        for va, vb in zip(a, b):
            assert (va is None) == (vb is None)
            if va is not None:
                assert str(va) == str(vb) or float(va) == float(vb), (a, b)


def test_decode_real_rejects_unknown_codec(spark):
    from demeter_spark.sources import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0 fake jpeg"))], "doc_id BIGINT, payload BINARY"
    )
    with pytest.raises(Exception, match="NotImplementedError|external libraries"):
        multimodal.decode_real(df).collect()
