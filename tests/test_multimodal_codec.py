"""Real-codec multimodal tests: the pure-Python BMP codec
(functions/bmp.py) and the decode→resize→encode pipeline over Spark
(operators/multimodal.py resize_payload_real).

The codec-level tests are pure Python (no Spark) so format bugs fail
in milliseconds; the Spark test pins the end-to-end bytes by md5 —
something the SQL oracle can't express (it pins pixel statistics
instead, see plans/extensions.py mm_resize_real).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from tests.conftest import SF_SMALL
from whisky_wine_etl_spark.functions import bmp
from whisky_wine_etl_spark.operators import multimodal as mm
from whisky_wine_etl_spark.catalog import load_table


def test_roundtrip_exact_over_dimension_sweep():
    # widths 8..16 cover every stride-padding residue (3w % 4 ∈ {0,1,2,3})
    for d in range(20):
        w, h = 8 + d % 9, 8 + (d * 3) % 7
        px = bmp.synth_pixels(d, w, h)
        enc = bmp.encode_bmp(px)
        assert len(enc) == bmp.bmp_size(w, h)
        assert (bmp.decode_bmp(enc) == px).all()


def test_header_fields_follow_format():
    enc = bmp.encode_bmp(bmp.synth_pixels(3, 9, 5))  # w=9 → stride 28 (padded)
    assert enc[:2] == b"BM"
    file_size, = struct.unpack_from("<I", enc, 2)
    offset, = struct.unpack_from("<I", enc, 10)
    hsize, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", enc, 14)
    assert (file_size, offset) == (len(enc), 54)
    assert (hsize, w, h, planes, bpp, comp) == (40, 9, 5, 1, 24, 0)
    # bottom-up + BGR: first stored pixel is source (x=0, y=h-1), blue first
    px = bmp.synth_pixels(3, 9, 5)
    assert enc[54] == px[4, 0, 2] and enc[56] == px[4, 0, 0]
    assert bmp.row_stride(9) == 28  # 27 pixel bytes + 1 pad


def test_decode_rejects_malformed():
    good = bmp.encode_bmp(bmp.synth_pixels(1, 8, 8))
    with pytest.raises(ValueError):
        bmp.decode_bmp(b"PNG" + good[3:])
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:40])  # truncated header
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:-5])  # truncated pixel data


def test_resize_nearest_matches_index_arithmetic():
    px = bmp.synth_pixels(11, 13, 9)
    out = bmp.resize_nearest(px, 10, 10)
    for xt in range(10):
        for yt in range(10):
            assert (out[yt, xt] == px[(yt * 9) // 10, (xt * 13) // 10]).all()


def test_encoded_bytes_md5_pinned():
    # pins the exact file bytes: any format drift (padding, header
    # field, channel order) changes these digests
    enc = bmp.encode_bmp(bmp.synth_pixels(7, 15, 8))
    assert hashlib.md5(enc).hexdigest() == "9b9612a582420ea623cfa04d5dfce7ad"
    out = bmp.resize_nearest(bmp.decode_bmp(enc), 10, 10)
    assert hashlib.md5(bmp.encode_bmp(out)).hexdigest() == (
        "cdb652ff0a8c97af4e5bc72b5c012846"
    )


def test_spark_real_resize_pipeline(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    resized = mm.resize_payload_real(mm.synthesize_bmp_corpus(docs))
    rows = {r.doc_id: r for r in resized.collect()}
    assert len(rows) == 50
    for doc_id, r in rows.items():
        w, h = 8 + doc_id % 9, 8 + (doc_id * 3) % 7
        expect = bmp.resize_nearest(bmp.synth_pixels(doc_id, w, h), 10, 10)
        assert r.width == 10 and r.height == 10
        assert r.n_bytes == bmp.bmp_size(10, 10) == 374
        assert r.pixel_sum == int(expect.astype(np.int64).sum())
        assert bytes(r.payload) == bmp.encode_bmp(expect)


def test_ppm_roundtrip_header_and_rejects():
    from whisky_wine_etl_spark.functions import ppm

    for d in range(20):
        w, h = 8 + d % 9, 8 + (d * 3) % 7
        px = bmp.synth_pixels(d, w, h)
        enc = ppm.encode_ppm(px)
        assert len(enc) == ppm.ppm_size(w, h)
        assert (ppm.decode_ppm(enc) == px).all()
    # header: spec comments and arbitrary whitespace are accepted
    enc = ppm.encode_ppm(bmp.synth_pixels(3, 9, 5))
    body = enc[len(b"P6\n9 5\n255\n"):]
    commented = b"P6 # a comment\n  9\t5 # dims\n255\n" + body
    assert (ppm.decode_ppm(commented) == bmp.synth_pixels(3, 9, 5)).all()
    with pytest.raises(ValueError):
        ppm.decode_ppm(b"P5" + enc[2:])  # wrong magic (greyscale pgm)
    with pytest.raises(ValueError):
        ppm.decode_ppm(enc[:-5])  # truncated raster
    with pytest.raises(ValueError):
        ppm.decode_ppm(b"P6\n9 5\n65535\n" + body)  # 16-bit maxval


def test_spark_real_resize_dispatches_mixed_formats(spark):
    """One corpus, both codecs: resize_payload_real must sniff each
    payload's magic and re-encode in the SAME format — the PPM rows
    come back as P6 bytes, the BMP rows as BM bytes, pixel sums
    identical across formats for the same doc."""
    from whisky_wine_etl_spark.functions import ppm

    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    as_bmp = mm.synthesize_bmp_corpus(docs)
    as_ppm = mm.synthesize_ppm_corpus(docs)
    mixed = as_bmp.filter("doc_id % 2 = 0").unionByName(as_ppm.filter("doc_id % 2 = 1"))
    rows = {r.doc_id: r for r in mm.resize_payload_real(mixed).collect()}
    assert len(rows) == 20
    for doc_id, r in rows.items():
        w, h = 8 + doc_id % 9, 8 + (doc_id * 3) % 7
        expect = bmp.resize_nearest(bmp.synth_pixels(doc_id, w, h), 10, 10)
        assert r.pixel_sum == int(expect.astype(np.int64).sum())
        if doc_id % 2 == 0:
            assert bytes(r.payload)[:2] == b"BM" and r.n_bytes == bmp.bmp_size(10, 10)
        else:
            assert bytes(r.payload)[:2] == b"P6" and r.n_bytes == ppm.ppm_size(10, 10) == 313


def test_binary_file_source_roundtrips_bmp_corpus(spark, tmp_path):
    """Ingestion end-to-end: BMP payloads written as individual files,
    landed via the binaryFile source, decoded with the real codec —
    the full image-pipeline entry path (files → binary rows → decode).
    Non-BMP junk in the landing dir is excluded by the glob during
    listing, not post-read."""
    from whisky_wine_etl_spark.sources.io import read_binary_dir

    land = tmp_path / "landing"
    land.mkdir()
    expected = {}
    for d in (3, 7, 11):
        w, h = 8 + d % 9, 8 + (d * 3) % 7
        payload = bmp.encode_bmp(bmp.synth_pixels(d, w, h))
        (land / f"img_{d}.bmp").write_bytes(payload)
        expected[f"img_{d}.bmp"] = (len(payload), w, h)
    (land / "notes.txt").write_text("not an image")

    df = read_binary_dir(spark, str(land), glob="*.bmp")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 3  # txt filtered at listing time
    for r in rows:
        name = r.path.rsplit("/", 1)[-1]
        n_bytes, w, h = expected[name]
        assert r.length == n_bytes
        px = bmp.decode_bmp(bytes(r.content))
        assert px.shape == (h, w, 3)


def test_wav_roundtrip_bit_exact():
    import numpy as np

    from whisky_wine_etl_spark.functions import wav

    s = wav.synth_samples(7, 840)
    payload = wav.encode_wav(s, 12000)
    assert len(payload) == wav.CANONICAL_HEADER_BYTES + 2 * 840
    rate, back = wav.decode_wav(payload)
    assert rate == 12000
    assert np.array_equal(back, s)


def test_wav_decoder_walks_unknown_chunks():
    """Real WAVs carry LIST/INFO chunks between fmt and data; the
    decoder must length-skip them (including the odd-length pad byte)
    instead of assuming the canonical 44-byte layout."""
    import struct

    import numpy as np

    from whisky_wine_etl_spark.functions import wav

    s = wav.synth_samples(3, 100)
    canonical = wav.encode_wav(s, 8000)
    # splice a 5-byte (odd → padded) LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = canonical[:fmt_end] + foreign + canonical[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + b"WAVE" + spliced[12:]
    rate, back = wav.decode_wav(spliced)
    assert rate == 8000
    assert np.array_equal(back, s)


def test_wav_decoder_rejects_non_pcm():
    import struct

    import pytest

    from whisky_wine_etl_spark.functions import wav

    s = wav.synth_samples(1, 10)
    payload = bytearray(wav.encode_wav(s, 8000))
    payload[20:22] = struct.pack("<H", 3)  # format tag 3 = IEEE float
    with pytest.raises(NotImplementedError, match="only PCM"):
        wav.decode_wav(bytes(payload))
