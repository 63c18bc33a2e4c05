"""REAL media decode (VERDICT r10 #2): the pure-stdlib PNG/BMP/WAV codecs
in functions/codecs.py and the Spark lane that drives actual container
bytes through them.

The registry oracle for multimodal_decode_real is a closed-form mirror of
the deterministic content, so a matched encoder+decoder bug pair would
cancel there.  This file closes that hole from the decode side:

- the Paeth predictor is pinned against hand-worked RFC 2083 cases;
- a PNG byte stream is HAND-BUILT here (raw struct/zlib, literal filter
  bytes, no call into png_encode) and must decode to literal pixels;
- corrupted streams (bad CRC, bad filter byte, interlace flag) fail loudly.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from airstrik_py_spark.functions import codecs


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def test_paeth_spec_vectors():
    # RFC 2083 §6.6 worked by hand: p = a+b-c, nearest of (a, b, c) with
    # ties broken a, then b.
    assert codecs._paeth(0, 0, 0) == 0
    assert codecs._paeth(10, 0, 0) == 10     # p=10 -> pa=0
    assert codecs._paeth(0, 10, 0) == 10     # p=10 -> pb=0
    assert codecs._paeth(10, 20, 10) == 20   # p=20 -> pb=0
    assert codecs._paeth(100, 50, 75) == 75  # p=75: pa=25,pb=25,pc=0 -> c
    assert codecs._paeth(50, 100, 75) == 75  # symmetric: pc=0 -> c
    assert codecs._paeth(20, 20, 10) == 20   # p=30: pa=pb=10 < pc=20 -> a
    assert codecs._paeth(10, 30, 40) == 10   # p=0: pa=10,pb=30,pc=40 -> a
    assert codecs._paeth(10, 30, 5) == 30    # p=35: pa=25,pb=5,pc=30 -> b


def test_png_decode_handbuilt_stream():
    """A 2x2 RGB PNG assembled byte-by-byte WITHOUT png_encode: row 0 uses
    filter 1 (Sub), row 1 uses filter 2 (Up).  Filtered bytes were worked
    out by hand from the target pixels."""
    # target pixels, row-major RGB:
    # (10,20,30) (13,24,35)   /   (12,23,34) (16,28,40)
    target = bytes([10, 20, 30, 13, 24, 35, 12, 23, 34, 16, 28, 40])
    # row 0, Sub: first pixel raw, second = cur - left = (3,4,5)
    row0 = bytes([1, 10, 20, 30, 3, 4, 5])
    # row 1, Up: cur - above = (2,3,4, 3,4,5)
    row1 = bytes([2, 2, 3, 4, 3, 4, 5])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row0 + row1))
        + _chunk(b"IEND", b"")
    )
    assert codecs.png_decode(data) == (2, 2, 3, target)


def test_png_roundtrip_all_filters_all_colortypes():
    for ch in (1, 2, 3, 4):
        w, h = 7, 11
        px = bytes(((y * w + x) * ch + c) * 13 % 256
                   for y in range(h) for x in range(w) for c in range(ch))
        enc = codecs.png_encode(w, h, ch, px, filter_per_row=lambda y: y % 5)
        assert codecs.png_decode(enc) == (w, h, ch, px)


def test_png_rejects_corruption():
    good = codecs.png_encode(3, 3, 3, bytes(range(27)))
    # flip one IDAT payload byte -> CRC mismatch
    idat_at = good.index(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        codecs.png_decode(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        codecs.png_decode(b"\x00" * 16)
    # interlace flag set
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    stream = (codecs.PNG_SIG + _chunk(b"IHDR", ihdr)
              + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
              + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        codecs.png_decode(stream)
    # bad filter byte (9) on the only row
    stream = (codecs.PNG_SIG
              + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
              + _chunk(b"IDAT", zlib.compress(b"\x09\x01\x02\x03"))
              + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="filter type"):
        codecs.png_decode(stream)


def test_bmp_roundtrip_odd_width_padding():
    # width 3 -> 9-byte rows padded to 12; bottom-up flip must restore order
    w, h = 3, 2
    px = bytes((i * 17) % 256 for i in range(w * h * 3))
    assert codecs.bmp_decode(codecs.bmp_encode(w, h, px)) == (w, h, 3, px)


def test_wav_skips_unknown_chunks_and_odd_padding():
    samples = [100, -200, 32767, -32768, 0]
    base = codecs.wav_encode(8000, 1, samples)
    # splice an odd-length junk chunk between fmt and data (RIFF pads to even)
    fmt_end = base.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = base[:fmt_end] + junk + base[fmt_end:]
    spliced = (spliced[:4]
               + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    assert codecs.wav_decode(spliced) == (8000, 1, 5, samples)
    with pytest.raises(ValueError, match="RIFF"):
        codecs.wav_decode(b"JUNKJUNKJUNKJUNK")


def test_sniff_media():
    assert codecs.sniff_media(codecs.png_encode(1, 1, 3, b"\x01\x02\x03")) == "png"
    assert codecs.sniff_media(codecs.bmp_encode(1, 1, b"\x01\x02\x03")) == "bmp"
    assert codecs.sniff_media(codecs.wav_encode(8000, 1, [0])) == "wav"
    assert codecs.sniff_media(b"\x00" * 20) == "unknown"


def test_real_lane_end_to_end(spark):
    """attach_real_media -> extract_features_real over real rows: features
    must equal a straight Python recomputation of the content formula, and
    the payloads must be genuine containers (sniffable, decodable here in
    the test process too)."""
    from airstrik_py_spark.operators.multimodal import (
        attach_real_media,
        extract_features_real,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(12)], "doc_id long, text string"
    )
    media = attach_real_media(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    # payloads are real containers: PNG/BMP alternate on even ids
    for d, r in rows.items():
        expected_kind = ("png" if d % 4 == 0 else "bmp") if d % 2 == 0 else "wav"
        assert codecs.sniff_media(bytes(r["payload"])) == expected_kind
    feats = {r["doc_id"]: r for r in extract_features_real(media).collect()}
    for d in range(12):
        r = feats[d]
        if d % 2 == 0:
            w, h = 1 + d % 8, 1 + (d // 2) % 6
            vals = [(d * 31 + j * 7) % 256 for j in range(w * h * 3)]
            kind = "png" if d % 4 == 0 else "bmp"
            assert (r["container"], r["width"], r["height"]) == (kind, w, h)
            assert r["f1"] == sum(vals[0::3])
            assert r["f2"] == sum(vals[1::3])
            assert r["f3"] == sum(vals[2::3])
        else:
            n = 64 + d % 64
            s = [(d * 7919 + i * 104729) % 65536 - 32768 for i in range(n)]
            assert (r["container"], r["width"], r["height"]) == ("wav", n, 1)
            assert r["f1"] == sum(abs(x) for x in s)
            assert r["f2"] == max(abs(x) for x in s)
            assert r["f3"] == sum(s)


def test_real_lane_rejects_garbage(spark):
    from airstrik_py_spark.operators.multimodal import extract_features_real

    bad = spark.createDataFrame(
        [(1, "image/png", bytearray(b"not a container"), 15)],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    with pytest.raises(Exception, match="undecodable"):
        extract_features_real(bad).collect()


def test_real_decode_streaming_parity(spark, tmp_path):
    """The decode lane is streaming-clean: attach_real_media ->
    extract_features_real over a readStream (availableNow drain) yields
    exactly the batch result — mapInPandas is stateless row-local, so
    stream == batch by construction; this pins it."""
    from airstrik_py_spark.operators.multimodal import (
        attach_real_media,
        extract_features_real,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(16)], "doc_id long, text string"
    )
    tape = str(tmp_path / "docs_tape")
    docs.coalesce(1).write.parquet(tape)
    schema = spark.read.parquet(tape).schema

    stream = spark.readStream.schema(schema).parquet(tape)
    q = (
        extract_features_real(attach_real_media(stream))
        .writeStream.format("memory")
        .queryName("real_decode_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r) for r in spark.table("real_decode_stream").collect()
    }
    want = {
        tuple(r)
        for r in extract_features_real(attach_real_media(docs)).collect()
    }
    assert got == want and len(want) == 16


def test_png_truncated_crc_raises_valueerror():
    """ADVICE r11: a stream cut inside a chunk's 4-byte CRC used to leak a
    struct.error — the loud-failure contract says ValueError."""
    good = codecs.png_encode(3, 3, 3, bytes(range(27)))
    # cut 2 bytes into the IEND CRC (last 4 bytes of the file)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        codecs.png_decode(good[:-2])
    # and cut inside an IDAT CRC too
    idat_at = good.index(b"IDAT")
    (idat_len,) = struct.unpack(">I", good[idat_at - 4 : idat_at])
    crc_end = idat_at + 4 + idat_len + 4
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        codecs.png_decode(good[: crc_end - 3])


def test_wav_truncated_data_chunk_raises():
    """ADVICE r11: wav_decode silently parsed whatever bytes remained of a
    truncated data chunk instead of failing loudly like png_decode."""
    good = codecs.wav_encode(8000, 1, [100, -200, 300, -400])
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        codecs.wav_decode(good[:-3])
    # a declared length larger than the remaining bytes also fails
    data_at = good.index(b"data")
    forged = bytearray(good)
    forged[data_at + 4 : data_at + 8] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        codecs.wav_decode(bytes(forged))


def test_real_lane_rejects_non_rgb_png(spark):
    """ADVICE r11: a grayscale PNG is decodable but has 1 channel — the
    feature row wants RGB sums, so the lane must raise the documented
    ValueError, not IndexError."""
    from airstrik_py_spark.operators.multimodal import extract_features_real

    gray = codecs.png_encode(2, 2, 1, bytes([10, 20, 30, 40]))
    bad = spark.createDataFrame(
        [(7, "image/png", bytearray(gray), len(gray))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    with pytest.raises(Exception, match="expected RGB"):
        extract_features_real(bad).collect()


# --- foreign-encoder fixtures (VERDICT r11 #4) ------------------------------
# tests/fixtures/media/* are byte streams NOT produced by codecs.py's
# encoders (see tools/gen_media_fixtures.py): a hand-assembled RFC 2083 PNG
# with THREE IDAT chunks + gAMA/tEXt ancillary chunks, a hand-assembled
# top-down BITMAPV5HEADER BMP with a gap before the pixel array, and a WAV
# written by the stdlib `wave` module.  Decoding them severs the
# matched-encoder/decoder loop the registry oracle lane cannot.

import json as _json
import os as _os

_FIXDIR = _os.path.join(_os.path.dirname(__file__), "fixtures", "media")


def _fixture(name: str) -> bytes:
    with open(_os.path.join(_FIXDIR, name), "rb") as f:
        return f.read()


def _manifest() -> dict:
    with open(_os.path.join(_FIXDIR, "manifest.json")) as f:
        return _json.load(f)


def test_foreign_png_split_idat_ancillary_chunks():
    m = _manifest()["foreign_rgb.png"]
    data = _fixture("foreign_rgb.png")
    assert data.count(b"IDAT") == 3  # the foreign feature under test
    assert b"tEXt" in data and b"gAMA" in data
    w, h, ch, px = codecs.png_decode(data)
    assert (w, h, ch) == (m["width"], m["height"], m["channels"])
    assert list(px) == m["pixels"]


def test_foreign_bmp_topdown_v5_header():
    m = _manifest()["foreign_topdown.bmp"]
    data = _fixture("foreign_topdown.bmp")
    assert struct.unpack("<I", data[14:18])[0] == 124  # BITMAPV5HEADER
    assert struct.unpack("<i", data[22:26])[0] < 0     # top-down height
    w, h, ch, px = codecs.bmp_decode(data)
    assert (w, h, ch) == (m["width"], m["height"], m["channels"])
    assert list(px) == m["pixels"]


def test_foreign_wav_stdlib_encoder():
    m = _manifest()["foreign_stereo.wav"]
    rate, ch, nf, samples = codecs.wav_decode(_fixture("foreign_stereo.wav"))
    assert (rate, ch, nf) == (m["sample_rate"], m["channels"], m["n_frames"])
    assert samples == m["samples"]


def test_foreign_fixtures_through_spark_lane(spark):
    """extract_features_real over the foreign byte streams: the Spark lane
    (sniff -> decode -> integer features) must reproduce the manifest's
    independently computed sums for bytes no codecs.py encoder produced."""
    from airstrik_py_spark.operators.multimodal import extract_features_real

    m = _manifest()
    rows = [
        (0, "image/png", bytearray(_fixture("foreign_rgb.png"))),
        (1, "image/bmp", bytearray(_fixture("foreign_topdown.bmp"))),
        (2, "audio/wav", bytearray(_fixture("foreign_stereo.wav"))),
    ]
    df = spark.createDataFrame(
        [(i, t, p, len(p)) for i, t, p in rows],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    feats = {r["doc_id"]: r for r in extract_features_real(df).collect()}
    png, bmp, wav = (
        m["foreign_rgb.png"], m["foreign_topdown.bmp"], m["foreign_stereo.wav"]
    )
    assert (feats[0]["container"], feats[0]["width"], feats[0]["height"]) == (
        "png", png["width"], png["height"])
    assert (feats[0]["f1"], feats[0]["f2"], feats[0]["f3"]) == (
        png["sum_r"], png["sum_g"], png["sum_b"])
    assert (feats[1]["container"], feats[1]["width"], feats[1]["height"]) == (
        "bmp", bmp["width"], bmp["height"])
    assert (feats[1]["f1"], feats[1]["f2"], feats[1]["f3"]) == (
        bmp["sum_r"], bmp["sum_g"], bmp["sum_b"])
    assert (feats[2]["container"], feats[2]["width"], feats[2]["height"]) == (
        "wav", wav["n_frames"], wav["channels"])
    assert (feats[2]["f1"], feats[2]["f2"], feats[2]["f3"]) == (
        wav["sum_abs"], wav["peak_abs"], wav["sum_signed"])


def test_gen_media_fixtures_deterministic(tmp_path, monkeypatch):
    """The committed fixture bytes must be exactly reproducible from the
    generator script (auditable provenance)."""
    import importlib

    gen = importlib.import_module("tools.gen_media_fixtures")
    monkeypatch.setattr(gen, "OUT", str(tmp_path))
    gen.main()
    for name in ("foreign_rgb.png", "foreign_topdown.bmp",
                 "foreign_stereo.wav", "foreign_420.jpg",
                 "foreign_gray_rst.jpg", "manifest.json"):
        assert (tmp_path / name).read_bytes() == _fixture(name), name


def test_resize_real_handworked(spark):
    """resize_real on a hand-worked 3x3 RGB PNG at factor 2: kept pixels
    are (0,0), (0,2), (2,0), (2,2); resized dims are ceil(3/2) = 2x2.
    WAV: 5 mono frames at factor 2 keep indices 0, 2, 4."""
    from airstrik_py_spark.operators.multimodal import resize_real

    px = bytes(range(27))  # pixel (y,x) channel c = (y*3+x)*3+c
    png = codecs.png_encode(3, 3, 3, px)
    kept = [(0, 0), (0, 2), (2, 0), (2, 2)]
    want = [sum(px[(y * 3 + x) * 3 + c] for y, x in kept) for c in range(3)]
    samples = [100, -200, 300, -400, 500]
    wav = codecs.wav_encode(8000, 1, samples)
    df = spark.createDataFrame(
        [
            (0, "image/png", bytearray(png), len(png)),
            (1, "audio/wav", bytearray(wav), len(wav)),
        ],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    got = {r["doc_id"]: r for r in resize_real(df, factor=2).collect()}
    assert (got[0]["width"], got[0]["height"]) == (2, 2)
    assert (got[0]["f1"], got[0]["f2"], got[0]["f3"]) == tuple(want)
    kept_s = [samples[0], samples[2], samples[4]]
    assert (got[1]["width"], got[1]["height"]) == (3, 1)
    assert got[1]["f1"] == sum(abs(s) for s in kept_s)
    assert got[1]["f2"] == max(abs(s) for s in kept_s)
    assert got[1]["f3"] == sum(kept_s)
    # factor 1 is the identity: matches extract_features_real's full sums
    full = {r["doc_id"]: r for r in resize_real(df, factor=1).collect()}
    assert (full[0]["f1"], full[0]["f2"], full[0]["f3"]) == (
        sum(px[0::3]), sum(px[1::3]), sum(px[2::3]))
    assert full[1]["width"] == 5


def test_malformed_header_chunks_raise_valueerror_not_struct_error():
    """r12 self-review: undersized IHDR / fmt chunks with VALID lengths and
    CRCs passed the truncation guards and leaked struct.error from the
    header unpacks — same contract gap as the truncated-chunk class."""
    # PNG: IHDR declaring 12 bytes (valid CRC) instead of 13
    bad_ihdr = struct.pack(">IIBBBB", 2, 2, 8, 2, 0, 0)  # 12 bytes
    stream = codecs.PNG_SIG + _chunk(b"IHDR", bad_ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR length"):
        codecs.png_decode(stream)
    # WAV: fmt chunk of 4 bytes (consistent clen, so not 'truncated')
    wav = (b"RIFF" + struct.pack("<I", 24) + b"WAVE"
           + b"fmt " + struct.pack("<I", 4) + b"\x00" * 4
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="fmt chunk length"):
        codecs.wav_decode(wav)


def test_foreign_jpeg_420_subsampled():
    """Baseline 4:2:0 color JPEG (r13, VERDICT r12 #7): one MCU of four Y
    blocks + subsampled Cb/Cr, two quant tables, Annex K Huffman tables.
    The decoder must reproduce the manifest's pixels, which were computed
    by an INDEPENDENT numpy IDCT + JFIF matrix in the generator (codecs.py
    ships no jpeg encoder, so the stream is foreign by construction)."""
    m = _manifest()["foreign_420.jpg"]
    data = _fixture("foreign_420.jpg")
    assert codecs.sniff_media(data) == "jpeg"
    w, h, ch, px = codecs.jpeg_decode(data)
    assert (w, h, ch) == (m["width"], m["height"], m["channels"])
    assert list(px) == m["pixels"]


def test_foreign_jpeg_gray_restart_markers():
    """Grayscale baseline JPEG with DRI=1: RST0/RST1 split the three MCUs
    into independent entropy chunks and the DC predictor must reset at
    each restart — get that wrong and MCUs 2-3 shift by the running DC."""
    m = _manifest()["foreign_gray_rst.jpg"]
    data = _fixture("foreign_gray_rst.jpg")
    assert b"\xff\xd0" in data and b"\xff\xd1" in data  # the feature under test
    w, h, ch, px = codecs.jpeg_decode(data)
    assert (w, h, ch) == (m["width"], m["height"], m["channels"])
    assert list(px) == m["pixels"]


def test_foreign_jpeg_through_spark_lanes(spark):
    """The color JPEG through extract_features_real AND resize_real: sums
    recomputed from the manifest's independent pixels, factor-2 subsample
    sums from the same pixel list by index arithmetic."""
    from airstrik_py_spark.operators.multimodal import (
        extract_features_real,
        resize_real,
    )

    m = _manifest()["foreign_420.jpg"]
    data = _fixture("foreign_420.jpg")
    df = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(data), len(data))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    f = extract_features_real(df).collect()[0]
    assert (f["container"], f["width"], f["height"]) == (
        "jpeg", m["width"], m["height"])
    assert (f["f1"], f["f2"], f["f3"]) == (m["sum_r"], m["sum_g"], m["sum_b"])

    r = resize_real(df, factor=2).collect()[0]
    pxs = m["pixels"]
    w = m["width"]
    kept = [
        (y, x) for y in range(0, m["height"], 2) for x in range(0, w, 2)
    ]
    sums = [
        sum(pxs[(y * w + x) * 3 + c] for y, x in kept) for c in range(3)
    ]
    assert (r["width"], r["height"]) == (8, 8)
    assert (r["f1"], r["f2"], r["f3"]) == tuple(sums)


def test_jpeg_decode_guards():
    """Loud failures (ADVICE r11 discipline): progressive SOF2, truncated
    scan, grayscale through the RGB-only Spark lane, garbage SOI."""
    import pytest

    data = _fixture("foreign_420.jpg")
    # progressive: flip SOF0 marker to SOF2
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF0"):
        codecs.jpeg_decode(prog)
    # truncated entropy segment
    with pytest.raises(ValueError):
        codecs.jpeg_decode(data[: len(data) - 20])
    with pytest.raises(ValueError, match="SOI"):
        codecs.jpeg_decode(b"\x00\x01\x02")


def test_jpeg_grayscale_rejected_by_rgb_lane(spark):
    """extract_features_real's channel-sum contract is RGB; a grayscale
    JPEG must raise loudly, not produce shifted sums."""
    import pytest

    from airstrik_py_spark.operators.multimodal import extract_features_real

    data = _fixture("foreign_gray_rst.jpg")
    df = spark.createDataFrame(
        [(0, "image/jpeg", bytearray(data), len(data))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    with pytest.raises(Exception, match="1-channel"):
        extract_features_real(df).collect()


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    the header walk must skip them, not parse a phantom 0xFF marker
    (self-review r13)."""
    data = _fixture("foreign_gray_rst.jpg")
    # inject two fill bytes before the DQT marker
    dqt = data.index(b"\xff\xdb")
    padded = data[:dqt] + b"\xff\xff" + data[dqt:]
    assert codecs.jpeg_decode(padded) == codecs.jpeg_decode(data)


def test_jpeg_grayscale_ignores_declared_sampling():
    """T.81 A.2.2: a single-component scan is non-interleaved — one data
    unit per MCU regardless of the SOF's declared sampling factors.  A
    grayscale stream declaring 2x2 must decode identically to 1x1
    (self-review r13)."""
    data = _fixture("foreign_gray_rst.jpg")
    sof = data.index(b"\xff\xc0")
    samp_off = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1  # len,prec,h,w,ncomp,cid
    assert data[samp_off] == 0x11
    patched = data[:samp_off] + b"\x22" + data[samp_off + 1 :]
    assert codecs.jpeg_decode(patched) == codecs.jpeg_decode(data)


def test_jpeg_rejects_partial_component_scan():
    """A baseline SOS selecting fewer components than the frame declares
    (non-interleaved multi-scan) is out of scope and must refuse loudly
    rather than mis-tile."""
    import pytest

    data = _fixture("foreign_420.jpg")
    sos = data.index(b"\xff\xda")
    # original SOS payload: ns=3, (1,0x00),(2,0x11),(3,0x11), spectral 0,63,0
    patched = (
        data[:sos]
        + b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3)
        + bytes([1, 1, 0x00, 0, 63, 0])
        + data[data.index(b"\xff\xda") + 2 + struct.unpack(">H", data[sos+2:sos+4])[0]:]
    )
    with pytest.raises(ValueError, match="interleaved"):
        codecs.jpeg_decode(patched)


def test_jpeg_rejects_standalone_marker_before_sos():
    """TEM (0x01) and stray RSTn carry no length segment (T.81 B.1.1.3);
    parsing one as length-prefixed would skip arbitrary bytes (ADVICE
    r13).  Both must fail loudly, not mis-walk the header."""
    import pytest

    data = _fixture("foreign_gray_rst.jpg")
    dqt = data.index(b"\xff\xdb")
    # 0xD8 too: the leading SOI is consumed before the walk, so a stray
    # SOI mid-header is the concatenated/corrupt-stream case (T.81 lists
    # it standalone — misparsing it as length-prefixed skips bytes)
    for mk in (b"\xff\x01", b"\xff\xd0", b"\xff\xd8"):
        patched = data[:dqt] + mk + data[dqt:]
        with pytest.raises(ValueError, match="standalone marker"):
            codecs.jpeg_decode(patched)


def test_jpeg_dht_oversubscribed_rejected():
    """An over-subscribed DHT (more codes at a length than the canonical
    code space holds) must raise, not silently alias codes (ADVICE r13).
    A saturated-but-valid table (2 codes of length 1) must still build."""
    import pytest

    with pytest.raises(ValueError, match="over-subscribed"):
        codecs._jpeg_huffman([3] + [0] * 15, bytes([1, 2, 3]))
    # exactly-full code space at length 1 is legal
    t = codecs._jpeg_huffman([2] + [0] * 15, bytes([7, 9]))
    assert t == {(1, 0): 7, (1, 1): 9}
