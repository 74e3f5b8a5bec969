"""Baseline-JPEG DC decode (functions/multimodal.py).

The encoder here is written INDEPENDENTLY from the JPEG spec (ITU T.81):
matrix DCT-II, quantization, zigzag run-length, canonical Huffman with
self-built fixed-length tables (any valid DHT is legal — the decoder
must handle arbitrary canonical tables, so the test deliberately does
NOT reuse the spec's example tables). Ground truth for every
comparison is the 8x8 block-mean of the ENCODER'S INPUT plane, which
the decoder's dequantized-DC path must reproduce within DC
quantization error."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from incident_pii_redactor_spark.functions.multimodal import (
    _decode_jpeg_dc_luma,
)

# ---------------------------------------------------------------------------
# Minimal spec-derived baseline encoder (test-only)
# ---------------------------------------------------------------------------

_QY = np.array([  # ITU T.81 Annex K.1 luminance table
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
_QC = np.full((8, 8), 99, dtype=np.int32)
_QC[0, 0] = 17


def _zigzag_pairs():
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(diag)
    return order


_ZZ = _zigzag_pairs()

_DCT = np.array([[0.5 * (np.sqrt(0.5) if u == 0 else 1.0)
                  * np.cos((2 * x + 1) * u * np.pi / 16)
                  for x in range(8)] for u in range(8)])

# Self-built canonical tables: DC = 12 four-bit codes (sizes 0..11);
# AC = 162 eight-bit codes (EOB, ZRL, all (run 0-15, size 1-10)).
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per §F.1.2.3
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    qc = np.round(coef / q).astype(np.int64)
    dc = int(qc[0, 0])
    diff = dc - pred
    s = _size_cat(diff)
    c, ln = _DC_CODES[s]
    bw.put(c, ln)
    if s:
        bw.put(diff if diff >= 0 else diff - 1 + (1 << s), s)
    zz = [int(qc[r, cidx]) for r, cidx in _ZZ[1:]]
    run = 0
    last = max((i for i, v in enumerate(zz) if v), default=-1)
    for i in range(last + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]
            bw.put(c, ln)
            run -= 16
        s = _size_cat(v)
        c, ln = _AC_CODES[(run << 4) | s]
        bw.put(c, ln)
        bw.put(v if v >= 0 else v - 1 + (1 << s), s)
        run = 0
    if last < 62:
        c, ln = _AC_CODES[0x00]
        bw.put(c, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt(tid: int, q: np.ndarray) -> bytes:
    zz = bytes(int(q[r, c]) for r, c in _ZZ)
    return _seg(0xDB, bytes([tid]) + zz)


def _dht(tc: int, th: int, bits, vals) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def encode_jpeg(luma: np.ndarray, chroma: tuple | None = None,
                restart_interval: int = 0, sof_marker: int = 0xC0) -> bytes:
    """Baseline JFIF bytes for a uint8 luma plane; grayscale when
    ``chroma`` is None, else 4:2:0 YCbCr with the given (cb, cr)
    half-resolution planes."""
    h, w = luma.shape
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QY)
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    if chroma is None:
        comps = bytes([1, 0x11, 0])
        sos_comps = bytes([1, 0x00])
        nc = 1
    else:
        out += _dqt(1, _QC)
        comps = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        sos_comps = bytes([1, 0x00, 2, 0x00, 3, 0x00])
        nc = 3
    out += _seg(sof_marker, struct.pack(">BHHB", 8, h, w, nc) + comps)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([nc]) + sos_comps + bytes([0, 63, 0]))

    def pad_to(plane, bh, bw_):
        ph = -(-plane.shape[0] // bh) * bh
        pw = -(-plane.shape[1] // bw_) * bw_
        padded = np.empty((ph, pw), dtype=plane.dtype)
        padded[:plane.shape[0], :plane.shape[1]] = plane
        padded[plane.shape[0]:] = padded[plane.shape[0] - 1]
        padded[:, plane.shape[1]:] = padded[:, plane.shape[1] - 1:plane.shape[1]]
        return padded

    bw = _BitWriter()
    entropy = bytearray()
    rst = 0
    if chroma is None:
        y = pad_to(luma, 8, 8)
        preds = [0]
        mcus = [(by, bx) for by in range(y.shape[0] // 8)
                for bx in range(y.shape[1] // 8)]
        for n, (by, bx) in enumerate(mcus):
            if restart_interval and n and n % restart_interval == 0:
                entropy += bw.flush()
                entropy += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                preds = [0]
            preds[0] = _encode_block(
                bw, y[8 * by:8 * by + 8, 8 * bx:8 * bx + 8], _QY, preds[0])
    else:
        cb, cr = chroma
        y = pad_to(luma, 16, 16)
        cb = pad_to(cb, 8, 8)
        cr = pad_to(cr, 8, 8)
        preds = {0: 0, 1: 0, 2: 0}
        mcus = [(my, mx) for my in range(y.shape[0] // 16)
                for mx in range(y.shape[1] // 16)]
        for n, (my, mx) in enumerate(mcus):
            if restart_interval and n and n % restart_interval == 0:
                entropy += bw.flush()
                entropy += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                preds = {0: 0, 1: 0, 2: 0}
            for byi in range(2):
                for bxi in range(2):
                    blk = y[16 * my + 8 * byi:16 * my + 8 * byi + 8,
                            16 * mx + 8 * bxi:16 * mx + 8 * bxi + 8]
                    preds[0] = _encode_block(bw, blk, _QY, preds[0])
            preds[1] = _encode_block(
                bw, cb[8 * my:8 * my + 8, 8 * mx:8 * mx + 8], _QC, preds[1])
            preds[2] = _encode_block(
                bw, cr[8 * my:8 * my + 8, 8 * mx:8 * mx + 8], _QC, preds[2])
    entropy += bw.flush()
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                     pred: int, al: int) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    dc = int(np.round(coef[0, 0] / q[0, 0])) >> al
    diff = dc - pred
    s = _size_cat(diff)
    c, ln = _DC_CODES[s]
    bw.put(c, ln)
    if s:
        bw.put(diff if diff >= 0 else diff - 1 + (1 << s), s)
    return dc


def encode_jpeg_progressive_dc(luma: np.ndarray, al: int = 0,
                               chroma: tuple | None = None) -> bytes:
    """Legal progressive JPEG whose mandatory FIRST scan is the DC scan
    (Ss=Se=0, Ah=0, Al=al); later AC scans are omitted — the decoder
    under test must stop after scan 1 regardless. A trailing bogus SOS
    is appended to prove nothing past the first scan is read."""
    h, w = luma.shape
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QY)
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    if chroma is None:
        out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1)
                    + bytes([1, 0x11, 0]))
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, al]))
        y = luma
        bw = _BitWriter()
        pred = 0
        for by in range(-(-h // 8)):
            for bx in range(-(-w // 8)):
                blk = np.full((8, 8), 0, dtype=np.uint8)
                tile = y[8 * by:8 * by + 8, 8 * bx:8 * bx + 8]
                blk[:tile.shape[0], :tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    blk[tile.shape[0]:] = blk[tile.shape[0] - 1]
                if tile.shape[1] < 8:
                    blk[:, tile.shape[1]:] = blk[:, tile.shape[1] - 1:
                                                 tile.shape[1]]
                pred = _encode_dc_block(bw, blk, _QY, pred, al)
        out += bw.flush()
    else:
        out += _dqt(1, _QC)
        cb, cr = chroma
        out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
                    + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, al]))
        bw = _BitWriter()
        preds = {0: 0, 1: 0, 2: 0}
        mh, mw = -(-h // 16), -(-w // 16)

        def tile_of(plane, r0, c0):
            blk = np.zeros((8, 8), dtype=np.uint8)
            t = plane[r0:r0 + 8, c0:c0 + 8]
            if t.size == 0:
                return blk
            blk[:t.shape[0], :t.shape[1]] = t
            if t.shape[0] < 8:
                blk[t.shape[0]:] = blk[t.shape[0] - 1]
            if t.shape[1] < 8:
                blk[:, t.shape[1]:] = blk[:, t.shape[1] - 1:t.shape[1]]
            return blk

        for my in range(mh):
            for mx in range(mw):
                for byi in range(2):
                    for bxi in range(2):
                        preds[0] = _encode_dc_block(
                            bw, tile_of(luma, 16 * my + 8 * byi,
                                        16 * mx + 8 * bxi), _QY,
                            preds[0], al)
                preds[1] = _encode_dc_block(
                    bw, tile_of(cb, 8 * my, 8 * mx), _QC, preds[1], al)
                preds[2] = _encode_dc_block(
                    bw, tile_of(cr, 8 * my, 8 * mx), _QC, preds[2], al)
        out += bw.flush()
    # bogus second scan: must never be touched by a DC-only decode
    out += _seg(0xDA, bytes([1, 1, 0x10, 1, 5, 0x02])) + b"\x12\x34\x56"
    out += b"\xff\xd9"
    return bytes(out)


def _block_means(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    bh, bw_ = -(-h // 8), -(-w // 8)
    out = np.empty((bh, bw_), dtype=np.float64)
    for i in range(bh):
        for j in range(bw_):
            out[i, j] = plane[8 * i:8 * i + 8, 8 * j:8 * j + 8].mean()
    return out


def _smooth_image(h: int, w: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
           + rng.normal(0, 6, (h, w)))
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_grayscale_dc_decode_matches_block_means():
    img = _smooth_image(48, 64)
    luma = _decode_jpeg_dc_luma(encode_jpeg(img))
    assert luma is not None and luma.shape == (6, 8)
    # DC quant step 16 -> block-mean error bound 16/(2*8)=1, plus
    # float DCT rounding
    assert np.abs(luma - _block_means(img)).max() < 2.5


def test_nonmultiple_of_8_dims_crop_padding_blocks():
    img = _smooth_image(41, 53, seed=5)
    luma = _decode_jpeg_dc_luma(encode_jpeg(img))
    assert luma is not None and luma.shape == (6, 7)
    # interior blocks (no encoder edge-padding) match exactly-ish
    assert np.abs(luma[:5, :6] - _block_means(img)[:5, :6]).max() < 2.5


def test_color_420_interleaved_luma_decode():
    img = _smooth_image(32, 48, seed=9)
    cb = np.full((16, 24), 120, dtype=np.uint8)
    cr = np.full((16, 24), 136, dtype=np.uint8)
    luma = _decode_jpeg_dc_luma(encode_jpeg(img, chroma=(cb, cr)))
    assert luma is not None and luma.shape == (4, 6)
    assert np.abs(luma - _block_means(img)).max() < 2.5


def test_restart_markers_resync_and_reset_predictors():
    img = _smooth_image(48, 64, seed=11)
    plain = _decode_jpeg_dc_luma(encode_jpeg(img))
    with_rst = _decode_jpeg_dc_luma(encode_jpeg(img, restart_interval=3))
    assert with_rst is not None
    np.testing.assert_array_equal(plain, with_rst)
    col = _decode_jpeg_dc_luma(
        encode_jpeg(img, chroma=(np.full((24, 32), 128, np.uint8),) * 2,
                    restart_interval=2))
    assert col is not None
    assert np.abs(col - _block_means(img)).max() < 2.5


def test_progressive_dc_first_scan_decodes():
    img = _smooth_image(48, 64, seed=21)
    luma = _decode_jpeg_dc_luma(encode_jpeg_progressive_dc(img))
    assert luma is not None and luma.shape == (6, 8)
    assert np.abs(luma - _block_means(img)).max() < 2.5
    # successive approximation: Al=1 loses one DC bit (error <= q0*2/8)
    luma1 = _decode_jpeg_dc_luma(encode_jpeg_progressive_dc(img, al=1))
    assert luma1 is not None
    assert np.abs(luma1 - _block_means(img)).max() < 2.5 + 2 * _QY[0, 0] / 8
    # interleaved 4:2:0 progressive DC scan
    cb = np.full((24, 32), 110, np.uint8)
    cr = np.full((24, 32), 140, np.uint8)
    lcol = _decode_jpeg_dc_luma(
        encode_jpeg_progressive_dc(img, chroma=(cb, cr)))
    assert lcol is not None
    assert np.abs(lcol - _block_means(img)).max() < 2.5


def test_progressive_and_corrupt_fall_back_to_none():
    img = _smooth_image(16, 16)
    good = encode_jpeg(img)
    # SOF2 with an ILLEGAL first scan (Ss=0, Se=63 — not the mandatory
    # DC scan) must refuse
    assert _decode_jpeg_dc_luma(encode_jpeg(img, sof_marker=0xC2)) is None
    # truncated entropy stream
    assert _decode_jpeg_dc_luma(good[:len(good) // 2]) is None
    # not a JPEG at all
    assert _decode_jpeg_dc_luma(b"\x89PNG\r\n\x1a\n" + good) is None
    # empty / header-only
    assert _decode_jpeg_dc_luma(b"\xff\xd8\xff\xd9") is None


def test_scan_budget_refuses_oversized_entropy_stream():
    img = _smooth_image(16, 16)
    good = bytearray(encode_jpeg(img))
    # splice 3 MB of stuffed-FF filler into the scan: the de-stuffed
    # interval blows the 2 MB budget BEFORE any Huffman walk
    assert good[-2:] == b"\xff\xd9"
    bomb = bytes(good[:-2]) + b"\xff\x00" * (3 << 20) + b"\xff\xd9"
    assert _decode_jpeg_dc_luma(bomb) is None


def _avi_mjpeg(frames: list, usec_per_frame: int = 33333,
               streams: int = 1) -> bytes:
    """Minimal RIFF-AVI container wrapping JPEG frames as 00dc chunks
    (the Motion-JPEG layout), with a real avih header."""
    def chunk(cid, data):
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    avih = (struct.pack("<IIIIIIII", usec_per_frame, 0, 0, 0,
                        len(frames), 0, streams, 0) + b"\x00" * 24)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi"
                 + b"".join(chunk(b"00dc", f) for f in frames))
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_avi_meta_and_real_frame_hashes(spark):
    import hashlib

    from incident_pii_redactor_spark.functions.multimodal import (
        decode_video_meta,
        frame_sample,
    )

    jpegs = [encode_jpeg(_smooth_image(16, 16, seed=s)) for s in range(5)]
    avi = _avi_mjpeg(jpegs, usec_per_frame=40000, streams=2)
    df = spark.createDataFrame([(1, avi), (2, b"not a video")],
                               "media_id long, blob binary")
    meta = {r.media_id: r for r in
            decode_video_meta(df, "media_id", "blob").collect()}
    assert meta[1].format == "avi"
    assert meta[1].n_tracks == 2
    assert abs(meta[1].duration_s - 5 * 0.04) < 1e-9
    assert meta[1].timescale == 25  # fps from usec_per_frame
    assert meta[2].format == "fake"

    fp = frame_sample(df, "media_id", "blob", every_n=2).toPandas()
    real = fp[fp.media_id == 1].sort_values("frame_no")
    assert list(real.frame_no) == [0, 2, 4]
    # content-derived: the hash is the md5 of the frame's own bytes
    assert list(real.frame_hash) == [
        hashlib.md5(jpegs[f]).hexdigest() for f in (0, 2, 4)]
    assert (fp.media_id == 2).sum() >= 1  # fake path still expands


def test_frame_features_decode_real_frame_content(spark):
    from incident_pii_redactor_spark.functions.multimodal import (
        _decode_jpeg_dc_luma,
        _luma_grid_feature,
        frame_features,
    )

    dark = encode_jpeg(np.full((16, 16), 30, np.uint8))
    bright = encode_jpeg(np.full((16, 16), 220, np.uint8))
    avi = _avi_mjpeg([dark, bright])
    df = spark.createDataFrame([(7, avi)], "media_id long, blob binary")
    got = {r.frame_no: r.feature for r in
           frame_features(df, "media_id", "blob", every_n=1,
                          dim=4).collect()}
    assert set(got) == {0, 1}
    assert all(v < 0.3 for v in got[0])   # dark frame
    assert all(v > 0.7 for v in got[1])   # bright frame
    exp = _luma_grid_feature(_decode_jpeg_dc_luma(dark), 4)
    assert np.allclose(got[0], exp)


def test_feature_udf_real_jpeg_path(spark):
    """The image feature responds to JPEG pixel CONTENT and ignores
    non-pixel bytes (trailing garbage after EOI)."""
    from pyspark.sql import functions as F

    from incident_pii_redactor_spark.functions.multimodal import (
        image_feature_udf,
    )

    img_a = _smooth_image(32, 32, seed=1)
    img_b = img_a.copy()
    img_b[:16, :16] = 255  # visible content change
    blob_a = encode_jpeg(img_a)
    blob_b = encode_jpeg(img_b)
    blob_a_trailer = blob_a + b"GARBAGE-NOT-PIXELS"
    df = spark.createDataFrame(
        [(1, blob_a), (2, blob_b), (3, blob_a_trailer)], "id int, img binary")
    feat = image_feature_udf(dim=16)
    got = {r["id"]: r["v"] for r in
           df.select("id", feat(F.col("img")).alias("v")).collect()}
    assert got[1] == got[3]          # trailing bytes don't touch pixels
    assert got[1] != got[2]          # pixel change moves the feature
    # the bright quadrant must raise the corresponding grid cells
    assert got[2][0] > got[1][0]
