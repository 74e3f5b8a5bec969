"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Image METADATA decoding is REAL header parsing (PNG/GIF/BMP/JPEG are
public byte formats — no library needed); WAV audio metadata uses the
stdlib ``wave`` module. PIXEL decoding is real for non-interlaced
8-bit PNG (stdlib ``zlib`` inflates IDAT; all five row filters) and
uncompressed BMP, and (at DC/block-mean level — all the 8x8 grid
feature needs) baseline AND progressive JPEG via a table-driven
Huffman walk of the entropy stream. Video keyframe extraction still
needs PIL/ffmpeg (absent in this environment) and falls back to an
explicitly-marked deterministic fake, as does metadata for formats the
header parsers don't cover — the Spark-side plumbing (schemas, UDF
signatures, batch shapes, pruning) is real and tested either way.

Scale notes: media blobs are large — the operators select only the blob
+ id (column pruning keeps sibling text columns out of the scan), and
``maxRecordsPerBatch`` bounds per-batch Python memory. Feature vectors
come back as fixed-size ``array<float>`` ready for the similarity ops.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # IHDR color type -> channels


_INT32_MAX = 0x7FFFFFFF


def _dims_ok(w: int, h: int) -> bool:
    # PNG caps dimensions at 2^31-1 by spec; anything outside (0, int32]
    # is a corrupt/malicious header -> treat as undecodable (the output
    # schema is int32 — an unchecked value would wrap through Arrow)
    return 0 < w <= _INT32_MAX and 0 < h <= _INT32_MAX


def _decode_image_header(blob: bytes):
    """REAL header parse for PNG / GIF / BMP / JPEG; None if the blob is
    none of them or the header is corrupt (caller falls back to the
    deterministic fake)."""
    if len(blob) >= 26 and blob[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", blob[16:24])
        return (w, h, _PNG_CHANNELS.get(blob[25], 3), "png") \
            if _dims_ok(w, h) else None
    if len(blob) >= 10 and blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return (w, h, 3, "gif") if _dims_ok(w, h) else None
    if len(blob) >= 30 and blob[:2] == b"BM":
        w, h = struct.unpack("<ii", blob[18:26])
        bpp = struct.unpack("<H", blob[28:30])[0]
        h = -h if h < 0 else h  # negative height = top-down row order
        return (w, h, max(1, bpp // 8), "bmp") if _dims_ok(w, h) else None
    if len(blob) >= 4 and blob[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOF0/1/2 frame header
        i = 2
        while i + 4 <= len(blob) and blob[i] == 0xFF:
            if blob[i + 1] == 0xFF:  # fill bytes between markers are legal
                i += 1
                continue
            marker = blob[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                if i + 10 > len(blob):
                    return None  # SOF truncated
                h, w = struct.unpack(">HH", blob[i + 5:i + 9])
                return (w, h, blob[i + 9], "jpeg") if _dims_ok(w, h) else None
            if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
                return None
            seg_len = struct.unpack(">H", blob[i + 2:i + 4])[0]
            if seg_len < 2:
                return None  # corrupt length would loop forever
            i += 2 + seg_len
        return None
    return None


def _decode_image_fallback(blob: bytes) -> tuple[int, int, int, str]:
    """FALLBACK for undecodable blobs — deterministic fake driven by the
    blob's bytes (a full decoder would need PIL, absent here), so the
    plumbing stays testable on synthetic data."""
    h = hashlib.md5(blob).digest()
    width = 64 + (struct.unpack("<H", h[0:2])[0] % 1985)
    height = 64 + (struct.unpack("<H", h[2:4])[0] % 1985)
    channels = 3 if h[4] % 4 else 1
    # labeled 'fake' like the audio/video fallbacks (review round 5:
    # labeling invented dims with a real format name made them
    # indistinguishable from genuinely parsed headers)
    return width, height, channels, "fake"


def _decode_image(blob: bytes) -> tuple[int, int, int, str]:
    return _decode_image_header(blob) or _decode_image_fallback(blob)


def _col_type(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()


def decode_image_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """binary -> typed metadata via one mapInPandas stage."""
    schema = f"{id_col} {_col_type(df, id_col)}, {IMAGE_META_SCHEMA}"
    pruned = df.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image(b or b"") for b in pdf[blob_col]]
            out = pd.DataFrame(metas, columns=["width", "height", "channels", "format"])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return pruned.mapInPandas(run, schema=schema)


AUDIO_META_SCHEMA = ("n_channels int, sample_rate int, n_frames bigint, "
                     "duration_s double, format string")


def decode_audio_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """binary -> audio metadata via one mapInPandas stage. WAV/RIFF is
    decoded for REAL with the stdlib ``wave`` module (no external lib);
    other containers (mp3/flac/ogg need codec libraries absent here)
    fall back to a deterministic fake so plumbing stays testable."""
    import io
    import wave

    schema = f"{id_col} {_col_type(df, id_col)}, {AUDIO_META_SCHEMA}"
    pruned = df.select(id_col, blob_col)

    def decode(blob: bytes):
        if len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            try:
                with wave.open(io.BytesIO(blob)) as w:
                    rate, frames = w.getframerate(), w.getnframes()
                    return (w.getnchannels(), rate, frames,
                            frames / rate if rate else 0.0, "wav")
            except (wave.Error, EOFError, struct.error):
                # truncated RIFF raises EOFError/struct.error from the
                # stdlib parser, not just wave.Error — one corrupt upload
                # must not kill the task
                pass  # malformed RIFF -> fallback
        h = hashlib.md5(blob).digest()
        rate = (8000, 16000, 44100, 48000)[h[0] % 4]
        frames = 1000 + struct.unpack("<I", h[1:5])[0] % 10_000_000
        return (1 + h[5] % 2, rate, frames, frames / rate, "fake")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(b or b"") for b in pdf[blob_col]]
            out = pd.DataFrame(
                metas, columns=["n_channels", "sample_rate", "n_frames",
                                "duration_s", "format"])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return pruned.mapInPandas(run, schema=schema)


_PNG_PIXEL_CAP = 64 << 20  # refuse >64 MB decoded planes (zip bombs)
# The real-decode path feeds an 8x8 luma grid — decoding beyond a
# camera-sized frame buys nothing, and the Average/Paeth filters cost a
# per-byte Python loop (ADVICE round 4: a crafted max-dims all-Paeth
# PNG burned ~30s CPU per image inside the UDF). Two bounds:
_PNG_MAX_PIXELS = 16 << 20     # 16 MP: real decode above this -> fake
_PNG_SEQ_BYTE_BUDGET = 4 << 20  # max bytes on Average/Paeth rows


def _seq_filter_bytes(raw: np.ndarray, h: int, stride: int) -> int:
    """Total bytes on Average/Paeth-filtered rows (the per-byte-loop
    cost) — filter tags sit at the head of each scanline."""
    tags = raw[: h * (stride + 1)].reshape(h, stride + 1)[:, 0]
    return int(np.count_nonzero(tags >= 3)) * stride


def _png_chunks(blob: bytes):
    """Yield (type, payload) for each well-formed PNG chunk; stops at
    the first corrupt length or IEND (trailing garbage is ignored, as
    real decoders do)."""
    i = 8
    while i + 8 <= len(blob):
        ln = int.from_bytes(blob[i:i + 4], "big")
        typ = blob[i + 4:i + 8]
        if ln > len(blob) - i - 8:
            return  # truncated chunk
        yield typ, blob[i + 8:i + 8 + ln]
        if typ == b"IEND":
            return
        i += 12 + ln  # len + type + payload + crc (crc not verified)


def _png_unfilter(raw: np.ndarray, h: int, w: int, nb: int) -> np.ndarray:
    """Reverse PNG row filters (spec §9: None/Sub/Up/Average/Paeth) on
    the inflated scanline stream -> (h, w*nb) uint8 sample matrix.
    None/Sub/Up rows are vectorized (Sub is a per-channel-stride prefix
    sum mod 256); Average/Paeth carry a true left+above recurrence and
    fall back to a per-byte loop — rare in practice for small rows."""
    stride = w * nb
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)] \
            .astype(np.uint16)
        if f == 0:
            cur = row
        elif f == 1:  # Sub: prefix sum along x within each channel
            cur = row.copy()
            for c in range(nb):
                cur[c::nb] = np.cumsum(cur[c::nb]) & 0xFF
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential recurrence
            cur = np.zeros(stride, dtype=np.uint16)
            for x in range(stride):
                a = int(cur[x - nb]) if x >= nb else 0
                b = int(prev[x])
                if f == 3:
                    cur[x] = (int(row[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - nb]) if x >= nb else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        b if pb <= pc else c
                    cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


# Adam7 interlace passes: (x0, y0, dx, dy) — PNG spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_pass_dims(w: int, h: int):
    """(pass_w, pass_h) per Adam7 pass; empty passes are (0, _)/(_, 0)
    and contribute NO scanlines to the stream."""
    return [((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7]


def _adam7_samples(raw: np.ndarray, h: int, w: int, nb: int) -> np.ndarray:
    """Deinterlace an Adam7 scanline stream: each pass is an
    independently-filtered sub-image (its own None/Sub/Up/Average/Paeth
    chain, restarting at the pass boundary); unfilter each with the
    shared ``_png_unfilter`` and scatter into the full-frame strided
    grid (pure numpy — VERDICT round-4 item 7)."""
    out = np.zeros((h, w, nb), dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_pass_dims(w, h)):
        if pw == 0 or ph == 0:
            continue
        n = ph * (pw * nb + 1)
        sub = _png_unfilter(raw[pos:pos + n], ph, pw, nb)
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, nb)
        pos += n
    return out


def _decode_png_pixels(blob: bytes):
    """REAL pixel decode for 8- and 16-bit PNG (stdlib ``zlib`` inflates
    IDAT — no codec library needed): gray / RGB / palette / gray+alpha
    / RGBA color types, progressive (Adam7) or not. 16-bit samples are
    rescaled to the 0..255 luma range via /257 (the exact 16->8
    mapping). Returns an (h, w) float32 BT.601 luma array, or None for
    sub-byte depths, oversized frames (>16 MP — the feature is an 8x8
    grid), adversarially-filtered streams (Average/Paeth rows beyond
    _PNG_SEQ_BYTE_BUDGET — the one per-byte-loop path), or corrupt
    streams (caller falls back to the fake)."""
    if len(blob) < 33 or blob[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w = h = None
    plte = None
    idat = bytearray()
    for typ, payload in _png_chunks(blob):
        if typ == b"IHDR":
            if len(payload) < 13:
                return None
            w, h = struct.unpack(">II", payload[:8])
            depth, ctype, comp, filt, ilace = payload[8:13]
            if (depth not in (8, 16) or comp != 0 or filt != 0
                    or ilace not in (0, 1)
                    or ctype not in (0, 2, 3, 4, 6)
                    or (depth == 16 and ctype == 3)  # illegal per spec
                    or not _dims_ok(w, h) or w * h > _PNG_MAX_PIXELS):
                return None
        elif typ == b"PLTE":
            plte = np.frombuffer(payload[:len(payload) // 3 * 3],
                                 dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += payload
    if w is None or not idat:
        return None
    # nb = FILTER bytes per pixel (channels x sample bytes): PNG filters
    # operate on bytes with exactly this stride, so the 16-bit path
    # reuses the 8-bit unfilter verbatim and recombines sample pairs
    # afterwards
    sb = depth // 8
    nb = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype] * sb
    if ilace:
        need = sum(ph * (pw * nb + 1)
                   for pw, ph in _adam7_pass_dims(w, h) if pw and ph)
    else:
        need = h * (w * nb + 1)
    if need > _PNG_PIXEL_CAP:
        return None
    try:
        # bounded inflate: cap output at need+1 BYTES DURING
        # decompression — a zip bomb (tiny declared dims, high-ratio
        # IDAT) is rejected after inflating at most one excess byte,
        # never after materializing the full bomb (review round 4: the
        # old zlib.decompress(bufsize=) path inflated a 200 KB blob to
        # 459 MB before the size check)
        dec = zlib.decompressobj()
        buf = dec.decompress(bytes(idat), need + 1)
    except zlib.error:
        return None
    if len(buf) != need or dec.decompress(b"", 1):
        return None  # over- or under-sized scanline volume: corrupt/bomb
    raw = np.frombuffer(buf, dtype=np.uint8)
    # adversarial-filter budget: Average/Paeth rows take the per-byte
    # Python loop — refuse streams that put more than the budget on it
    # (real photos mix filters; an all-Paeth max-dims PNG is an attack)
    if ilace:
        seq = pos = 0
        for pw, ph in _adam7_pass_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            n = ph * (pw * nb + 1)
            seq += _seq_filter_bytes(raw[pos:pos + n], ph, pw * nb)
            pos += n
    else:
        seq = _seq_filter_bytes(raw, h, w * nb)
    if seq > _PNG_SEQ_BYTE_BUDGET:
        return None
    try:
        if ilace:
            samples = _adam7_samples(raw, h, w, nb)
        else:
            samples = _png_unfilter(raw, h, w, nb).reshape(h, w, nb)
    except ValueError:
        return None
    if sb == 2:  # 16-bit: big-endian byte pairs -> 0..255 float scale
        s16 = samples.astype(np.uint16)
        samples = (s16[..., 0::2] << 8) | s16[..., 1::2]
        px = samples.astype(np.float32) / 257.0
    else:
        px = samples.astype(np.float32)
    if ctype == 0:
        return px[..., 0]
    if ctype == 4:  # gray + alpha: luma is the gray channel
        return px[..., 0]
    if ctype == 3:  # palette lookup -> RGB
        if plte is None:
            return None
        idx = samples[..., 0]
        if int(idx.max()) >= len(plte):
            return None  # index past the palette: corrupt
        px = plte[idx].astype(np.float32)
    # PNG samples are RGB(A) order (unlike BMP's BGR)
    return 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]


def _decode_bmp_pixels(blob: bytes):
    """REAL pixel decode for uncompressed 24/32-bpp BMP (pure
    struct/numpy — the one mainstream raster format that needs no codec
    library): returns an (h, w) float32 BT.601 luma array, or None for
    anything else (compressed BMP, other formats, corrupt headers)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", blob[10:14])[0]
    w, h = struct.unpack("<ii", blob[18:26])
    bpp = struct.unpack("<H", blob[28:30])[0]
    comp = struct.unpack("<I", blob[30:34])[0]
    top_down = h < 0
    h = -h if h < 0 else h
    if comp != 0 or bpp not in (24, 32) or not _dims_ok(w, h):
        return None
    nb = bpp // 8
    stride = (w * nb + 3) // 4 * 4  # rows pad to 4-byte multiples
    if data_off + stride * h > len(blob) or data_off < 54:
        return None  # truncated pixel data / header overlap
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * nb].reshape(h, w, nb).astype(np.float32)
    if not top_down:
        px = px[::-1]  # BMP default is bottom-up row order
    # pixels are BGR(A)
    return 0.114 * px[..., 0] + 0.587 * px[..., 1] + 0.299 * px[..., 2]


_JPEG_SCAN_BUDGET = 2 << 20  # max entropy-coded bytes we Huffman-walk
_ZIGZAG0 = 0  # DC is always coefficient 0 in zigzag order


def _jpeg_huff_lut(bits: list[int], vals: list[int]):
    """Canonical JPEG Huffman table (DHT BITS/HUFFVAL, spec §C.2) ->
    16-bit peek LUT: for any 16-bit window, ``sym[v]``/``ln[v]`` give
    the decoded symbol and its code length (0 = invalid prefix).
    65536-entry numpy arrays make per-symbol decode one indexed load —
    the standard table-driven decoder, no per-bit tree walk."""
    sym = np.full(65536, -1, dtype=np.int16)
    ln = np.zeros(65536, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals) or code >= (1 << length):
                raise ValueError("jpeg: corrupt Huffman table")
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


_HUFF_LUT_CACHE: dict = {}


class _JpegBits:
    """MSB-first bit reader over de-stuffed entropy bytes. The window
    is padded with 1-bits past the end (encoders pad the final byte
    with 1s, spec §F.1.2.3), so a well-formed stream's last block
    decodes without a special case; a truly truncated stream raises."""

    __slots__ = ("data", "pos", "acc", "n", "total_bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.total_bits = 8 * len(data)

    def _fill(self) -> None:
        d, p = self.data, self.pos
        while self.n <= 48:
            self.acc = (self.acc << 8) | (d[p] if p < len(d) else 0xFF)
            p += 1
            self.n += 8
        self.pos = p

    def peek16(self) -> int:
        if self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def drop(self, k: int) -> None:
        self.n -= k
        self.total_bits -= k
        if self.total_bits < 0:
            raise ValueError("jpeg: bitstream underrun")
        self.acc &= (1 << self.n) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.drop(k)
        return v


def _jpeg_extend(v: int, s: int) -> int:
    """DIFF/coefficient sign extension (spec §F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _jpeg_decode_block(bits: _JpegBits, dlut, alut, pred: int) -> int:
    """Huffman-decode one 8x8 block, returning its (unquantized-diff
    applied) DC value. AC coefficients are entropy-decoded to keep the
    stream in sync but their values are skipped — DC is all the
    block-mean luma plane needs. ``alut=None`` = a progressive DC scan:
    the block carries ONLY its DC diff, no AC terms to sync past."""
    dsym, dln = dlut
    v = bits.peek16()
    s = dln[v]
    if s == 0:
        raise ValueError("jpeg: invalid DC prefix")
    bits.drop(int(s))
    size = int(dsym[v])
    dc = pred + _jpeg_extend(bits.get(size), size)
    if alut is None:
        return dc
    asym, aln = alut
    k = 1
    while k < 64:
        v = bits.peek16()
        s = aln[v]
        if s == 0:
            raise ValueError("jpeg: invalid AC prefix")
        bits.drop(int(s))
        rs = int(asym[v])
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r + 1
        bits.get(size)  # AC value: decoded for sync, not kept
    return dc


def _jpeg_scan_intervals(blob: bytes, start: int):
    """Split the entropy-coded scan into restart intervals: de-stuffed
    byte runs separated by RSTn markers (FFD0-FFD7). Returns
    (intervals, end_offset); stops at any non-RST marker (EOI/next
    scan)."""
    out = []
    i = start
    seg_start = start
    n = len(blob)
    while i < n:
        j = blob.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            i = n
            break
        nxt = blob[j + 1]
        if nxt == 0x00:
            i = j + 2  # stuffed literal FF
            continue
        if 0xD0 <= nxt <= 0xD7:  # restart marker
            out.append(blob[seg_start:j].replace(b"\xff\x00", b"\xff"))
            seg_start = i = j + 2
            continue
        i = j  # real marker: scan over
        break
    out.append(blob[seg_start:i].replace(b"\xff\x00", b"\xff"))
    return out, i


def _decode_jpeg_dc_luma(blob: bytes):
    """REAL (DC-level) JPEG decode, stdlib+numpy only: walks
    DQT/DHT/SOF0/SOF1/SOF2/DRI/SOS, Huffman-decodes the first scan's
    coefficients (baseline: AC terms consumed for stream sync;
    progressive: the mandatory first scan IS DC-only), and keeps each
    luma block's dequantized DC term. ``mean(block) = DC/8 + 128``
    exactly (the DCT's 0th basis vector), so the result is the TRUE
    mean-pooled luma plane at 1/8 resolution — precisely the input the
    8x8-grid feature mean-pools anyway, with no IDCT and no chroma
    upsampling (progressive refinement scans are skipped: they carry
    the Al low bits / AC detail the grid ignores). Returns
    (h//8-ish, w//8-ish) float32 luma or None for
    lossless/arithmetic/12-bit JPEGs, frames >16 MP, scans >2 MB
    (adversarial CPU bound, same philosophy as the PNG filter budget),
    or corrupt streams — caller falls back to the fake."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    progressive = False
    dri = 0
    i = 2
    n = len(blob)
    try:
        while i + 4 <= n:
            if blob[i] != 0xFF:
                return None
            m = blob[i + 1]
            if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            if m == 0xD9:
                return None  # EOI before any scan
            seglen = int.from_bytes(blob[i + 2:i + 4], "big")
            if seglen < 2 or i + 2 + seglen > n:
                return None
            seg = blob[i + 4:i + 2 + seglen]
            if m == 0xDB:  # DQT (possibly several tables per segment)
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    p += 1
                    if pq == 0:
                        qt[tq] = np.frombuffer(
                            seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                        p += 64
                    else:
                        qt[tq] = np.frombuffer(
                            seg[p:p + 128], dtype=">u2").astype(np.int32)
                        p += 128
            elif m == 0xC4:  # DHT (possibly several tables per segment)
                p = 0
                while p + 17 <= len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    bits = list(seg[p + 1:p + 17])
                    nv = sum(bits)
                    vals = list(seg[p + 17:p + 17 + nv])
                    if len(vals) < nv:
                        return None
                    # memoize on the raw DHT bytes: web corpora reuse
                    # the handful of Annex-K tables, and rebuilding the
                    # 65,536-entry LUTs per image dominated small-image
                    # decode cost (review round 5)
                    key = bytes(seg[p:p + 17 + nv])
                    lut = _HUFF_LUT_CACHE.get(key)
                    if lut is None:
                        if len(_HUFF_LUT_CACHE) >= 256:
                            _HUFF_LUT_CACHE.clear()
                        lut = _jpeg_huff_lut(bits, vals)
                        _HUFF_LUT_CACHE[key] = lut
                    (huff_dc if tc == 0 else huff_ac)[th] = lut
                    p += 17 + nv
            elif m in (0xC0, 0xC1, 0xC2):
                # baseline / extended sequential / progressive (DC-able)
                if seg[0] != 8:
                    return None  # 12-bit precision
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if (not _dims_ok(w, h) or w * h > _PNG_MAX_PIXELS
                        or nc not in (1, 3, 4)):
                    return None
                comps = []
                for c in range(nc):
                    cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                    hi, vi = samp >> 4, samp & 15
                    if not (1 <= hi <= 4 and 1 <= vi <= 4):
                        return None
                    comps.append((cid, hi, vi, tq))
                frame = (h, w, comps)
                progressive = m == 0xC2
            elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless / hierarchical / arithmetic
            elif m == 0xDD:  # DRI
                dri = int.from_bytes(seg[:2], "big")
            elif m == 0xDA:  # SOS: entropy data follows
                if frame is None:
                    return None
                ns = seg[0]
                smap = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    smap.append((cs, tt >> 4, tt & 15))
                ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
                al = 0
                if progressive:
                    # a progressive file's FIRST scan must be the DC
                    # scan (spec G.1.1.1.1); its dequantized values are
                    # the block means we need — the later AC/refinement
                    # scans only sharpen detail the 8x8 grid ignores.
                    # Ah=0 first pass; Al low bits arrive in refinement
                    # scans we skip (documented precision loss <= q0*
                    # 2^Al/8 gray levels on the block mean).
                    if ss != 0 or se != 0 or (ahal >> 4) != 0:
                        return None
                    al = ahal & 15
                return _jpeg_decode_scan(
                    blob, i + 2 + seglen, frame, smap, qt,
                    huff_dc, huff_ac, dri,
                    dc_only=progressive, al=al)
            i += 2 + seglen
        return None
    except (ValueError, IndexError, KeyError, StopIteration,
            struct.error):
        return None


def _jpeg_decode_scan(blob, start, frame, smap, qt, huff_dc, huff_ac, dri,
                      dc_only: bool = False, al: int = 0):
    h, w, comps = frame
    intervals, _end = _jpeg_scan_intervals(blob, start)
    if sum(len(s) for s in intervals) > _JPEG_SCAN_BUDGET:
        return None
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    order = []  # (is_luma, n_blocks_per_mcu, dlut, alut)
    luma_id = comps[0][0]
    for cs, td, ta in smap:
        hi, vi, tq = by_id[cs]
        alut = None if dc_only else huff_ac[ta]
        order.append((cs == luma_id, hi, vi, huff_dc[td], alut))
    hmax = max(hi for _, hi, vi, _, _ in order) if len(order) > 1 else 1
    vmax = max(vi for _, hi, vi, _, _ in order) if len(order) > 1 else 1
    if len(order) == 1:
        if not order[0][0]:
            return None  # first scan isn't luma (multi-scan file)
        # non-interleaved single-component scan: MCU = one block
        order = [(order[0][0], 1, 1, order[0][3], order[0][4])]
        mcx = (w + 7) // 8
        mcy = (h + 7) // 8
        ly_h, ly_w = mcy, mcx
    else:
        mcx = (w + 8 * hmax - 1) // (8 * hmax)
        mcy = (h + 8 * vmax - 1) // (8 * vmax)
        h0, v0 = by_id[luma_id][0], by_id[luma_id][1]
        ly_h, ly_w = mcy * v0, mcx * h0
    q0 = int(qt[by_id[luma_id][2]][_ZIGZAG0])
    dc_map = np.zeros((ly_h, ly_w), dtype=np.int32)
    preds = {cs: 0 for cs, _, _ in smap}
    it = iter(intervals)
    bits = _JpegBits(next(it))
    keys = [s[0] for s in smap]
    mcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if dri and mcu and mcu % dri == 0:
                bits = _JpegBits(next(it))
                preds = {k: 0 for k in keys}
            for (is_luma, hi, vi, dlut, alut), cs in zip(order, keys):
                for byi in range(vi):
                    for bxi in range(hi):
                        dc = _jpeg_decode_block(
                            bits, dlut, alut, preds[cs])
                        preds[cs] = dc
                        if is_luma:
                            # progressive DC scans code DC >> Al
                            dc_map[my * vi + byi, mx * hi + bxi] = dc << al
            mcu += 1
    # crop MCU padding blocks, dequantize, undo the level shift:
    # block mean = DC * qstep / 8 + 128 (DCT basis 0 is flat)
    dc_map = dc_map[: (h + 7) // 8, : (w + 7) // 8]
    return np.clip(dc_map.astype(np.float32) * (q0 / 8.0) + 128.0,
                   0.0, 255.0)


def _luma_grid_feature(luma: np.ndarray, dim: int) -> np.ndarray:
    """Mean-pool the luma plane to a g x g grid (g = isqrt(dim)),
    flatten, scale to [0, 1]; tile-resize if dim isn't a square."""
    g = max(1, int(dim ** 0.5))
    h, w = luma.shape
    ys = [h * i // g for i in range(g + 1)]
    xs = [w * i // g for i in range(g + 1)]
    cells = np.empty((g, g), dtype=np.float32)
    for i in range(g):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(g):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            cells[i, j] = luma[min(y0, h - 1):y1, min(x0, w - 1):x1].mean()
    return np.resize(cells.ravel(), dim).astype(np.float32) / 255.0


def image_feature_udf(dim: int = 64):
    """binary -> deterministic feature vector (array<float>).

    REAL path for 8-bit PNG (zlib-inflated IDAT, interlaced or not),
    uncompressed BMP, and baseline JPEG (DC-level Huffman decode — the
    dequantized DC terms ARE the 8x8 block means, which is exactly what
    this grid feature pools; progressive files decode their mandatory
    DC first scan): pixel decode + downsampled-luma grid (the feature
    responds to pixel CONTENT — trailing-byte changes that don't touch
    pixels leave it unchanged). Formats beyond these still need PIL
    (absent here) and fall back to the
    explicitly-fake md5-keyed projection. Whole batch runs inside one
    Arrow crossing; signature/batch shape identical to a real model's."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def featurize(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            blob = b or b""
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                luma = _decode_png_pixels(blob)
            elif blob[:2] == b"\xff\xd8":
                luma = _decode_jpeg_dc_luma(blob)
            else:
                luma = _decode_bmp_pixels(blob)
            if luma is not None:
                out.append(_luma_grid_feature(luma, dim))
                continue
            h = hashlib.md5(blob).digest()
            seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
            vec = np.resize(seed, dim) / 255.0  # deterministic fake embedding
            out.append(vec)
        return pd.Series(out)

    return featurize


VIDEO_META_SCHEMA = ("duration_s double, timescale int, n_tracks int, "
                     "format string")


def _iter_boxes(buf: bytes, start: int, end: int):
    """Walk ISO-BMFF (MP4) boxes: [size:4][type:4], 64-bit largesize
    when size == 1. Corrupt sizes terminate the walk, never loop."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i:i + 4], "big")
        typ = buf[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(buf[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:  # "to end of file" (legal only for the last box)
            size = end - i
        if size < hdr or i + size > end:
            return
        yield typ, i + hdr, i + size
        i += size


def _decode_mp4_meta(blob: bytes):
    """REAL container-level MP4/ISO-BMFF metadata (pure byte parsing —
    no codec library): movie duration/timescale from ``moov/mvhd``
    (version 0 and 1 layouts) and the track count. Returns None for
    non-MP4 or corrupt headers (caller falls back to the fake)."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        return None
    for typ, s, e in _iter_boxes(blob, 0, len(blob)):
        if typ != b"moov":
            continue
        timescale = duration = None
        n_tracks = 0
        for t2, s2, e2 in _iter_boxes(blob, s, e):
            if t2 == b"mvhd":
                if blob[s2] == 1:  # version 1: 64-bit times
                    if e2 - s2 >= 32:
                        timescale = int.from_bytes(blob[s2 + 20:s2 + 24],
                                                   "big")
                        duration = int.from_bytes(blob[s2 + 24:s2 + 32],
                                                  "big")
                    # truncated v1 payload: corrupt — do NOT fall back to
                    # the v0 layout (it would read the middle of the
                    # 64-bit mtime field as timescale)
                elif e2 - s2 >= 20:
                    timescale = int.from_bytes(blob[s2 + 12:s2 + 16], "big")
                    duration = int.from_bytes(blob[s2 + 16:s2 + 20], "big")
            elif t2 == b"trak":
                n_tracks += 1
        # range guard: the field is unsigned 32-bit but the output schema
        # is int32 — an unchecked value would fail Arrow conversion and
        # kill the task (same class the image path guards via _dims_ok)
        if timescale and timescale <= _INT32_MAX:
            return (duration / timescale, timescale, n_tracks, "mp4")
        return None
    return None


def _riff_chunks(buf: bytes, start: int, end: int):
    """Walk RIFF chunks: [fourcc:4][size:4 LE][data][pad-to-even].
    Corrupt sizes terminate the walk, never loop."""
    i = start
    while i + 8 <= end:
        cid = buf[i:i + 4]
        size = int.from_bytes(buf[i + 4:i + 8], "little")
        if i + 8 + size > end:
            return
        yield cid, i + 8, i + 8 + size
        i += 8 + size + (size & 1)


def _avi_mjpeg_frame_spans(blob: bytes):
    """(start, end) byte spans of the JPEG frames inside an AVI's
    ``LIST movi`` payload — Motion JPEG is the one mainstream video
    codec whose frames are plain JPEG images, so with the DC-level
    JPEG decoder the engine can extract REAL frame content with no
    codec library. Returns None when the blob isn't RIFF-AVI; [] when
    it is but carries no JPEG video chunks."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    spans = []
    for cid, s, e in _riff_chunks(blob, 12, len(blob)):
        if cid != b"LIST" or blob[s:s + 4] != b"movi":
            continue
        for fid, fs, fe in _riff_chunks(blob, s + 4, e):
            # '##dc' = compressed video chunk for stream ##
            if fid[2:4] == b"dc" and blob[fs:fs + 2] == b"\xff\xd8":
                spans.append((fs, fe))
    return spans


def _decode_avi_meta(blob: bytes):
    """REAL AVI metadata from the ``hdrl/avih`` main header:
    dwMicroSecPerFrame(+0), dwTotalFrames(+16), dwStreams(+24)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    for cid, s, e in _riff_chunks(blob, 12, len(blob)):
        if cid != b"LIST" or blob[s:s + 4] != b"hdrl":
            continue
        for hid, hs, he in _riff_chunks(blob, s + 4, e):
            if hid != b"avih" or he - hs < 28:
                continue
            usec = int.from_bytes(blob[hs:hs + 4], "little")
            total = int.from_bytes(blob[hs + 16:hs + 20], "little")
            streams = int.from_bytes(blob[hs + 24:hs + 28], "little")
            if not 0 < usec <= 10_000_000 or streams > _INT32_MAX:
                return None
            fps = round(1_000_000 / usec)
            return (total * usec / 1_000_000, int(fps), streams, "avi")
    return None


def decode_video_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """binary -> video container metadata via one mapInPandas stage.
    MP4/ISO-BMFF (box walk) and AVI (RIFF ``avih`` header) are parsed
    for REAL — container structure is codec-free; other containers
    (mkv/webm need EBML + codec probes absent here) fall back to a
    deterministic fake so plumbing stays testable."""
    schema = f"{id_col} {_col_type(df, id_col)}, {VIDEO_META_SCHEMA}"
    pruned = df.select(id_col, blob_col)

    def decode(blob: bytes):
        got = _decode_mp4_meta(blob) or _decode_avi_meta(blob)
        if got is not None:
            return got
        h = hashlib.md5(blob).digest()
        ts = (600, 1000, 90000)[h[0] % 3]
        dur = 1 + struct.unpack("<I", h[1:5])[0] % 7200
        return (float(dur), ts, 1 + h[5] % 3, "fake")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(b or b"") for b in pdf[blob_col]]
            out = pd.DataFrame(
                metas, columns=["duration_s", "timescale", "n_tracks",
                                "format"])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return pruned.mapInPandas(run, schema=schema)


def frame_sample(df: DataFrame, id_col: str, blob_col: str,
                 every_n: int = 30, max_frames: int = 64) -> DataFrame:
    """video binary -> one row per sampled frame (frame_no, frame_hash).

    REAL for AVI-MJPEG (RIFF walk finds the JPEG frame chunks;
    frame_no is the true frame index, frame_hash the md5 of the
    frame's bytes — content-derived, so re-muxing the same frames
    yields the same hashes). Other containers need ffmpeg (absent) and
    keep the labeled deterministic fake. Either way this demonstrates
    the 1->N ``mapInPandas`` expansion shape (UDTF-style) used for
    frame tables."""
    schema = f"{id_col} {_col_type(df, id_col)}, frame_no int, frame_hash string"
    pruned = df.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, hashes = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b or b""
                spans = _avi_mjpeg_frame_spans(blob)
                if spans:
                    # same per-row bound as frame_features: one long
                    # video must not stall its task (review round 5)
                    for f in list(range(0, len(spans),
                                        every_n))[:max_frames]:
                        fs, fe = spans[f]
                        ids.append(i)
                        frames.append(f)
                        hashes.append(hashlib.md5(blob[fs:fe]).hexdigest())
                    continue
                n_frames = 1 + len(blob) % 271
                for f in list(range(0, n_frames, every_n))[:max_frames]:
                    ids.append(i)
                    frames.append(f)
                    hashes.append(
                        hashlib.md5(blob + f.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_no": frames, "frame_hash": hashes}
            )

    return pruned.mapInPandas(run, schema=schema)


def frame_features(df: DataFrame, id_col: str, blob_col: str,
                   every_n: int = 30, dim: int = 64,
                   max_frames: int = 64) -> DataFrame:
    """video binary -> (frame_no, feature array<float>) per sampled
    frame: the video->embedding edge of a multimodal training
    pipeline. REAL for AVI-MJPEG — each sampled frame runs the DC-level
    JPEG decode + luma-grid feature (responds to frame CONTENT);
    other containers fall back to the labeled md5-keyed fake, one
    vector per sampled pseudo-frame, same shape. ``max_frames`` bounds
    the per-row output (and the JPEG scan budget bounds per-frame CPU)
    so one long video cannot stall its task."""
    schema = (f"{id_col} {_col_type(df, id_col)}, frame_no int, "
              f"feature array<float>")
    pruned = df.select(id_col, blob_col)

    def fake_vec(blob: bytes, f: int) -> np.ndarray:
        h = hashlib.md5(blob + f.to_bytes(4, "little")).digest()
        seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        return np.resize(seed, dim) / 255.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, feats = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                blob = b or b""
                spans = _avi_mjpeg_frame_spans(blob)
                if spans:
                    picked = list(range(0, len(spans), every_n))[:max_frames]
                    for f in picked:
                        fs, fe = spans[f]
                        luma = _decode_jpeg_dc_luma(blob[fs:fe])
                        ids.append(i)
                        frames.append(f)
                        feats.append(
                            _luma_grid_feature(luma, dim)
                            if luma is not None else fake_vec(blob, f))
                    continue
                n_frames = 1 + len(blob) % 271
                for f in list(range(0, n_frames, every_n))[:max_frames]:
                    ids.append(i)
                    frames.append(f)
                    feats.append(fake_vec(blob, f))
            yield pd.DataFrame(
                {id_col: ids, "frame_no": frames, "feature": feats})

    return pruned.mapInPandas(run, schema=schema)
