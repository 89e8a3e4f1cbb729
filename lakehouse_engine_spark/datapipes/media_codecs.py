"""Pure-numpy image codecs for container-native formats.

Real decode/encode with no codec library — binary PPM (P6), uncompressed
24/32-bit BI_RGB BMP, **baseline PNG** (stdlib zlib inflate + numpy
un-filtering; 8-bit gray/gray+alpha/palette/RGB/RGBA, all five scanline
filters), **GIF** (full LZW, interlace, local/global color tables), and
**baseline JPEG** (`media_jpeg.py`: canonical Huffman entropy decode +
batched IDCT) — so the multimodal operators do REAL pixel work
(dimensions, channel stats, resize, thumbnails) end-to-end in this
container, including genuinely compressed formats. Audio: PCM WAV
(8/16/32-bit), G.711 A-law/μ-law, and IMA ADPCM. Remaining formats
(WebP; progressive/12-bit JPEG; 16-bit/Adam7 PNG; mp3/flac) route
through the pluggable decoder registry below — Pillow self-registers
when importable (absent in this container); with no registered decoder
they fall back to the documented strict-mode stub.

The heavy math is vectorized numpy (frombuffer reshapes, palette
gathers, einsum IDCT, LUT expansion); only the inherently serial
entropy/differential loops (LZW, Huffman, ADPCM) run in plain Python at
fixture-grade throughput. These run inside Arrow-batched ``mapInPandas``
workers, so the per-batch cost is a handful of numpy kernel calls plus
those loops.
"""

from __future__ import annotations

import struct
from typing import Callable, Dict, Optional, Tuple

import numpy as np

# ------------------------------------------------------------------ seam
# Compressed codecs plug in here: media-type → (bytes → (H, W, 3) uint8).
# Pillow registers itself for JPEG/PNG/WebP when importable (a real
# cluster image); tests inject deterministic fakes. The multimodal
# transformers snapshot this registry at PLAN-BUILD time and carry it
# into the mapInPandas closure, so driver-registered decoders (including
# closures cloudpickle serializes by value) reach executors even though
# workers re-import this module fresh.
_EXTRA_DECODERS: Dict[str, Callable[[bytes], np.ndarray]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Register a decoder for a sniffed media type (e.g. ``image/jpeg``)."""
    _EXTRA_DECODERS[media_type] = fn


def unregister_decoder(media_type: str) -> None:
    _EXTRA_DECODERS.pop(media_type, None)


def available_decoders() -> Dict[str, Callable[[bytes], np.ndarray]]:
    """Snapshot of the registry — capture this into UDF closures."""
    return dict(_EXTRA_DECODERS)


# Video frame extractors: media-type → (bytes, max_frames) → list of frame
# payloads (each itself a decodable image, e.g. PPM). ffmpeg/PyAV plugs in
# on a real cluster; tests inject deterministic fakes. Same plan-time
# snapshot discipline as image decoders.
_FRAME_EXTRACTORS: Dict[str, Callable[[bytes, int], list]] = {}


def register_frame_extractor(
    media_type: str, fn: Callable[[bytes, int], list]
) -> None:
    _FRAME_EXTRACTORS[media_type] = fn


def unregister_frame_extractor(media_type: str) -> None:
    _FRAME_EXTRACTORS.pop(media_type, None)


def available_frame_extractors() -> Dict[str, Callable[[bytes, int], list]]:
    return dict(_FRAME_EXTRACTORS)


def _pillow_decode(b: bytes) -> np.ndarray:
    import io

    from PIL import Image  # noqa: WPS433 — optional dependency

    return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))


try:  # Pillow is absent in this container; on a real cluster it plugs in
    import PIL  # noqa: F401

    for _mt in ("image/jpeg", "image/png", "image/webp"):
        register_decoder(_mt, _pillow_decode)
except ImportError:
    pass


def sniff_media(b: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if not b:
        return "empty"
    if b[:2] == b"P6":
        return "image/x-portable-pixmap"
    if b[:4] == b"GIF8":
        return "image/gif"
    if b[:2] == b"BM":
        return "image/bmp"
    if b[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return "image/webp"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "video/avi"
    if b[:9] == b"YUV4MPEG2":
        return "video/y4m"
    if b[4:8] == b"ftyp":
        return "video/mp4"
    if b[:4] == b"\x1a\x45\xdf\xa3":
        return "video/webm"
    return "application/octet-stream"


def decode_image(
    b: bytes,
    extra_decoders: Optional[Dict[str, Callable[[bytes], np.ndarray]]] = None,
) -> Optional[Tuple[np.ndarray, str]]:
    """Decode an image payload to an (H, W, 3) uint8 array + codec name.

    PPM/BMP decode natively (pure numpy); other media types route through
    ``extra_decoders``. Returns ``None`` for payloads with no available
    decoder AND for zero-dimension rasters ("P6\\n0 0\\n255\\n" is
    well-formed but a (0, 0, 3) array crashes every downstream kernel —
    thumbnail pooling, resize gather — so it routes to the NULL/
    on_unsupported path like any other undecodable payload; r14 review
    finding)."""
    out = _decode_image_any(b, extra_decoders)
    if out is not None and out[0].size == 0:
        return None
    return out


def _decode_image_any(
    b: bytes,
    extra_decoders: Optional[Dict[str, Callable[[bytes], np.ndarray]]] = None,
) -> Optional[Tuple[np.ndarray, str]]:
    """Decode an image payload to an (H, W, 3) uint8 array + codec name.

    PPM/BMP decode natively (pure numpy); other media types route through
    ``extra_decoders`` (pass a :func:`available_decoders` snapshot from
    the driver — falls back to this process's registry when omitted).
    Returns ``None`` for payloads with no available decoder (callers
    decide whether that's an error or a skip).
    """
    kind = sniff_media(b)
    if kind == "image/x-portable-pixmap":
        # same NULL-routing contract as the compressed formats below: a
        # corrupt payload in a corpus yields None (NULL fields / strict-
        # mode raise via on_unsupported), never an uncaught executor error
        try:
            return _decode_ppm(b), "ppm"
        except (ValueError, IndexError, struct.error):
            return None
    if kind == "image/bmp":
        try:
            return _decode_bmp(b), "bmp"
        except (ValueError, IndexError, struct.error):
            return None
    if kind == "image/png":
        # native stdlib-zlib decode for baseline 8-bit profiles; 16-bit /
        # interlaced fall through to a registered decoder (Pillow) inside
        # _decode_png. Malformed-or-unsupported with no fallback → None:
        # a corrupt payload in a 100 TB corpus must surface as NULL fields
        # (on_unsupported routing), never kill the job by default.
        import zlib

        try:
            return _decode_png(b, extra_decoders), "png"
        except (ValueError, KeyError, IndexError, struct.error, zlib.error):
            return None
    if kind == "image/gif":
        try:
            return _decode_gif(b), "gif"
        except (ValueError, KeyError, IndexError, struct.error):
            return None
    if kind == "image/jpeg":
        # native pure-numpy baseline decode; progressive/12-bit/arithmetic
        # and malformed payloads fall through to a registered decoder
        # (Pillow) when present, else None — same NULL-routing contract
        from lakehouse_engine_spark.datapipes.media_jpeg import decode_jpeg

        try:
            return decode_jpeg(b), "jpeg"
        except (ValueError, KeyError, IndexError, struct.error):
            registry = _EXTRA_DECODERS if extra_decoders is None else extra_decoders
            fn = registry.get("image/jpeg")
            if fn is not None:
                arr = np.asarray(fn(b), dtype=np.uint8)
                if arr.ndim != 3 or arr.shape[2] != 3:
                    raise ValueError(
                        f"decoder for {kind} must return (H, W, 3) uint8,"
                        f" got {arr.shape}"
                    )
                return arr, "jpeg"
            return None
    registry = _EXTRA_DECODERS if extra_decoders is None else extra_decoders
    fn = registry.get(kind)
    if fn is not None:
        arr = np.asarray(fn(b), dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError(
                f"decoder for {kind} must return (H, W, 3) uint8, got {arr.shape}"
            )
        return arr, kind.rsplit("/", 1)[-1]
    return None


def _decode_ppm(b: bytes) -> np.ndarray:
    # P6 header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster.
    # '#' comments may appear between tokens.
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        tokens.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (expect 8-bit)")
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def _decode_bmp(b: bytes) -> np.ndarray:
    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER: offset@10, width@18,
    # height@22, bpp@28, compression@30. Rows are bottom-up, 4-byte padded.
    data_offset = struct.unpack_from("<I", b, 10)[0]
    width = struct.unpack_from("<i", b, 18)[0]
    height = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"BMP unsupported: compression={compression} bpp={bpp}")
    flip = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


# --------------------------------------------------------------- GIF
# Real GIF87a/89a first-frame decode: logical-screen + image descriptors,
# global/local color tables, full LZW decompression (variable code width,
# clear/EOI, 12-bit dictionary cap), Adam-less 4-pass interlace reorder.
# Pure Python bit twiddling for the (inherently serial) LZW stream, numpy
# palette gather for the pixels. Animations decode as their FIRST frame.


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary: code -> byte sequence; rebuilt on CLEAR
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    width = min_code_size + 1
    next_code = eoi + 1
    acc = nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(base)
                width = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF: corrupt LZW stream")
            out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
            n_out += len(entry)
            if n_out >= n_pixels:
                return out[:n_pixels]
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out[:n_out]


def _decode_gif(b: bytes) -> np.ndarray:
    if b[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", b, 6)
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor — decode this first frame
            left, top, w, h = struct.unpack_from("<HHHH", b, pos + 1)
            iflags = b[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(
                    b, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(-1, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = b[pos]
            pos += 1
            chunks = []
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunks.append(b[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _gif_lzw_decode(min_code, b"".join(chunks), w * h)
            if len(idx) < w * h:
                raise ValueError("GIF: truncated pixel data")
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                deinter = np.empty_like(grid)
                deinter[np.array(order)] = grid
                grid = deinter
            return ct[grid]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image descriptor")


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 as a single-frame GIF with an exact 256-entry
    color table built from the image's distinct colors (must be ≤256 —
    fixtures; palette formats are exact, unlike JPEG). The LZW stream is a
    real variable-width LZW encoder: the dictionary grows per emitted code
    with GIF's "early change" width widening, and at the 12-bit ceiling
    it simply stops adding entries (deferred clear — valid per spec) — so
    decode exercises dictionary growth and early-change widening, plus
    CLEAR handling via the initial CLEAR code."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"encode_gif: {len(colors)} colors > 256")
    bits = max(int(np.ceil(np.log2(max(len(colors), 2)))), 1)
    table_bits = max(bits, 1)
    n_table = 1 << table_bits
    palette = np.zeros((n_table, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    min_code = max(table_bits, 2)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    next_code = eoi + 1
    dic = {bytes([i]): i for i in range(clear)}
    acc = nbits = 0
    stream = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # real LZW with "early change" width growth (the GIF convention: the
    # encoder widens one code earlier than its own counter suggests,
    # because the decoder's dictionary lags one entry behind)
    emit(clear)
    prev = b""
    for px in idx.reshape(-1).tolist():
        cur = prev + bytes([px])
        if cur in dic:
            prev = cur
            continue
        emit(dic[prev])
        if next_code < 4096:
            dic[cur] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = bytes([px])
    if prev:
        emit(dic[prev])
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF0 | (table_bits - 1), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# IMA ADPCM step-size table + index adjustments (IMA/DVI spec)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _decode_ima_adpcm(data: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format 0x11): each block starts with a per-channel
    4-byte header (predictor int16, step index, reserved), then interleaved
    4-byte channel words of eight 4-bit nibbles each. The differential
    recurrence is inherently serial per channel — plain Python over
    nibbles, fixture-grade throughput (real corpora route through ffmpeg
    at the registry boundary like video)."""
    if block_align <= 0:
        raise ValueError("ADPCM: invalid block align")
    out: List[float] = []
    for bstart in range(0, len(data), block_align):
        block = data[bstart : bstart + block_align]
        if len(block) < 4 * channels:
            break
        preds, idxs = [], []
        chans: List[List[float]] = [[] for _ in range(channels)]
        for c in range(channels):
            pred = struct.unpack_from("<h", block, c * 4)[0]
            idx = block[c * 4 + 2]
            preds.append(pred)
            idxs.append(min(max(idx, 0), 88))
            chans[c].append(pred / 32768.0)
        pos = 4 * channels
        # interleaved: 4 bytes (8 nibbles) per channel, round-robin
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                word = block[pos : pos + 4]
                pos += 4
                for byte in word:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = int(_IMA_STEPS[idxs[c]])
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = min(max(preds[c], -32768), 32767)
                        idxs[c] = min(max(idxs[c] + int(_IMA_INDEX_ADJ[nib & 7]), 0), 88)
                        chans[c].append(preds[c] / 32768.0)
        n = min(len(ch) for ch in chans)
        for i in range(n):
            for c in range(channels):
                out.append(chans[c][i])
    return np.asarray(out, dtype=np.float32)


def encode_ima_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode (frames, channels) float32 [-1,1] as an IMA ADPCM WAV
    (format 0x11) — the standard encoder recurrence, for fixtures and
    round-trip tests."""
    arr = np.clip(samples, -1.0, 1.0)
    if arr.ndim == 1:
        arr = arr[:, None]
    frames, channels = arr.shape
    pcm = np.rint(arr * 32767.0).astype(np.int64)
    block_align = 4 * channels + ((samples_per_block - 1) // 8) * 4 * channels
    blocks = bytearray()
    f = 0
    while f < frames:
        take = min(samples_per_block, frames - f)
        preds = [int(pcm[f, c]) for c in range(channels)]
        idxs = [0 for _ in range(channels)]
        block = bytearray()
        for c in range(channels):
            block += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibbles: List[List[int]] = [[] for _ in range(channels)]
        for i in range(1, take):
            for c in range(channels):
                step = int(_IMA_STEPS[idxs[c]])
                delta = int(pcm[f + i, c]) - preds[c]
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # reconstruct exactly as the decoder will
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                preds[c] += -diff if nib & 8 else diff
                preds[c] = min(max(preds[c], -32768), 32767)
                idxs[c] = min(max(idxs[c] + int(_IMA_INDEX_ADJ[nib & 7]), 0), 88)
                nibbles[c].append(nib)
        # pad each channel to a multiple of 8 nibbles
        for c in range(channels):
            while len(nibbles[c]) % 8:
                nibbles[c].append(0)
        n_words = len(nibbles[0]) // 8
        for wi in range(n_words):
            for c in range(channels):
                chunk = nibbles[c][wi * 8 : wi * 8 + 8]
                for j in range(0, 8, 2):
                    block.append(chunk[j] | (chunk[j + 1] << 4))
        block += b"\x00" * (block_align - len(block))
        blocks += block
        f += take
    hdr = b"RIFF" + struct.pack("<I", 48 + len(blocks)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 0x11, channels, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4
    )
    hdr += b"fact" + struct.pack("<II", 4, frames)  # true frame count
    hdr += b"data" + struct.pack("<I", len(blocks))
    return hdr + bytes(blocks)


def _build_g711_luts() -> Tuple[np.ndarray, np.ndarray]:
    """ITU-T G.711 byte→float32 decode tables (telephony-corpus WAVs).
    Built once at import: 256 entries each, decode is then one np.take."""
    alaw = np.empty(256, dtype=np.float32)
    mulaw = np.empty(256, dtype=np.float32)
    for byte in range(256):
        # A-law: toggle even bits, then segment/mantissa expansion
        a = byte ^ 0x55
        sign = -1.0 if a & 0x80 else 1.0
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        mag = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
        alaw[byte] = sign * mag / 32768.0
        # mu-law: complement, biased exponent expansion
        m = ~byte & 0xFF
        sign = -1.0 if m & 0x80 else 1.0
        exp = (m >> 4) & 0x07
        mant = m & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        mulaw[byte] = sign * mag / 32768.0
    return alaw, mulaw


_ALAW_LUT, _MULAW_LUT = _build_g711_luts()


def decode_wav(b: bytes) -> Optional[Tuple[np.ndarray, int, str]]:
    """Decode a PCM WAV payload to ``(samples, sample_rate, codec)``.

    ``samples`` is float32 of shape (frames, channels), normalized to
    [-1, 1] (int8 is unsigned per the WAV spec; 16/32-bit are signed
    little-endian). Pure numpy — a RIFF chunk walk + ``np.frombuffer``
    reshape, no per-sample Python. Returns ``None`` for non-WAV payloads;
    raises for WAV variants that are not integer PCM (compressed codecs
    plug in at this boundary on a real cluster, like images)."""
    if sniff_media(b) != "audio/wav":
        return None
    # RIFF chunk walk: [id(4) size(4) payload(size, word-aligned)] from 12
    i, fmt, data, fact_frames = 12, None, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", b, i + 8)
        elif cid == b"fact":
            fact_frames = struct.unpack_from("<I", b, i + 8)[0]
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format == 0x11:  # IMA ADPCM: 4-bit differential blocks
        samples = _decode_ima_adpcm(data, channels, _align)
        frames = len(samples) // channels
        if fact_frames is not None:  # drop block-padding tail samples
            frames = min(frames, fact_frames)
        return (
            samples[: frames * channels].reshape(frames, channels),
            sample_rate,
            "ima_adpcm",
        )
    if audio_format == 6:  # G.711 A-law: one byte per sample, LUT decode
        samples = _ALAW_LUT[np.frombuffer(data, dtype=np.uint8)]
        codec = "alaw"
    elif audio_format == 7:  # G.711 mu-law
        samples = _MULAW_LUT[np.frombuffer(data, dtype=np.uint8)]
        codec = "mulaw"
    elif audio_format == 1 and bits in (8, 16, 32):
        if bits == 8:  # unsigned per spec
            raw = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            samples = (raw - 128.0) / 128.0
        else:
            dt = np.int16 if bits == 16 else np.int32
            raw = np.frombuffer(data, dtype=np.dtype(dt).newbyteorder("<"))
            samples = raw.astype(np.float32) / float(2 ** (bits - 1))
        codec = f"pcm{bits}"
    else:
        raise ValueError(
            f"WAV unsupported: format={audio_format} bits={bits}"
            " (integer PCM / G.711 a-law / mu-law only)"
        )
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), sample_rate, codec


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (frames, channels) float32 [-1, 1] as 16-bit PCM WAV."""
    arr = np.clip(samples, -1.0, 1.0)
    # rint, not truncation: truncating doubles the quantization error
    # (caught by the hypothesis roundtrip property)
    pcm = np.rint(arr * 32767.0).astype("<i2")
    data = pcm.tobytes()
    channels = pcm.shape[1] if pcm.ndim == 2 else 1
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


# --------------------------------------------------------------- PNG
# Real PNG, no codec library: the compression layer is stdlib zlib and
# everything else is chunk walking + per-row un-filtering. Covers the
# baseline 8-bit non-interlaced profiles (gray / gray+alpha / palette /
# RGB / RGBA); 16-bit and Adam7 route to the decoder registry (Pillow on
# a real cluster) and raise a guided error here otherwise.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# whole-image switch for _png_unfilter: below this stride the pure-python
# bytearray path wins (numpy pays ~20µs of fixed per-row-array cost that
# dwarfs tiny rows — r14 profiling: 5000 thumbnail PNGs spent 0.94 s of
# their 1.6 s decode budget in the numpy unfilter; bytearray indexing is
# also ~5x cheaper per byte than np scalar indexing on the avg/paeth rows)
_UNFILTER_PY_MAX_STRIDE = 512


def _png_unfilter_py(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Pure-python unfilter for small strides — byte-identical to the
    vectorized path (pinned against it in tests over random images per
    filter type); all arithmetic is exact mod-256 on ints."""
    src = raw.tobytes()
    out = bytearray(h * stride)
    for y in range(h):
        base = y * (1 + stride)
        f = src[base]
        line = src[base + 1 : base + 1 + stride]
        o = y * stride
        po = o - stride
        if f == 0:
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            if y == 0:
                out[o : o + stride] = line
            else:
                for x in range(stride):
                    out[o + x] = (line[x] + out[po + x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[po + x] if y > 0 else 0
                out[o + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[po + x] if y > 0 else 0
                ul = out[po + x - bpp] if (y > 0 and x >= bpp) else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                out[o + x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, stride)


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering. ``raw`` is the inflated stream of
    ``h`` rows, each ``1 + stride`` bytes (filter tag + data). Small
    strides route to the pure-python path (see
    ``_UNFILTER_PY_MAX_STRIDE``). Filters none/sub/up are inverted with
    vector ops (sub is a cumulative sum mod 256 over per-channel lanes);
    average/paeth carry an inherently sequential intra-row dependency, so
    those rows fall back to a per-byte loop — correct for any input, and
    absent entirely from payloads our own encoder produces unless asked
    for."""
    if stride <= _UNFILTER_PY_MAX_STRIDE:
        return _png_unfilter_py(raw, h, stride, bpp)
    rows = raw.reshape(h, 1 + stride)
    tags, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        f = int(tags[y])
        line = data[y].astype(np.uint16)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp] → per-lane cumsum
            rec = line.copy()
            lanes = rec[: (stride // bpp) * bpp].reshape(-1, bpp)
            rec[: lanes.size] = (
                np.cumsum(lanes, axis=0, dtype=np.uint64) % 256
            ).reshape(-1)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.zeros(stride, dtype=np.uint16)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint16)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (line[x] + _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png(
    b: bytes,
    extra_decoders: Optional[Dict[str, Callable[[bytes], np.ndarray]]] = None,
) -> np.ndarray:
    """Decode baseline PNG to (H, W, 3) uint8 RGB (alpha dropped, palette
    expanded, gray stacked). Unsupported variants (16-bit, interlaced) are
    retried through a registered ``image/png`` decoder before raising."""
    import zlib

    def _fallback(reason: str) -> np.ndarray:
        registry = _EXTRA_DECODERS if extra_decoders is None else extra_decoders
        fn = registry.get("image/png")
        if fn is not None:
            return np.asarray(fn(b), dtype=np.uint8)
        raise ValueError(f"PNG unsupported natively ({reason}); plug Pillow in")

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack_from(">I", b, pos), b[pos + 4 : pos + 8]
        chunk = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        return _fallback(f"bit depth {depth}, interlace {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: nonstandard compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if channels is None:
        raise ValueError(f"PNG: unknown color type {ctype_n}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if raw.size != h * (1 + stride):
        raise ValueError("PNG: inflated size mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if ctype_n == 2:
        return px.copy()
    if ctype_n == 6:
        return px[:, :, :3].copy()
    if ctype_n == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_n == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if plte is None:
        raise ValueError("PNG: palette image without PLTE")
    return plte[px[:, :, 0]]


def encode_png(arr: np.ndarray, row_filters: Optional[list] = None) -> bytes:
    """Encode (H, W, 3) uint8 RGB as PNG (color type 2, bit depth 8).
    ``row_filters`` optionally assigns a filter type (0-4) per row —
    fixtures use this to exercise every un-filter path; default is
    filter 0 everywhere (fastest, and zlib still squeezes flat rows)."""
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = w * 3
    flat = arr.reshape(h, stride).astype(np.int16)
    lines = []
    for y in range(h):
        f = int(row_filters[y]) if row_filters is not None else 0
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int16)
        left = np.concatenate([np.zeros(3, dtype=np.int16), cur[:-3]])
        ul = np.concatenate([np.zeros(3, dtype=np.int16), prev[:-3]])
        if f == 0:
            out = cur
        elif f == 1:
            out = (cur - left) % 256
        elif f == 2:
            out = (cur - prev) % 256
        elif f == 3:
            out = (cur - ((left + prev) >> 1)) % 256
        elif f == 4:
            pred = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                pred[x] = _paeth(int(left[x]), int(prev[x]), int(ul[x]))
            out = (cur - pred) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        lines.append(bytes([f]) + out.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (frames, channels) float samples —
    vectorized ``np.interp`` per channel, no per-sample Python. The
    training-pipeline normalization step (e.g. everything → 16 kHz);
    proper band-limited resampling plugs in at the same boundary."""
    frames = samples.shape[0]
    if src_rate == dst_rate or frames == 0:
        return samples
    out_n = max(int(round(frames * dst_rate / src_rate)), 1)
    src_pos = np.arange(frames, dtype=np.float64)
    dst_pos = np.arange(out_n, dtype=np.float64) * (frames - 1) / max(out_n - 1, 1)
    return np.stack(
        [np.interp(dst_pos, src_pos, samples[:, c]) for c in range(samples.shape[1])],
        axis=1,
    ).astype(np.float32)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index gather (pure numpy)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def thumbnail_feature(arr: np.ndarray, side: int = 8) -> np.ndarray:
    """``side×side`` grayscale mean-pool thumbnail, flattened to [0, 1] —
    the classic perceptual-hash precursor, a real (if simple) visual
    feature. Block means via ``np.add.reduceat`` (no Python loops); images
    smaller than ``side`` fall back to nearest-neighbor upsampling."""
    gray = arr.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    if h < side or w < side:
        small = resize_nearest(gray[:, :, None], side, side)[:, :, 0]
        return (small / 255.0).reshape(-1)
    ye = np.arange(side + 1) * h // side
    xe = np.arange(side + 1) * w // side
    pooled = np.add.reduceat(gray, ye[:-1], axis=0) / np.diff(ye)[:, None]
    pooled = np.add.reduceat(pooled, xe[:-1], axis=1) / np.diff(xe)[None, :]
    return (pooled / 255.0).reshape(-1)


# ------------------------------------------------------------------ Y4M
# YUV4MPEG2 — the codec-FREE video container (raw planar YUV frames with a
# text header), the video analogue of PPM for images: a real format
# (ffmpeg -f yuv4mpegpipe emits it) parseable with numpy alone. This makes
# the video leg of the pipeline real end-to-end in this container — sniff
# → frame extraction → YUV→RGB → the image feature pipeline — while
# compressed codecs (H.264/VP9) remain the documented ffmpeg/PyAV
# registry boundary.

def decode_y4m(b: bytes, max_frames: int = 16):
    """Parse a YUV4MPEG2 stream: returns (frames, width, height) with
    ``frames`` a list of (H, W, 3) uint8 RGB arrays (BT.601 limited-range
    conversion). Supports C420 (default when absent), C420jpeg/C420mpeg2
    (same layout), and C444. Raises ValueError on malformed input."""
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = b.find(b"\n")
    if nl < 0:
        raise ValueError("y4m: unterminated stream header")
    width = height = None
    subsampling = "420"
    for tok in b[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"C":
            s = val.decode("ascii", "replace")
            if s.startswith("420"):
                subsampling = "420"
            elif s == "444":
                subsampling = "444"
            else:
                raise ValueError(f"y4m: unsupported chroma {s!r}")
    if not width or not height:
        raise ValueError("y4m: missing W/H in stream header")
    if subsampling == "420":
        if width % 2 or height % 2:
            raise ValueError("y4m: C420 needs even dimensions")
        ysz, csz, cw, ch = width * height, (width // 2) * (height // 2), width // 2, height // 2
    else:
        ysz = csz = width * height
        cw, ch = width, height
    frames = []
    pos = nl + 1
    while pos < len(b) and len(frames) < max_frames:
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m: bad FRAME header")
        pos = fnl + 1
        end = pos + ysz + 2 * csz
        if end > len(b):
            raise ValueError("y4m: truncated frame payload")
        y = np.frombuffer(b[pos : pos + ysz], np.uint8).reshape(height, width)
        u = np.frombuffer(b[pos + ysz : pos + ysz + csz], np.uint8).reshape(ch, cw)
        v = np.frombuffer(b[pos + ysz + csz : end], np.uint8).reshape(ch, cw)
        if subsampling == "420":
            u = u.repeat(2, axis=0).repeat(2, axis=1)
            v = v.repeat(2, axis=0).repeat(2, axis=1)
        frames.append(_yuv_to_rgb(y, u, v))
        pos = end
    return frames, width, height


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YCbCr → RGB, rounded and clipped to uint8."""
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    uf = (u.astype(np.float64) - 128.0) * (255.0 / 224.0)
    vf = (v.astype(np.float64) - 128.0) * (255.0 / 224.0)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    bch = yf + 1.772 * uf
    return np.clip(
        np.round(np.stack([r, g, bch], axis=-1)), 0, 255
    ).astype(np.uint8)


def encode_y4m(frames, subsampling: str = "444") -> bytes:
    """Encode (H, W, 3)-RGB-as-YUV-source test material: takes a list of
    (y, u, v) plane tuples (uint8 arrays) and wraps them in a YUV4MPEG2
    stream — test/probe constructor, the inverse of :func:`decode_y4m`'s
    parsing (not a color-space encoder)."""
    if not frames:
        raise ValueError("encode_y4m: need at least one frame")
    y0 = frames[0][0]
    h, w = y0.shape
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (
        w, h, subsampling.encode(),
    )
    out = [head]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(y, np.uint8).tobytes())
        out.append(np.ascontiguousarray(u, np.uint8).tobytes())
        out.append(np.ascontiguousarray(v, np.uint8).tobytes())
    return b"".join(out)


def _extract_y4m_frames(b: bytes, max_frames: int) -> list:
    """Default frame extractor for video/y4m: real decode → PPM payloads
    (each frame feeds the image pipeline unchanged)."""
    frames, _, _ = decode_y4m(b, max_frames)
    return [encode_ppm(f) for f in frames]


register_frame_extractor("video/y4m", _extract_y4m_frames)


# ------------------------------------------------------------------ AVI
def extract_avi_frames(b: bytes, max_frames: int = 16) -> list:
    """Real RIFF/AVI container walk: returns the payloads of the video
    stream chunks (fourcc ``..db`` uncompressed / ``..dc`` compressed)
    inside the ``movi`` LIST, in stream order. Each payload is whatever
    the stream carries — JPEG bytes for an MJPEG AVI (decoded downstream
    by the image registry / Pillow seam), raw DIBs for ``..db``. The
    CONTAINER parse is complete and dependency-free; only the per-frame
    codec remains a registry boundary."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    frames: list = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end and len(frames) < max_frames:
            fourcc = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError("avi: truncated chunk")
            if fourcc == b"LIST":
                list_type = buf[data_start : data_start + 4]
                if list_type in (b"movi", b"rec "):
                    walk(buf, data_start + 4, data_end)
                # other lists (hdrl/strl) carry no frames — skip
            elif fourcc[2:4] in (b"db", b"dc") and fourcc[:2].isdigit():
                frames.append(bytes(buf[data_start:data_end]))
            pos = data_end + (size & 1)  # chunks pad to even offsets

    walk(b, 12, len(b))
    return frames


def encode_avi(frame_payloads: list) -> bytes:
    """Wrap frame payloads as a minimal valid AVI (one ``00dc`` chunk per
    frame inside a ``movi`` LIST) — test/probe constructor for the
    container walk, not a codec."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + len(data).to_bytes(4, "little") + data + (
            b"\x00" if len(data) & 1 else b""
        )

    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frame_payloads)
    body = b"AVI " + chunk(b"LIST", movi)
    return chunk(b"RIFF", body)


register_frame_extractor("video/avi", extract_avi_frames)
