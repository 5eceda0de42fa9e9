"""Minimal multiband TIFF reader/writer (pure numpy).

The runtime image here has no GDAL/tifffile, so the framework carries its own
baseline-TIFF codec for the GeoTIFF-shaped inputs/outputs the reference reads
and writes through GDAL (reference LBDRNdataset.py:71-89,93; decode.py:74-76).

Scope: grayscale/multiband uint8/uint16/float32/float64, uncompressed or
Deflate, chunky (PlanarConfiguration=1) or planar (=2), strip-based, both
endiannesses on read.  Writes little-endian chunky uncompressed strips.
Arrays are CHW (band-major), matching GDAL's ReadAsArray convention.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids
_W, _H = 256, 257
_BITS = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SPP = 277  # samples per pixel
_ROWS_PER_STRIP = 278
_STRIP_COUNTS = 279
_PLANAR = 284
_EXTRA_SAMPLES = 338
_SAMPLE_FORMAT = 339

_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first codes, early-change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table = None
    code_len = 9
    prev = None
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    while True:
        while bitcnt < code_len and pos < n:
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        if bitcnt < code_len:
            break
        code = (bitbuf >> (bitcnt - code_len)) & ((1 << code_len) - 1)
        bitcnt -= code_len
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            code_len = 9
            prev = None
            continue
        if code == EOI:
            break
        if table is None:
            raise ValueError("LZW stream missing initial clear code")
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early-change: bump width one code before the table fills
        if len(table) + 1 >= (1 << code_len) and code_len < 12:
            code_len += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            out += data[i : i + 1] * (257 - b)
            i += 1
    return bytes(out)


def _read_ifd_entries(buf: bytes, off: int, en: str):
    (count,) = struct.unpack_from(en + "H", buf, off)
    entries = {}
    for i in range(count):
        tag, typ, n = struct.unpack_from(en + "HHI", buf, off + 2 + i * 12)
        val_off = off + 2 + i * 12 + 8
        size = _TYPE_SIZES.get(typ, 1) * n
        if size > 4:
            (ptr,) = struct.unpack_from(en + "I", buf, val_off)
            raw = buf[ptr : ptr + size]
        else:
            raw = buf[val_off : val_off + 4][:size]
        if typ == 3:
            vals = list(struct.unpack(en + f"{n}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(en + f"{n}I", raw))
        elif typ == 1:
            vals = list(raw)
        elif typ == 5:  # rational
            parts = struct.unpack(en + f"{2*n}I", raw)
            vals = [parts[2 * k] / max(parts[2 * k + 1], 1) for k in range(n)]
        else:
            vals = [raw]
        entries[tag] = vals
    (next_ifd,) = struct.unpack_from(en + "I", buf, off + 2 + count * 12)
    return entries, next_ifd


def read_tiff(path: str) -> np.ndarray:
    """Read a TIFF file into a CHW numpy array (HW squeezed to 1 band kept as CHW)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        en = "<"
    elif buf[:2] == b"MM":
        en = ">"
    else:
        raise ValueError(f"{path}: not a TIFF file")
    (magic,) = struct.unpack_from(en + "H", buf, 2)
    if magic != 42:
        raise ValueError(f"{path}: bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack_from(en + "I", buf, 4)
    e, _ = _read_ifd_entries(buf, ifd_off, en)

    width, height = e[_W][0], e[_H][0]
    spp = e.get(_SPP, [1])[0]
    bits = e.get(_BITS, [1])[0]
    comp = e.get(_COMPRESSION, [1])[0]
    planar = e.get(_PLANAR, [1])[0]
    sfmt = e.get(_SAMPLE_FORMAT, [1])[0]
    rows_per_strip = e.get(_ROWS_PER_STRIP, [height])[0]
    offsets = e[_STRIP_OFFSETS]
    counts = e[_STRIP_COUNTS]

    if comp not in (1, 5, 8, 32773, 32946):
        raise ValueError(f"{path}: unsupported TIFF compression {comp}")
    predictor = e.get(_PREDICTOR, [1])[0]
    if sfmt == 1:
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits]
    elif sfmt == 2:
        dtype = {8: np.int8, 16: np.int16, 32: np.int32}[bits]
    elif sfmt == 3:
        dtype = {32: np.float32, 64: np.float64}[bits]
    else:
        raise ValueError(f"{path}: unsupported sample format {sfmt}")
    dtype = np.dtype(dtype).newbyteorder(en)

    data = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = buf[off : off + cnt]
        if comp in (8, 32946):
            chunk = zlib.decompress(chunk)
        elif comp == 5:
            chunk = _lzw_decode(chunk)
        elif comp == 32773:
            chunk = _packbits_decode(chunk)
        data += chunk
    arr = np.frombuffer(bytes(data), dtype=dtype)
    arr = arr.astype(dtype.newbyteorder("="))
    if predictor == 2:
        # horizontal differencing predictor: undo per-row cumulative sum
        n = height * width * spp
        if planar == 1:
            rows = arr[:n].reshape(height, width, spp)
            arr = np.cumsum(rows.astype(np.int64), axis=1).astype(arr.dtype).ravel()
        else:
            rows = arr[:n].reshape(spp * height, width)
            arr = np.cumsum(rows.astype(np.int64), axis=1).astype(arr.dtype).ravel()

    if planar == 1:
        n = height * width * spp
        arr = arr[:n].reshape(height, width, spp).transpose(2, 0, 1)
    else:
        # planar: strips cover band 0's rows, then band 1's, ...
        n = height * width * spp
        arr = arr[:n].reshape(spp, height, width)
    _ = rows_per_strip
    return np.ascontiguousarray(arr)


def write_tiff(path: str, array: np.ndarray, rows_per_strip: int = 256) -> None:
    """Write a CHW (or HW) array as a chunky little-endian uncompressed TIFF.

    Mirrors the role of the reference's ``write_tiff_with_gdal``
    (reference LBDRNdataset.py:71-89).
    """
    if array.ndim == 2:
        array = array[None]
    if array.ndim != 3:
        raise ValueError(f"expected CHW array, got shape {array.shape}")
    c, h, w = array.shape
    dt = array.dtype
    if dt == np.uint8:
        bits, sfmt = 8, 1
    elif dt == np.uint16:
        bits, sfmt = 16, 1
    elif dt == np.float32:
        bits, sfmt = 32, 3
    elif dt == np.float64:
        bits, sfmt = 64, 3
    else:
        raise ValueError(f"unsupported dtype {dt}")

    hwc = np.ascontiguousarray(array.transpose(1, 2, 0).astype(dt.newbyteorder("<")))
    row_bytes = w * c * dt.itemsize
    n_strips = -(-h // rows_per_strip)
    strips = []
    for s in range(n_strips):
        r0, r1 = s * rows_per_strip, min((s + 1) * rows_per_strip, h)
        strips.append(hwc[r0:r1].tobytes())

    photometric = 1  # BlackIsZero
    tags = [
        (_W, 4, 1, [w]),
        (_H, 4, 1, [h]),
        (_BITS, 3, c, [bits] * c),
        (_COMPRESSION, 3, 1, [1]),
        (_PHOTOMETRIC, 3, 1, [photometric]),
        (_STRIP_OFFSETS, 4, n_strips, None),  # filled below
        (_SPP, 3, 1, [c]),
        (_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (_STRIP_COUNTS, 4, n_strips, [len(s) for s in strips]),
        (_PLANAR, 3, 1, [1]),
        (_SAMPLE_FORMAT, 3, c, [sfmt] * c),
    ]
    if c > 1:
        # Mark non-first bands as unassociated extra samples so libtiff-based
        # readers (cv2 etc.) keep all SamplesPerPixel channels.
        tags.append((_EXTRA_SAMPLES, 3, c - 1, [0] * (c - 1)))
    tags.sort(key=lambda t: t[0])

    # layout: 8B header | IFD | overflow values | strip data
    ifd_off = 8
    ifd_size = 2 + len(tags) * 12 + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        return struct.pack(f"<{len(vals)}{fmt}", *vals)

    # first pass to size the overflow area (strip offsets resolved after)
    pend = []
    for tag, typ, n, vals in tags:
        size = _TYPE_SIZES[typ] * n
        if size > 4:
            pend.append((tag, size))
    data_off = overflow_off + sum(s for _, s in pend)
    strip_offsets = []
    acc = data_off
    for s in strips:
        strip_offsets.append(acc)
        acc += len(s)

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    ifd = bytearray(struct.pack("<H", len(tags)))
    ov_cursor = overflow_off
    for tag, typ, n, vals in tags:
        if tag == _STRIP_OFFSETS:
            vals = strip_offsets
        raw = value_bytes(typ, vals)
        if len(raw) > 4:
            ifd += struct.pack("<HHII", tag, typ, n, ov_cursor)
            overflow += raw
            ov_cursor += len(raw)
        else:
            ifd += struct.pack("<HHI", tag, typ, n) + raw.ljust(4, b"\x00")
    ifd += struct.pack("<I", 0)
    out += ifd
    out += overflow
    assert len(out) == data_off, (len(out), data_off)
    for s in strips:
        out += s
    with open(path, "wb") as f:
        f.write(out)
