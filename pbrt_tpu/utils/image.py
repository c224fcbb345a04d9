"""Image I/O (reference util/image.{h,cpp}: EXR/PNG/PFM/QOI).

Pure-python writers/readers with no external deps: PFM (float), PNG (8/16-bit
via zlib), and a minimal scanline float EXR (uncompressed + zip) for
interchange with the reference's output format.
"""
from __future__ import annotations

import struct as pystruct
import zlib
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# PFM

def write_pfm(path, img: np.ndarray):
    """img: (H, W, 3) or (H, W) float32."""
    img = np.asarray(img, np.float32)
    color = img.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        h, w = img.shape[:2]
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.flipud(img).tobytes())


def read_pfm(path) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
        img = data.reshape(h, w, 3) if color else data.reshape(h, w)
        return np.flipud(img).copy()


# ---------------------------------------------------------------------------
# PNG (true-color 8/16 bit, zlib)

def write_png(path, img: np.ndarray):
    """img: (H, W, 3) uint8 or uint16, or float in [0,1] (converted to 8-bit)."""
    img = np.asarray(img)
    if img.dtype in (np.float32, np.float64):
        img = (np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    h, w = img.shape[:2]
    depth = 16 if img.dtype == np.uint16 else 8
    raw = img.astype(">u2" if depth == 16 else "u1").tobytes()
    stride = w * 3 * (depth // 8)
    scan = b"".join(b"\x00" + raw[y * stride:(y + 1) * stride] for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return pystruct.pack(">I", len(data)) + c + pystruct.pack(">I", zlib.crc32(c))

    ihdr = pystruct.pack(">IIBBBBB", w, h, depth, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
           chunk(b"IDAT", zlib.compress(scan, 6)) + chunk(b"IEND", b""))
    Path(path).write_bytes(png)


def read_png(path) -> np.ndarray:
    data = Path(path).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = depth = ctype = None
    while pos < len(data):
        ln = pystruct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = pystruct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    assert ctype == 2, "only truecolor supported"
    raw = zlib.decompress(idat)
    bpp = 3 * (depth // 8)
    stride = w * bpp
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        if ft == 1:  # sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ft == 2:  # up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # average
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pr) & 0xFF
        out[y] = line
        prev = line
    if depth == 16:
        img = out.reshape(h, w, 3, 2)
        return (img[..., 0].astype(np.uint16) << 8) | img[..., 1]
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Minimal EXR (float32 scanline, zip-compressed, RGB)

def write_exr(path, img: np.ndarray):
    """Minimal single-part scanline EXR, float32 RGB, ZIPS compression."""
    img = np.asarray(img, np.float32)
    write_exr_channels(path, {"R": img[..., 0], "G": img[..., 1],
                              "B": img[..., 2]})


def write_exr_channels(path, channels: dict):
    """Multi-channel float32 EXR (named channels — the role of the
    reference's GBufferFilm / SpectralFilm EXR outputs, film.h:319/401).

    channels: {name: (H, W) float32}; channel order in the file follows
    EXR's required alphabetical order."""
    names = sorted(channels.keys())
    arrs = [np.asarray(channels[n], np.float32) for n in names]
    h, w = arrs[0].shape[:2]

    def attr(name, typ, data):
        return name.encode() + b"\x00" + typ.encode() + b"\x00" + \
            pystruct.pack("<I", len(data)) + data

    def chan(name):
        return name.encode() + b"\x00" + pystruct.pack("<iiii", 2, 0, 1, 1)

    chans = b"".join(chan(n) for n in names) + b"\x00"
    hdr = b"\x76\x2f\x31\x01" + pystruct.pack("<I", 2)
    hdr += attr("channels", "chlist", chans)
    hdr += attr("compression", "compression", bytes([2]))  # ZIPS
    box = pystruct.pack("<iiii", 0, 0, w - 1, h - 1)
    hdr += attr("dataWindow", "box2i", box)
    hdr += attr("displayWindow", "box2i", box)
    hdr += attr("lineOrder", "lineOrder", bytes([0]))
    hdr += attr("pixelAspectRatio", "float", pystruct.pack("<f", 1.0))
    hdr += attr("screenWindowCenter", "v2f", pystruct.pack("<ff", 0, 0))
    hdr += attr("screenWindowWidth", "float", pystruct.pack("<f", 1.0))
    hdr += b"\x00"

    blocks = []
    for y in range(h):
        raw = np.concatenate([a[y] for a in arrs]).astype("<f4").tobytes()
        rb = _exr_predictor_encode(raw)
        comp = zlib.compress(rb)
        if len(comp) >= len(raw):
            comp = raw
        blocks.append(pystruct.pack("<iI", y, len(comp)) + comp)

    offset_table_size = 8 * h
    base = len(hdr) + offset_table_size
    offsets = []
    pos = base
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    out = hdr + b"".join(pystruct.pack("<Q", o) for o in offsets) + \
        b"".join(blocks)
    Path(path).write_bytes(out)


def _exr_predictor_encode(data: bytes) -> bytes:
    """OpenEXR zip pre-pass: byte reorder (even/odd split) THEN delta."""
    d = np.frombuffer(data, np.uint8)
    n = len(d)
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = d[0::2]
    t[half:] = d[1::2]
    out = t.astype(np.int32)
    out[1:] = (out[1:] - t[:-1].astype(np.int32) + 384) % 256
    return out.astype(np.uint8).tobytes()


def read_exr(path) -> np.ndarray:
    """Scanline EXR reader: uncompressed / ZIPS / ZIP blocks, HALF or FLOAT
    channels (covers our own writer and the reference pbrt's RGBFilm output
    — half-float, ZIP, 16-scanline blocks; ref util/image.cpp WriteEXR)."""
    data = Path(path).read_bytes()
    assert data[:4] == b"\x76\x2f\x31\x01"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\x00", pos)
        typ = data[pos:e].decode()
        pos = e + 1
        ln = pystruct.unpack("<I", data[pos:pos + 4])[0]
        pos += 4
        attrs[name] = (typ, data[pos:pos + ln])
        pos += ln
    pos += 1
    x0, y0, x1, y1 = pystruct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    # channels: name + (int32 pixel_type, pLinear+pad, xSampling, ySampling)
    ch = []
    ch_type = []
    cdata = attrs["channels"][1]
    cpos = 0
    while cdata[cpos] != 0:
        e = cdata.index(b"\x00", cpos)
        ch.append(cdata[cpos:e].decode())
        ch_type.append(pystruct.unpack("<i", cdata[e + 1:e + 5])[0])
        cpos = e + 1 + 16
    sizes = [2 if t == 1 else 4 for t in ch_type]  # HALF=1 else 4 bytes
    dtypes = [np.float16 if t == 1 else np.float32 for t in ch_type]
    lines_per_block = 16 if comp == 3 else 1  # ZIP=3 is 16-scanline blocks
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = pystruct.unpack(f"<{n_blocks}Q", data[pos:pos + 8 * n_blocks])
    img = np.zeros((h, w, len(ch)), np.float32)
    bytes_per_line = w * sum(sizes)
    for off in offsets:
        y, ln = pystruct.unpack("<iI", data[off:off + 8])
        raw = data[off + 8:off + 8 + ln]
        n_lines = min(lines_per_block, y1 - y + 1)
        expect = bytes_per_line * n_lines
        # 2=ZIPS, 3=ZIP; 4 accepted for files written by this writer's old
        # versions, which mislabeled ZIPS as 4 (the OpenEXR PIZ code)
        if comp in (2, 3, 4) and ln != expect:
            raw = zlib.decompress(raw)
            raw = _exr_predictor_decode(raw)
        for li in range(n_lines):
            line = raw[li * bytes_per_line:(li + 1) * bytes_per_line]
            cp = 0
            for ci in range(len(ch)):
                n = w * sizes[ci]
                img[y - y0 + li, :, ci] = np.frombuffer(
                    line[cp:cp + n], dtypes[ci]).astype(np.float32)
                cp += n
    order = {c: i for i, c in enumerate(ch)}
    if set("RGB") <= set(ch):
        img = img[:, :, [order["R"], order["G"], order["B"]]]
    return img


def read_exr_channels(path) -> dict:
    """All named channels of a (possibly multi-channel AOV) EXR:
    {name: (H, W) float32} — inverse of write_exr_channels."""
    import io
    # reuse read_exr's parser by re-reading with channel collapse disabled:
    # the cheap approach is to re-run the scanline parse here.
    data = Path(path).read_bytes()
    assert data[:4] == b"\x76\x2f\x31\x01"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\x00", pos)
        pos = e + 1
        ln = pystruct.unpack("<I", data[pos:pos + 4])[0]
        pos += 4
        attrs[name] = data[pos:pos + ln]
        pos += ln
    pos += 1
    x0, y0, x1, y1 = pystruct.unpack("<iiii", attrs["dataWindow"])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][0]
    ch, ch_type = [], []
    cdata = attrs["channels"]
    cpos = 0
    while cdata[cpos] != 0:
        e = cdata.index(b"\x00", cpos)
        ch.append(cdata[cpos:e].decode())
        ch_type.append(pystruct.unpack("<i", cdata[e + 1:e + 5])[0])
        cpos = e + 1 + 16
    sizes = [2 if t == 1 else 4 for t in ch_type]
    dtypes = [np.float16 if t == 1 else np.float32 for t in ch_type]
    lines_per_block = 16 if comp == 3 else 1
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = pystruct.unpack(f"<{n_blocks}Q", data[pos:pos + 8 * n_blocks])
    img = np.zeros((h, w, len(ch)), np.float32)
    bytes_per_line = w * sum(sizes)
    for off in offsets:
        y, ln = pystruct.unpack("<iI", data[off:off + 8])
        raw = data[off + 8:off + 8 + ln]
        n_lines = min(lines_per_block, y1 - y + 1)
        if comp in (2, 3, 4) and ln != bytes_per_line * n_lines:
            raw = zlib.decompress(raw)
            raw = _exr_predictor_decode(raw)
        for li in range(n_lines):
            line = raw[li * bytes_per_line:(li + 1) * bytes_per_line]
            cp = 0
            for ci in range(len(ch)):
                n = w * sizes[ci]
                img[y - y0 + li, :, ci] = np.frombuffer(
                    line[cp:cp + n], dtypes[ci]).astype(np.float32)
                cp += n
    return {c: img[:, :, i] for i, c in enumerate(ch)}


def _exr_predictor_decode(data: bytes) -> bytes:
    """Inverse of _exr_predictor_encode: un-delta THEN un-reorder."""
    d = np.frombuffer(data, np.uint8).astype(np.int64)
    n = len(d)
    t = np.empty(n, np.int64)
    t[0] = d[0]
    t[1:] = d[1:] - 128
    t = np.cumsum(t) % 256
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


# ---------------------------------------------------------------------------
# QOI codec ("Quite OK Image", qoiformat.org spec; the reference reads/writes
# QOI via the vendored ext/qoi single-header, util/image.cpp:869-886).

_QOI_OP_INDEX, _QOI_OP_DIFF, _QOI_OP_LUMA, _QOI_OP_RUN = 0x00, 0x40, 0x80, 0xC0
_QOI_OP_RGB, _QOI_OP_RGBA = 0xFE, 0xFF


def write_qoi(path, img: np.ndarray):
    """img: (H, W, 3|4) uint8, or float in [0,1] (converted with rounding)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    h, w, nc = img.shape
    assert nc in (3, 4), "QOI supports 3 or 4 channels"
    out = bytearray()
    out += b"qoif" + w.to_bytes(4, "big") + h.to_bytes(4, "big")
    out += bytes([nc, 0])  # channels, colorspace = sRGB
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = img.reshape(-1, nc)
    for px in flat:
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        a = int(px[3]) if nc == 4 else 255
        cur = (r, g, b, a)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(_QOI_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_QOI_OP_RUN | (run - 1))
            run = 0
        ih = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[ih] == cur:
            out.append(_QOI_OP_INDEX | ih)
        else:
            index[ih] = cur
            if a == prev[3]:
                dr = (r - prev[0] + 128) % 256 - 128
                dg = (g - prev[1] + 128) % 256 - 128
                db = (b - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(_QOI_OP_DIFF | ((dr + 2) << 4)
                               | ((dg + 2) << 2) | (db + 2))
                elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                      and -8 <= db - dg <= 7):
                    out.append(_QOI_OP_LUMA | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes([_QOI_OP_RGB, r, g, b])
            else:
                out += bytes([_QOI_OP_RGBA, r, g, b, a])
        prev = cur
    if run:
        out.append(_QOI_OP_RUN | (run - 1))
    out += b"\x00\x00\x00\x00\x00\x00\x00\x01"
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_qoi(path) -> np.ndarray:
    """Returns (H, W, 3|4) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"qoif":
        raise ValueError(f"{path}: not a QOI file")
    w = int.from_bytes(data[4:8], "big")
    h = int.from_bytes(data[8:12], "big")
    nc = data[12]
    out = np.empty((h * w, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    n = h * w
    while i < n:
        byte = data[pos]; pos += 1
        if byte == _QOI_OP_RGB:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]; pos += 3
        elif byte == _QOI_OP_RGBA:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte & 0xC0
            if tag == _QOI_OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif tag == _QOI_OP_DIFF:
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == _QOI_OP_LUMA:
                dg = (byte & 0x3F) - 32
                b2 = data[pos]; pos += 1
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (b2 & 0xF) - 8) % 256
            else:  # run
                cnt = (byte & 0x3F) + 1
                out[i:i + cnt] = (r, g, b, a)
                i += cnt
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    return out.reshape(h, w, 4)[..., :nc]


# ---------------------------------------------------------------------------
# Metrics (reference cmd/imgtool.cpp diff: MAE/MSE/MRSE)

def image_mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


def image_mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def image_mrse(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean((a - b) ** 2 / (b * b + 0.01)))
