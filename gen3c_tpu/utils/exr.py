"""Pure-Python OpenEXR 2.0 scanline codec (no OpenEXR/cv2 dependency).

Replaces the reference's two EXR touchpoints in this environment:
- ViPE depth ingest reads a float16 "Z" channel from .exr entries inside
  a zip (reference: cosmos_predict1/diffusion/inference/vipe_utils.py:85-100);
- the serving wire format encodes float depth buffers as EXR via cv2
  (reference: gui/api/encoding.py:26-54, IMREAD_ANYDEPTH).

Scope (everything those paths need, nothing more):
- single-part scanline files, EXR version 2, little-endian;
- compression NONE (0), ZIPS (2, 1 line/chunk) and ZIP (3, 16 lines/chunk)
  -- the zlib deflate + delta-predictor + two-half byte reorder scheme from
  OpenEXR's ImfZip.cpp, vectorised with numpy;
- pixel types HALF (1), FLOAT (2) and UINT (0);
- arbitrary channel names; chlist kept in the spec-required sorted order.

PIZ/PXR24/B44/DWA compression and tiled/deep/multi-part files are out of
scope and raise ValueError with the offending feature named.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Optional, Tuple

import numpy as np

_MAGIC = 0x01312F76  # 20000630 as the spec's 4 magic bytes, LE int32
_PIXEL_DTYPES = {0: np.dtype("<u4"), 1: np.dtype("<f2"), 2: np.dtype("<f4")}
_PIXEL_TYPES = {np.dtype("<u4"): 0, np.dtype("<f2"): 1, np.dtype("<f4"): 2}
_LINES_PER_CHUNK = {0: 1, 2: 1, 3: 16}  # NONE, ZIPS, ZIP
_COMPRESSION_NAMES = {
    0: "NONE", 1: "RLE", 2: "ZIPS", 3: "ZIP", 4: "PIZ",
    5: "PXR24", 6: "B44", 7: "B44A", 8: "DWAA", 9: "DWAB",
}


# ------------------------- ZIP predictor/reorder -------------------------


def _zip_encode(raw: bytes) -> bytes:
    """OpenEXR ZIP chunk encode: two-half reorder, delta predictor, deflate."""
    a = np.frombuffer(raw, np.uint8)
    n = a.size
    # Reorder: output byte 2*i comes from the first half, 2*i+1 from the
    # second half (ImfZip.cpp interleave-split, inverse of decode).
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = a[0::2]
    t[half:] = a[1::2]
    # Predictor: d[0] = t[0]; d[i] = t[i] - t[i-1] + 128 (mod 256).
    d = np.empty(n, np.int16)
    d[0] = t[0]
    d[1:] = t[1:].astype(np.int16) - t[:-1].astype(np.int16) + 128
    return zlib.compress(d.astype(np.uint8).tobytes())


def _zip_decode(data: bytes, raw_size: int) -> bytes:
    """Inverse of _zip_encode; raw_size is the expected uncompressed size."""
    d = np.frombuffer(zlib.decompress(data), np.uint8)
    if d.size != raw_size:
        raise ValueError(
            f"EXR zip chunk decodes to {d.size} bytes, expected {raw_size}"
        )
    # Predictor decode: t[i] = t[i-1] + d[i] - 128 (mod 256) == cumsum.
    s = d.astype(np.int64)
    s[1:] -= 128
    t = np.cumsum(s).astype(np.uint8)
    # Reorder decode: interleave the two halves.
    half = (raw_size + 1) // 2
    out = np.empty(raw_size, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


# ------------------------------- writing -------------------------------


def _attr(name: str, type_: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\0" + type_.encode() + b"\0"
        + struct.pack("<i", len(data)) + data
    )


def write_exr(
    channels: Dict[str, np.ndarray],
    compression: str = "zip",
) -> bytes:
    """Serialize (H, W) channel arrays to single-part scanline EXR bytes.

    dtype is preserved: float16 -> HALF, float32 -> FLOAT, uint32 -> UINT
    (other dtypes are cast to float32). compression: "none"|"zips"|"zip".
    """
    comp = {"none": 0, "zips": 2, "zip": 3}.get(compression.lower())
    if comp is None:
        raise ValueError(f"Unsupported EXR compression {compression!r}")
    if not channels:
        raise ValueError("write_exr needs at least one channel")

    names = sorted(channels)  # chlist must be in sorted order
    arrs = []
    h = w = None
    for name in names:
        a = np.asarray(channels[name])
        if a.ndim != 2:
            raise ValueError(f"Channel {name!r} must be (H, W), got {a.shape}")
        if a.dtype not in _PIXEL_TYPES:
            a = a.astype(np.float32)
        a = a.astype(a.dtype.newbyteorder("<"), copy=False)
        if h is None:
            h, w = a.shape
        elif a.shape != (h, w):
            raise ValueError("All EXR channels must share one (H, W)")
        arrs.append(a)

    chlist = b""
    for name, a in zip(names, arrs):
        chlist += (
            name.encode() + b"\0"
            + struct.pack("<i", _PIXEL_TYPES[a.dtype])
            + b"\0\0\0\0"           # pLinear + reserved
            + struct.pack("<ii", 1, 1)  # x/y sampling
        )
    chlist += b"\0"

    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        _attr("channels", "chlist", chlist)
        + _attr("compression", "compression", struct.pack("<B", comp))
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", b"\0")  # increasing Y
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0"
    )

    lpc = _LINES_PER_CHUNK[comp]
    n_chunks = (h + lpc - 1) // lpc
    chunks = []
    for c in range(n_chunks):
        y0 = c * lpc
        y1 = min(y0 + lpc, h)
        # Chunk payload: per scanline, each channel's full row, channels in
        # chlist (sorted) order.
        raw = b"".join(
            a[y].tobytes() for y in range(y0, y1) for a in arrs
        )
        data = raw if comp == 0 else _zip_encode(raw)
        if comp != 0 and len(data) >= len(raw):
            data = raw  # OpenEXR stores raw when deflate doesn't help
        chunks.append(struct.pack("<ii", y0, len(data)) + data)

    head = struct.pack("<II", _MAGIC, 2) + header
    offset = len(head) + 8 * n_chunks
    table = []
    for c in chunks:
        table.append(struct.pack("<Q", offset))
        offset += len(c)
    return head + b"".join(table) + b"".join(chunks)


# ------------------------------- reading -------------------------------


def _read_null_str(buf: bytes, pos: int) -> Tuple[str, int]:
    end = buf.index(b"\0", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def _parse_chlist(data: bytes):
    out = []
    pos = 0
    while data[pos] != 0:
        name, pos = _read_null_str(data, pos)
        (ptype,) = struct.unpack_from("<i", data, pos)
        # skip pLinear+reserved (4) and x/y sampling (8)
        xs, ys = struct.unpack_from("<ii", data, pos + 8)
        if (xs, ys) != (1, 1):
            raise ValueError(f"EXR subsampled channel {name!r} unsupported")
        if ptype not in _PIXEL_DTYPES:
            raise ValueError(f"EXR pixel type {ptype} unsupported")
        out.append((name, _PIXEL_DTYPES[ptype]))
        pos += 16
    return out


def read_exr(data: bytes) -> Tuple[Dict[str, np.ndarray], dict]:
    """Parse single-part scanline EXR bytes -> ({channel: (H, W)}, header)."""
    magic, version = struct.unpack_from("<II", data, 0)
    if magic != _MAGIC:
        raise ValueError("Not an EXR file (bad magic)")
    flags = version >> 8
    if version & 0xFF != 2 or flags & 0x1A:  # tiled(0x2)/deep(0x8)/multi(0x10)
        raise ValueError(
            f"Unsupported EXR variant (version word 0x{version:x}); only "
            "single-part scanline v2 files are supported"
        )

    pos = 8
    attrs: dict = {}
    while data[pos] != 0:
        name, pos = _read_null_str(data, pos)
        type_, pos = _read_null_str(data, pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (type_, data[pos : pos + size])
        pos += size
    pos += 1  # header terminator

    channels = _parse_chlist(attrs["channels"][1])
    comp = attrs["compression"][1][0]
    if comp not in _LINES_PER_CHUNK:
        raise ValueError(
            "Unsupported EXR compression "
            f"{_COMPRESSION_NAMES.get(comp, comp)}; only NONE/ZIPS/ZIP"
        )
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    h, w = y1 - y0 + 1, x1 - x0 + 1
    if attrs.get("lineOrder", (None, b"\0"))[1][0] == 2:
        raise ValueError("EXR random line order unsupported")

    lpc = _LINES_PER_CHUNK[comp]
    n_chunks = (h + lpc - 1) // lpc
    offsets = struct.unpack_from(f"<{n_chunks}Q", data, pos)
    line_bytes = sum(w * dt.itemsize for _, dt in channels)

    out = {name: np.empty((h, w), dt) for name, dt in channels}
    for off in offsets:
        cy, size = struct.unpack_from("<ii", data, off)
        rows = min(lpc, y1 - cy + 1)
        raw = data[off + 8 : off + 8 + size]
        want = line_bytes * rows
        if comp != 0 and size != want:
            raw = _zip_decode(raw, want)
        elif size != want:
            raise ValueError("EXR chunk size mismatch")
        o = 0
        for r in range(rows):
            for name, dt in channels:
                n = w * dt.itemsize
                out[name][cy - y0 + r] = np.frombuffer(raw[o : o + n], dt)
                o += n

    header = {
        "dataWindow": (x0, y0, x1, y1),
        "compression": _COMPRESSION_NAMES[comp],
        "channels": [(n, str(dt)) for n, dt in channels],
    }
    return out, header


# ---------------------------- depth helpers ----------------------------


def read_exr_depth(data: bytes, channel: Optional[str] = None) -> np.ndarray:
    """Read one depth plane as float32 (ViPE convention: channel 'Z').

    Falls back to the single channel when 'Z' is absent (cv2 writes
    grayscale EXRs with channel 'Y')."""
    chans, _ = read_exr(data)
    if channel is None:
        channel = "Z" if "Z" in chans else None
    if channel is None:
        if len(chans) != 1:
            raise ValueError(
                f"EXR has channels {sorted(chans)}; specify one for depth"
            )
        channel = next(iter(chans))
    return chans[channel].astype(np.float32)


def write_exr_depth(
    depth: np.ndarray, channel: str = "Z", half: bool = False,
    compression: str = "zip",
) -> bytes:
    """Write one (H, W) depth plane (float32, or float16 when half=True)."""
    depth = np.asarray(depth)
    depth = depth.astype(np.float16 if half else np.float32)
    return write_exr({channel: depth}, compression=compression)
