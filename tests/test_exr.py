"""Pure-Python EXR scanline codec (gen3c_tpu/utils/exr.py).

Covers the two reference EXR touchpoints rebuilt without OpenEXR/cv2:
ViPE depth-zip ingest (vipe_utils.py:85-100: float16 'Z' channel) and
the serving depth wire format (gui/api/encoding.py:26-54). No EXR
library exists in this environment, so the oracle is (a) a byte-level
golden re-derived by hand from the OpenEXR 2.0 file-layout spec and
(b) a hand-computed vector for the ImfZip.cpp reorder+predictor.
"""

import io
import struct
import zipfile

import numpy as np
import pytest

from gen3c_tpu.utils.exr import (
    _zip_decode,
    _zip_encode,
    read_exr,
    read_exr_depth,
    write_exr,
    write_exr_depth,
)


@pytest.mark.parametrize("comp", ["none", "zips", "zip"])
@pytest.mark.parametrize("dtype", [np.float16, np.float32, np.uint32])
def test_roundtrip_dtypes_compressions(comp, dtype):
    rng = np.random.default_rng(0)
    # 17 rows exercises the ragged final ZIP chunk (16 lines/chunk)
    for shape in [(1, 2), (7, 11), (16, 4), (17, 3), (33, 5)]:
        a = (rng.random(shape) * 100).astype(dtype)
        out, hdr = read_exr(write_exr({"Z": a}, compression=comp))
        assert out["Z"].dtype == a.dtype
        np.testing.assert_array_equal(out["Z"], a)
        assert hdr["dataWindow"] == (0, 0, shape[1] - 1, shape[0] - 1)


def test_multichannel_mixed_dtypes():
    rng = np.random.default_rng(1)
    chans = {
        "R": rng.random((9, 13)).astype(np.float32),
        "G": rng.random((9, 13)).astype(np.float16),
        "B": rng.random((9, 13)).astype(np.float32),
        "Z": (rng.random((9, 13)) * 10).astype(np.float32),
    }
    out, hdr = read_exr(write_exr(chans, compression="zip"))
    for k, v in chans.items():
        np.testing.assert_array_equal(out[k], v)
    # chlist must be stored in sorted order (OpenEXR requirement)
    assert [n for n, _ in hdr["channels"]] == sorted(chans)


def test_zip_predictor_reorder_known_vector():
    """Hand-computed ImfZip.cpp semantics: split-into-halves reorder then
    d[i] = t[i] - t[i-1] + 128 (mod 256), deflate on top."""
    import zlib

    raw = bytes([10, 200, 30, 40, 5])
    # reorder: t1 half = raw[0::2] = [10, 30, 5]; t2 half = raw[1::2]
    t = [10, 30, 5, 200, 40]
    expect = [t[0]] + [
        (t[i] - t[i - 1] + 128) % 256 for i in range(1, len(t))
    ]
    got = list(zlib.decompress(_zip_encode(raw)))
    assert got == expect
    assert _zip_decode(_zip_encode(raw), len(raw)) == raw


def test_golden_byte_layout_none_compression():
    """Spec-derived golden for a 2x1 float32 'Z' uncompressed file:
    magic/version words, attribute framing, chlist entry layout, the
    scanline offset table, and the (y, size, data) chunk framing."""
    a = np.array([[1.5, -2.0]], dtype=np.float32)
    data = write_exr({"Z": a}, compression="none")

    def attr(name, type_, payload):
        return (
            name.encode() + b"\0" + type_.encode() + b"\0"
            + struct.pack("<i", len(payload)) + payload
        )

    chlist = b"Z\0" + struct.pack("<i", 2) + b"\0\0\0\0" + struct.pack(
        "<ii", 1, 1
    ) + b"\0"
    box = struct.pack("<iiii", 0, 0, 1, 0)
    header = (
        attr("channels", "chlist", chlist)
        + attr("compression", "compression", b"\0")
        + attr("dataWindow", "box2i", box)
        + attr("displayWindow", "box2i", box)
        + attr("lineOrder", "lineOrder", b"\0")
        + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
        + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0"
    )
    head = struct.pack("<II", 0x01312F76, 2) + header
    offset = len(head) + 8  # one chunk -> one uint64 table entry
    chunk = struct.pack("<ii", 0, 8) + a.tobytes()
    golden = head + struct.pack("<Q", offset) + chunk
    assert data == golden
    out, _ = read_exr(golden)
    np.testing.assert_array_equal(out["Z"], a)


def test_incompressible_zip_chunk_stored_raw():
    """When deflate does not shrink a chunk OpenEXR stores it raw and
    readers detect that by size == uncompressed size."""
    rng = np.random.default_rng(2)
    a = rng.integers(0, 2**32, size=(3, 4), dtype=np.uint64).astype(
        np.uint32
    )
    data = write_exr({"Z": a}, compression="zips")
    out, _ = read_exr(data)
    np.testing.assert_array_equal(out["Z"], a)


def test_reader_rejects_unsupported():
    with pytest.raises(ValueError, match="magic"):
        read_exr(b"\x00" * 16)
    good = write_exr({"Z": np.zeros((2, 2), np.float32)})
    tiled = good[:4] + struct.pack("<I", 2 | 0x200) + good[8:]
    with pytest.raises(ValueError, match="variant"):
        read_exr(tiled)
    # PIZ compression code (4) in the compression attribute
    piz = good.replace(
        b"compression\0compression\0\x01\x00\x00\x00\x03",
        b"compression\0compression\0\x01\x00\x00\x00\x04",
    )
    with pytest.raises(ValueError, match="PIZ"):
        read_exr(piz)
    with pytest.raises(ValueError, match="compression"):
        write_exr({"Z": np.zeros((2, 2), np.float32)}, compression="piz")


def test_vipe_zip_with_real_exr_entries():
    """A synthetic ViPE depth zip with real .exr entries (float16 'Z'
    channel exactly as vipe_utils.py:85-100 reads them) loads without
    OpenEXR."""
    from gen3c_tpu.pipelines.data_loaders import _read_depth_from_zip

    rng = np.random.default_rng(3)
    depths = [
        (rng.random((12, 16)) * 8).astype(np.float16) for _ in range(3)
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i, d in enumerate(depths):
            zf.writestr(
                f"{i:05d}.exr", write_exr_depth(d, half=True)
            )
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".zip") as f:
        f.write(buf.getvalue())
        f.flush()
        for i, d in enumerate(depths):
            got = _read_depth_from_zip(f.name, i)
            assert got.dtype == np.float32
            np.testing.assert_array_equal(got, d.astype(np.float32))


def test_wire_format_exr_depth_roundtrip():
    """serving CompressionFormat.EXR: per-frame real .exr buffers,
    bit-exact float32 round-trip (gui/api/encoding.py:54 parity)."""
    from gen3c_tpu.serving.encoding import (
        CompressionFormat,
        compress_images,
        decompress_buffer,
        pad_or_trim_encoded_buffers,
    )

    rng = np.random.default_rng(4)
    depth = (rng.random((4, 6, 8)) * 20).astype(np.float32)
    bufs = compress_images(depth, CompressionFormat.EXR, is_depth=True)
    assert len(bufs) == 4
    assert all(b[:4] == struct.pack("<I", 0x01312F76) for b in bufs)
    out = decompress_buffer(bufs, CompressionFormat.EXR, is_depth=True)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, depth)

    # per-frame buffers pad (repeat last) / trim like JPG/PNG
    padded = pad_or_trim_encoded_buffers(bufs, CompressionFormat.EXR, 6)
    assert len(padded) == 6 and padded[4] == bufs[-1]
    out6 = decompress_buffer(padded, CompressionFormat.EXR, is_depth=True)
    np.testing.assert_array_equal(out6[:4], depth)
    np.testing.assert_array_equal(out6[5], depth[-1])

    # EXR remains depth-only: RGB images must not take this path
    imgs = rng.random((2, 6, 8, 3)).astype(np.float32)
    with pytest.raises(AssertionError):
        compress_images(imgs, CompressionFormat.EXR)


def test_file_depth_estimator_reads_exr():
    from gen3c_tpu.pipelines.depth import FileDepthEstimator
    import tempfile

    rng = np.random.default_rng(6)
    depth = (rng.random((10, 14)) * 3 + 0.5).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".exr") as f:
        f.write(write_exr_depth(depth))
        f.flush()
        est = FileDepthEstimator(f.name)
        got, k, mask = est(np.zeros((10, 14, 3), np.uint8))
    np.testing.assert_array_equal(got, depth)
    assert mask.all() and k.shape == (3, 3)


def test_request_compress_with_exr_depth():
    """The seeding request's depth buffers ride EXR end-to-end."""
    from gen3c_tpu.serving.api_types import SeedingRequest
    from gen3c_tpu.serving.encoding import CompressionFormat

    rng = np.random.default_rng(5)
    req = SeedingRequest(
        request_id="r-exr",
        images=rng.random((2, 8, 10, 3)).astype(np.float32),
        depths=(rng.random((2, 8, 10)) * 5).astype(np.float32),
        masks=None,
        cameras_to_world=np.tile(
            np.eye(4, dtype=np.float32)[None, :3], (2, 1, 1)
        ),
        focal_lengths=np.full((2, 2), 50.0, np.float32),
        principal_points=np.full((2, 2), 4.0, np.float32),
    )
    comp = req.compress(format_depth=CompressionFormat.EXR)
    assert comp.depths_format == CompressionFormat.EXR
    comp.decompress()  # in-place
    np.testing.assert_array_equal(comp.depths, req.depths)
