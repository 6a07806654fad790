"""Pluggable IO (utils/easy_io) tests."""

import numpy as np
import pytest

from gen3c_tpu.utils import easy_io


def test_json_jsonl_roundtrip(tmp_path):
    p = str(tmp_path / "a" / "x.json")
    easy_io.easy_dump({"a": [1, 2]}, p)  # parent dir auto-created
    assert easy_io.easy_load(p) == {"a": [1, 2]}
    pl = str(tmp_path / "x.jsonl")
    rows = [{"i": 0}, {"i": 1}]
    easy_io.easy_dump(rows, pl)
    assert easy_io.easy_load(pl) == rows


def test_numpy_roundtrip(tmp_path):
    arr = np.arange(6).reshape(2, 3).astype(np.float32)
    p = str(tmp_path / "x.npy")
    easy_io.easy_dump(arr, p)
    np.testing.assert_array_equal(easy_io.easy_load(p), arr)
    pz = str(tmp_path / "x.npz")
    easy_io.easy_dump({"a": arr, "b": arr + 1}, pz)
    z = easy_io.easy_load(pz)
    np.testing.assert_array_equal(z["b"], arr + 1)


def test_pickle_csv_txt_roundtrip(tmp_path):
    p = str(tmp_path / "x.pkl")
    easy_io.easy_dump({"k": (1, "two")}, p)
    assert easy_io.easy_load(p) == {"k": (1, "two")}
    pc = str(tmp_path / "x.csv")
    easy_io.easy_dump([["a", "b"], ["1", "2"]], pc)
    assert easy_io.easy_load(pc) == [["a", "b"], ["1", "2"]]
    pt = str(tmp_path / "x.txt")
    easy_io.easy_dump("hello", pt)
    assert easy_io.easy_load(pt) == "hello"


def test_torch_pt_checkpoint_loads(tmp_path):
    torch = pytest.importorskip("torch")
    p = str(tmp_path / "ckpt.pt")
    torch.save({"w": torch.ones(2, 2)}, p)
    out = easy_io.easy_load(p)
    assert float(out["w"].sum()) == 4.0


def test_explicit_format_and_exists(tmp_path):
    p = str(tmp_path / "noext")
    easy_io.easy_dump([1, 2], p, file_format="json")
    assert easy_io.easy_load(p, file_format="json") == [1, 2]
    assert easy_io.easy_exists(p)
    assert not easy_io.easy_exists(str(tmp_path / "missing"))


def test_custom_registration(tmp_path):
    @easy_io.register_handler("rev")
    class RevHandler:
        def loads(self, data):
            return data.decode()[::-1]

        def dumps(self, obj):
            return obj[::-1].encode()

    p = str(tmp_path / "x.rev")
    easy_io.easy_dump("abc", p)
    with open(p, "rb") as f:
        assert f.read() == b"cba"
    assert easy_io.easy_load(p) == "abc"


def test_unknown_scheme_and_ext_raise(tmp_path):
    with pytest.raises(ValueError):
        easy_io.easy_load("s3://bucket/x.json")
    with pytest.raises(ValueError):
        easy_io.easy_load(str(tmp_path / "x.unknownext"))


def test_video_handler_mp4_roundtrip_no_ffmpeg(tmp_path):
    """mp4 dump in an ffmpeg-less env falls back to pure-Python
    MJPEG-AVI (a real playable container); loads auto-detects it and
    returns (frames, meta) (imageio_video_handler parity surface)."""
    import numpy as np

    from gen3c_tpu.utils import easy_io

    yy = np.linspace(0, 200, 16)[:, None, None]
    xx = np.linspace(0, 55, 24)[None, :, None]
    tt = np.arange(4)[:, None, None, None] * 10.0
    frames = np.broadcast_to(yy + xx + tt, (4, 16, 24, 3)).astype(np.uint8)
    p = str(tmp_path / "clip.mp4")
    easy_io.easy_dump(frames, p, fps=8.0)
    raw = open(p, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "  # real container
    back, meta = easy_io.easy_load(p)
    assert back.shape == frames.shape
    # MJPEG is lossy; smooth content must survive within JPEG error
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 4
    assert abs(meta.get("fps") - 8.0) < 1e-6


def test_video_handler_gif_roundtrip(tmp_path):
    """GIF round-trips through PIL even without ffmpeg (palette-exact
    for few-color content)."""
    import numpy as np

    from gen3c_tpu.utils import easy_io

    frames = np.zeros((3, 8, 8, 3), np.uint8)
    frames[1] = 255
    frames[2, :, :4] = 128
    p = str(tmp_path / "anim.gif")
    easy_io.easy_dump(frames, p, format="gif", fps=5)
    back, _meta = easy_io.easy_load(p)
    assert back.shape == frames.shape
    np.testing.assert_array_equal(back, frames)


def test_frames_zip_handler_roundtrip(tmp_path):
    import numpy as np

    from gen3c_tpu.utils import easy_io

    frames = (np.random.RandomState(1).rand(2, 12, 10, 3) * 255).astype(
        np.uint8
    )
    p = str(tmp_path / "clip.vid")
    easy_io.easy_dump(frames, p, fps=24.0)
    back, meta = easy_io.easy_load(p)
    np.testing.assert_array_equal(back, frames)
    assert meta == {"fps": 24.0, "nframes": 2}


def test_tar_handler_roundtrip(tmp_path):
    from gen3c_tpu.utils import easy_io

    p = str(tmp_path / "bundle.tar")
    easy_io.easy_dump({"a.txt": "hello", "dir/b.bin": b"\x00\x01"}, p)
    tf = easy_io.easy_load(p)
    names = sorted(tf.getnames())
    assert names == ["a.txt", "dir/b.bin"]
    assert tf.extractfile("a.txt").read() == b"hello"
    assert tf.extractfile("dir/b.bin").read() == b"\x00\x01"
    tf.close()


def test_tar_handler_path_add(tmp_path):
    from gen3c_tpu.utils import easy_io

    src = tmp_path / "payload.txt"
    src.write_text("data")
    p = str(tmp_path / "one.tar")
    easy_io.easy_dump(str(src), p, arcname="payload.txt")
    tf = easy_io.easy_load(p)
    assert tf.extractfile("payload.txt").read() == b"data"
    tf.close()


def test_image_handler_roundtrip(tmp_path):
    import numpy as np

    from gen3c_tpu.utils import easy_io

    img = (np.random.RandomState(2).rand(9, 7, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    easy_io.easy_dump(img, p)
    np.testing.assert_array_equal(easy_io.easy_load(p), img)


def test_gzip_handler_roundtrip(tmp_path):
    from gen3c_tpu.utils import easy_io

    p = str(tmp_path / "obj.gz")
    easy_io.easy_dump({"x": [1, 2, 3]}, p)
    assert easy_io.easy_load(p) == {"x": [1, 2, 3]}


def test_mjpeg_avi_roundtrip_and_save_video_fallback(tmp_path):
    """Pure-Python MJPEG-AVI writer/reader round-trip + save_video's
    real-video fallback path (returns an .avi readable by
    read_video_bcthw)."""
    import numpy as np

    from gen3c_tpu.utils import io as io_utils
    from gen3c_tpu.utils.mjpeg_avi import read_mjpeg_avi, write_mjpeg_avi

    yy = np.linspace(0, 200, 32)[:, None, None]
    xx = np.linspace(0, 55, 48)[None, :, None]
    frames = np.broadcast_to(yy + xx, (5, 32, 48, 3)).astype(np.uint8)

    p = str(tmp_path / "v.avi")
    write_mjpeg_avi(p, frames, fps=30.0, quality=92)
    back, fps = read_mjpeg_avi(p)
    assert back.shape == frames.shape
    assert abs(fps - 30.0) < 1e-6
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 3

    # save_video in this ffmpeg-less env: real .avi, not a PNG dir
    out = io_utils.save_video(frames, 24, str(tmp_path / "clip.mp4"))
    assert out.endswith(".avi")
    video, fps2 = io_utils.read_video_bcthw(out)
    assert video.shape == (1, 3, 5, 32, 48)
    assert abs(fps2 - 24.0) < 1e-6


def test_incremental_video_saver_matches_one_shot(tmp_path):
    """IncrementalVideoSaver (AR chunks pre-encoded under later chunks'
    denoise) produces BYTE-identical files to a plain save_video call,
    and its checksum verification survives a trimmed/edited final video
    (pad-trim, compose_buffer_video, guardrail edits)."""
    import numpy as np

    from gen3c_tpu.utils import io as io_utils
    from gen3c_tpu.utils.mjpeg_avi import read_mjpeg_avi

    rng = np.random.RandomState(0)
    frames = (rng.rand(9, 16, 24, 3) * 255).astype(np.uint8)

    ref = io_utils.save_video(frames, 24, str(tmp_path / "ref.mp4"))
    assert ref.endswith(".avi")  # ffmpeg-less env

    saver = io_utils.IncrementalVideoSaver(24)
    assert saver._enabled
    saver.update(frames[:5])  # chunk 1
    saver.update(frames)  # chunk 2 (cumulative, as on_chunk delivers)
    out = saver.save(frames, str(tmp_path / "inc.mp4"))
    assert out.endswith(".avi")
    assert (
        (tmp_path / "inc.avi").read_bytes()
        == (tmp_path / "ref.avi").read_bytes()
    )

    # trimmed + edited final video: per-frame checksums catch both the
    # dropped tail and the changed frame; output equals a fresh save
    edited = frames[:7].copy()
    edited[3] ^= 255
    saver2 = io_utils.IncrementalVideoSaver(24)
    saver2.update(frames)
    out2 = saver2.save(edited, str(tmp_path / "ed.mp4"))
    ref2 = io_utils.save_video(edited, 24, str(tmp_path / "ref2.mp4"))
    assert (
        (tmp_path / "ed.avi").read_bytes()
        == (tmp_path / "ref2.avi").read_bytes()
    )
    back, fps = read_mjpeg_avi(out2)
    assert back.shape == edited.shape and abs(fps - 24.0) < 1e-6

    # update() after a worker error or when disabled is inert
    saver3 = io_utils.IncrementalVideoSaver(24)
    saver3._enabled = False
    saver3.update(frames)
    assert saver3._thread is None
    assert saver3.save(frames, str(tmp_path / "off.mp4")).endswith(".avi")


def test_parquet_handler_roundtrip(tmp_path):
    import pandas as pd

    from gen3c_tpu.utils import easy_io

    df = pd.DataFrame({"a": [1, 2, 3], "b": [0.5, 1.5, 2.5],
                       "c": ["x", "y", "z"]})
    p = str(tmp_path / "t.parquet")
    easy_io.easy_dump(df, p)
    back = easy_io.easy_load(p)
    pd.testing.assert_frame_equal(back, df)


def test_torchjit_handler_roundtrip(tmp_path):
    import torch

    from gen3c_tpu.utils import easy_io

    class M(torch.nn.Module):
        def forward(self, x):
            return x * 2 + 1

    mod = torch.jit.script(M())
    p = str(tmp_path / "m.jit")
    easy_io.easy_dump(mod, p)
    back = easy_io.easy_load(p)
    x = torch.randn(3)
    torch.testing.assert_close(back(x), x * 2 + 1)


def test_pickle_handler_legacy_torch_serialization(tmp_path):
    """Pre-1.6 torch checkpoints (non-zipfile, persistent-id storages)
    still load; corrupt plain pickles raise the pickle error."""
    import pickle as _pickle

    import pytest
    import torch

    from gen3c_tpu.utils import easy_io

    p = str(tmp_path / "legacy.pkl")
    torch.save({"w": torch.arange(4.0)}, p,
               _use_new_zipfile_serialization=False)
    out = easy_io.easy_load(p)
    torch.testing.assert_close(out["w"], torch.arange(4.0))

    bad = str(tmp_path / "corrupt.pkl")
    with open(bad, "wb") as f:
        f.write(b"\x80\x05garbage-not-a-pickle")
    with pytest.raises((_pickle.UnpicklingError, EOFError, ValueError)):
        easy_io.easy_load(bad)
