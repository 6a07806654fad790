"""Pluggable file IO: one `easy_load`/`easy_dump` entry point dispatching
on file extension (handler registry) and URI scheme (backend registry).

Parity: cosmos_predict1/utils/easy_io/ (~2,500 LoC) — backends
(easy_io/backends/{local,http}_backend.py) and format handlers
(easy_io/handlers/: json/jsonl/numpy/pickle/yaml/csv/txt/torch, plus
imageio_video/pil/tarfile/gzip — here with an ffmpeg-free PNG-zip video
fallback), exposed as `easy_io.easy_io.load/dump`. The TPU rebuild keeps the two registries
(they are the extension point training configs rely on) over stdlib
implementations; the torchjit handler is dropped (the tokenizer is
plain-array checkpoints here, models/convert.py) and torch pickles load
via the pickle handler when torch is importable.

New backends/handlers register with the decorators:

    @register_backend("gs")          # URI scheme
    class GcsBackend: ...
    @register_handler("safetensors") # file extension
    class SafetensorsHandler: ...
"""

from __future__ import annotations

import csv
import io as _stdio
import json
import os
import pickle
import urllib.request
from typing import Any, Dict, Optional, Type

# ------------------------------ backends ------------------------------

_BACKENDS: Dict[str, Type] = {}


def register_backend(scheme: str):
    def deco(cls):
        _BACKENDS[scheme] = cls
        return cls

    return deco


@register_backend("")
@register_backend("file")
class LocalBackend:
    """Plain filesystem (easy_io/backends/local_backend.py parity)."""

    def get_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def put_bytes(self, data: bytes, path: str) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


@register_backend("http")
@register_backend("https")
class HTTPBackend:
    """Read-only HTTP (easy_io/backends/http_backend.py parity)."""

    def get_bytes(self, path: str) -> bytes:
        with urllib.request.urlopen(path) as r:  # noqa: S310
            return r.read()

    def put_bytes(self, data: bytes, path: str) -> None:
        raise NotImplementedError("HTTP backend is read-only")

    def exists(self, path: str) -> bool:
        try:
            req = urllib.request.Request(path, method="HEAD")  # noqa: S310
            with urllib.request.urlopen(req) as r:  # noqa: S310
                return r.status < 400
        except Exception:  # noqa: BLE001
            return False


def _backend_for(path: str):
    scheme = path.split("://", 1)[0] if "://" in path else ""
    try:
        return _BACKENDS[scheme]()
    except KeyError:
        raise ValueError(f"no IO backend registered for scheme {scheme!r}")


# ------------------------------ handlers ------------------------------

_HANDLERS: Dict[str, Type] = {}


def register_handler(*exts: str):
    def deco(cls):
        for e in exts:
            _HANDLERS[e.lstrip(".")] = cls
        return cls

    return deco


@register_handler("json")
class JsonHandler:
    def loads(self, data: bytes) -> Any:
        return json.loads(data.decode("utf-8"))

    def dumps(self, obj: Any) -> bytes:
        return json.dumps(obj).encode("utf-8")


@register_handler("jsonl")
class JsonlHandler:
    def loads(self, data: bytes) -> Any:
        return [
            json.loads(line)
            for line in data.decode("utf-8").splitlines()
            if line.strip()
        ]

    def dumps(self, obj: Any) -> bytes:
        return "\n".join(json.dumps(o) for o in obj).encode("utf-8") + b"\n"


@register_handler("npy", "npz")
class NumpyHandler:
    def loads(self, data: bytes) -> Any:
        import numpy as np

        out = np.load(_stdio.BytesIO(data), allow_pickle=False)
        return out

    def dumps(self, obj: Any) -> bytes:
        import numpy as np

        buf = _stdio.BytesIO()
        if isinstance(obj, dict):
            np.savez(buf, **obj)
        else:
            np.save(buf, obj)
        return buf.getvalue()


@register_handler("pkl", "pickle", "pt")
class PickleHandler:
    """Plain pickles; .pt torch checkpoints load too when torch is
    importable (torch.load on a BytesIO)."""

    def loads(self, data: bytes) -> Any:
        # torch checkpoints are zip archives (magic PK\x03\x04) — route
        # those to torch.load, trying the safe weights_only path first.
        # Anything else is a plain pickle; a corrupt one re-raises the
        # original pickle error instead of a confusing torch fallback
        # (and never reaches weights_only=False arbitrary-code paths
        # through e.g. the read-only HTTP backend).
        if data[:4] == b"PK\x03\x04":
            import torch

            try:
                return torch.load(
                    _stdio.BytesIO(data), map_location="cpu",
                    weights_only=True,
                )
            except Exception:  # noqa: BLE001 — non-tensor payloads
                return torch.load(
                    _stdio.BytesIO(data), map_location="cpu",
                    weights_only=False,
                )
        out = pickle.loads(data)
        if out == 0x1950A86A20F9469CFC6C:
            # legacy torch serialization (pre-1.6, non-zipfile): a
            # concatenation of pickle streams whose FIRST object is
            # torch's magic number — pickle.loads "succeeds" but only
            # reads that marker. Route to torch.load.
            import torch

            try:
                return torch.load(
                    _stdio.BytesIO(data), map_location="cpu",
                    weights_only=True,
                )
            except Exception:  # noqa: BLE001
                return torch.load(
                    _stdio.BytesIO(data), map_location="cpu",
                    weights_only=False,
                )
        return out

    def dumps(self, obj: Any) -> bytes:
        return pickle.dumps(obj)


@register_handler("yaml", "yml")
class YamlHandler:
    def loads(self, data: bytes) -> Any:
        import yaml

        return yaml.safe_load(data.decode("utf-8"))

    def dumps(self, obj: Any) -> bytes:
        import yaml

        return yaml.safe_dump(obj).encode("utf-8")


@register_handler("csv")
class CsvHandler:
    def loads(self, data: bytes) -> Any:
        return list(csv.reader(_stdio.StringIO(data.decode("utf-8"))))

    def dumps(self, obj: Any) -> bytes:
        buf = _stdio.StringIO()
        csv.writer(buf).writerows(obj)
        return buf.getvalue().encode("utf-8")


@register_handler("txt", "md", "log")
class TextHandler:
    def loads(self, data: bytes) -> Any:
        return data.decode("utf-8")

    def dumps(self, obj: Any) -> bytes:
        return str(obj).encode("utf-8")


@register_handler("png", "jpg", "jpeg", "bmp", "webp")
class PILImageHandler:
    """Image <-> uint8 array (easy_io/handlers/pil_handler.py parity)."""

    def loads(self, data: bytes, fmt: str = "np") -> Any:
        from PIL import Image

        img = Image.open(_stdio.BytesIO(data))
        if fmt == "pil":
            img.load()
            return img
        import numpy as np

        return np.asarray(img.convert("RGB"))

    def dumps(self, obj: Any, format: str = "png", **kw) -> bytes:
        import numpy as np
        from PIL import Image

        if not isinstance(obj, Image.Image):
            obj = Image.fromarray(np.asarray(obj))
        buf = _stdio.BytesIO()
        obj.save(buf, format=format, **kw)
        return buf.getvalue()


class _FramesZip:
    """PNG-frames-in-zip video container: frame_%06d.png + meta.json.
    The ffmpeg-free interchange format (this environment has no ffmpeg;
    utils/io.save_video writes PNG dirs for the same reason)."""

    @staticmethod
    def loads(data: bytes):
        import zipfile

        import numpy as np

        frames, meta = [], {}
        with zipfile.ZipFile(_stdio.BytesIO(data)) as zf:
            names = sorted(n for n in zf.namelist() if n.endswith(".png"))
            if "meta.json" in zf.namelist():
                meta = json.loads(zf.read("meta.json").decode("utf-8"))
            ih = PILImageHandler()
            for n in names:
                frames.append(ih.loads(zf.read(n)))
        return np.stack(frames), meta

    @staticmethod
    def dumps(frames, fps: float = 17.0) -> bytes:
        import zipfile

        import numpy as np

        frames = np.asarray(frames)
        buf = _stdio.BytesIO()
        ih = PILImageHandler()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            for i, fr in enumerate(frames):
                zf.writestr(f"frame_{i:06d}.png", ih.dumps(fr))
            zf.writestr(
                "meta.json",
                json.dumps({"fps": fps, "nframes": int(frames.shape[0])}),
            )
        return buf.getvalue()


@register_handler("vid")
class FramesZipHandler:
    """Explicit PNG-zip video (the no-ffmpeg native format)."""

    def loads(self, data: bytes, **kw) -> Any:
        return _FramesZip.loads(data)

    def dumps(self, obj: Any, fps: float = 17.0, **kw) -> bytes:
        return _FramesZip.dumps(obj, fps)


@register_handler("mp4", "webm", "mov", "avi", "gif")
class VideoHandler:
    """(T, H, W, 3) uint8 frames <-> video bytes
    (easy_io/handlers/imageio_video_handler.py parity: loads returns
    (frames, meta), dumps takes frames + fps/quality).

    Real codecs run through imageio when its ffmpeg plugin is present;
    without ffmpeg, GIF still round-trips via PIL and mp4/webm/mov fall
    back to pure-Python MJPEG-AVI (utils/mjpeg_avi.py — a real,
    playable video container that players content-sniff regardless of
    extension), so video IO keeps working end-to-end in ffmpeg-less
    environments. Loads auto-detect RIFF/AVI and legacy PNG-zip bytes.
    """

    def loads(self, data: bytes, format: Optional[str] = None,
              **kw) -> Any:
        import numpy as np

        if data[:4] == b"PK\x03\x04":  # PNG-zip fallback container
            return _FramesZip.loads(data)
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            from gen3c_tpu.utils.mjpeg_avi import read_mjpeg_avi

            frames, fps = read_mjpeg_avi(data)
            return frames, {"fps": fps, "nframes": int(frames.shape[0])}
        import imageio

        reader = imageio.get_reader(
            _stdio.BytesIO(data), format=format, **kw
        )
        frames = np.stack([np.asarray(f) for f in reader])
        if frames.ndim == 4 and frames.shape[-1] == 4:
            frames = frames[..., :3]
        try:
            meta = reader.get_meta_data()
        except Exception:  # noqa: BLE001
            meta = {}
        return frames, meta

    def dumps(self, obj: Any, format: str = "mp4", fps: float = 17.0,
              quality: int = 5, **kw) -> bytes:
        import numpy as np

        frames = np.asarray(obj)
        if format in ("gif",):
            from PIL import Image

            imgs = [Image.fromarray(f) for f in frames]
            buf = _stdio.BytesIO()
            imgs[0].save(
                buf, format="gif", save_all=True, append_images=imgs[1:],
                duration=int(1000 / fps), loop=0,
            )
            return buf.getvalue()
        writer = None
        try:
            import imageio

            buf = _stdio.BytesIO()
            writer = imageio.get_writer(
                buf, format=format, fps=fps, quality=quality, **kw
            )
            for f in frames:
                writer.append_data(f)
            writer.close()
            return buf.getvalue()
        except Exception:  # noqa: BLE001 — no ffmpeg: MJPEG-AVI fallback
            if writer is not None:
                try:
                    writer.close()
                except Exception:  # noqa: BLE001
                    pass
            from gen3c_tpu.utils import log
            from gen3c_tpu.utils.mjpeg_avi import write_mjpeg_avi

            log.warning(
                f"no {format} encoder available (ffmpeg missing); writing "
                "pure-Python MJPEG-AVI instead (real playable video; "
                "loads() auto-detects it)"
            )
            buf = _stdio.BytesIO()
            write_mjpeg_avi(buf, frames, fps=fps,
                            quality=min(95, 50 + 5 * quality))
            return buf.getvalue()


@register_handler("tar", "tgz")
class TarHandler:
    """Tar archives (easy_io/handlers/tarfile_handler.py parity). loads
    returns an open tarfile.TarFile (caller iterates/extracts); dumps
    accepts a {name: bytes|str} mapping or a filesystem path to add."""

    def loads(self, data: bytes, mode: str = "r:*", **kw) -> Any:
        import tarfile

        return tarfile.open(fileobj=_stdio.BytesIO(data), mode=mode, **kw)

    def dumps(self, obj: Any, mode: str = "w", **kw) -> bytes:
        import tarfile
        import time as _time

        buf = _stdio.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as tar:
            if isinstance(obj, dict):
                for name, payload in obj.items():
                    if isinstance(payload, str):
                        payload = payload.encode("utf-8")
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    info.mtime = int(_time.time())
                    tar.addfile(info, _stdio.BytesIO(payload))
            else:
                tar.add(str(obj), **kw)
        return buf.getvalue()


@register_handler("parquet", "pqt")
class PandasParquetHandler:
    """DataFrame <-> parquet (reference routes DataFrames through its
    pandas_handler; parquet round-trips dtypes, unlike csv)."""

    def loads(self, data: bytes, **kw) -> Any:
        import pandas as pd

        return pd.read_parquet(_stdio.BytesIO(data), **kw)

    def dumps(self, obj: Any, **kw) -> bytes:
        buf = _stdio.BytesIO()
        obj.to_parquet(buf, **kw)
        return buf.getvalue()


@register_handler("jit", "torchscript")
class TorchJitHandler:
    """TorchScript archives (easy_io/handlers/torchjit_handler.py
    parity) — used for the reference tokenizer's encoder.jit/decoder.jit
    (see utils/checkpoint.load_torchscript_tokenizer)."""

    def loads(self, data: bytes, **kw) -> Any:
        import torch

        return torch.jit.load(_stdio.BytesIO(data), map_location="cpu",
                              **kw)

    def dumps(self, obj: Any, **kw) -> bytes:
        import torch

        buf = _stdio.BytesIO()
        torch.jit.save(obj, buf, **kw)
        return buf.getvalue()


@register_handler("gz")
class GzipHandler:
    """Gzipped pickles (easy_io/handlers/gzip_handler.py parity)."""

    def loads(self, data: bytes, **kw) -> Any:
        import gzip

        with gzip.GzipFile(fileobj=_stdio.BytesIO(data), mode="rb") as f:
            return pickle.load(f)

    def dumps(self, obj: Any, **kw) -> bytes:
        import gzip

        buf = _stdio.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb") as f:
            pickle.dump(obj, f)
        return buf.getvalue()


def _handler_for(path: str, file_format: Optional[str] = None):
    ext = (file_format or path.rsplit(".", 1)[-1]).lower()
    try:
        return _HANDLERS[ext]()
    except KeyError:
        raise ValueError(f"no IO handler registered for extension {ext!r}")


# ------------------------------ API ------------------------------


def easy_load(path: str, file_format: Optional[str] = None, **kwargs) -> Any:
    """Load `path` with the handler picked by extension (or explicit
    `file_format`) over the backend picked by URI scheme. Extra kwargs
    go to the handler (e.g. fps/quality for video, mode for tar)."""
    return _handler_for(path, file_format).loads(
        _backend_for(path).get_bytes(path), **kwargs
    )


def easy_dump(obj: Any, path: str, file_format: Optional[str] = None,
              **kwargs) -> None:
    """Serialize `obj` and write it to `path` (parent dirs created)."""
    _backend_for(path).put_bytes(
        _handler_for(path, file_format).dumps(obj, **kwargs), path
    )


def easy_exists(path: str) -> bool:
    return _backend_for(path).exists(path)


# reference-name aliases (easy_io.easy_io.load / dump)
load = easy_load
dump = easy_dump
exists = easy_exists
