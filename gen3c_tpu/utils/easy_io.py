"""Pluggable file IO: one `easy_load`/`easy_dump` entry point dispatching
on file extension (handler registry) and URI scheme (backend registry).

Parity: cosmos_predict1/utils/easy_io/ (~2,500 LoC) — backends
(easy_io/backends/{local,http}_backend.py) and format handlers
(easy_io/handlers/: json/jsonl/numpy/pickle/yaml/csv/txt/torch), exposed
as `easy_io.easy_io.load/dump`. The TPU rebuild keeps the two registries
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
        return pickle.loads(data)

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


def _handler_for(path: str, file_format: Optional[str] = None):
    ext = (file_format or path.rsplit(".", 1)[-1]).lower()
    try:
        return _HANDLERS[ext]()
    except KeyError:
        raise ValueError(f"no IO handler registered for extension {ext!r}")


# ------------------------------ API ------------------------------


def easy_load(path: str, file_format: Optional[str] = None) -> Any:
    """Load `path` with the handler picked by extension (or explicit
    `file_format`) over the backend picked by URI scheme."""
    return _handler_for(path, file_format).loads(
        _backend_for(path).get_bytes(path)
    )


def easy_dump(obj: Any, path: str, file_format: Optional[str] = None) -> None:
    """Serialize `obj` and write it to `path` (parent dirs created)."""
    _backend_for(path).put_bytes(
        _handler_for(path, file_format).dumps(obj), path
    )


def easy_exists(path: str) -> bool:
    return _backend_for(path).exists(path)


# reference-name aliases (easy_io.easy_io.load / dump)
load = easy_load
dump = easy_dump
exists = easy_exists
