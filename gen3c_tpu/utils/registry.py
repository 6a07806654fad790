"""Experiment/config registry + lightweight object instantiation.

Replaces the reference's three-tier config machinery (hydra ConfigStore
experiment nodes, LazyCall/instantiate, attrs freeze — utils/lazy_config/,
diffusion/config/registry.py:30-97, utils/config_helper.py) with two
plain primitives:

  * a named registry (register/get/list) used for model presets,
    experiments and dataset factories;
  * instantiate(): recursive construction of {"_target_": "mod.Cls", ...}
    dicts (LazyCall parity) so config files remain declarative.

CLI-style dotted overrides ("a.b=3") are applied to nested dicts /
dataclasses, mirroring config_helper.override.
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Callable, Dict, Iterable, Optional

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def register(group: str, name: str, obj: Any = None):
    """Register obj under group/name; usable as a decorator."""
    reg = _REGISTRIES.setdefault(group, {})

    def _do(o):
        if name in reg and reg[name] is not o:
            raise ValueError(f"{group}/{name} already registered")
        reg[name] = o
        return o

    return _do if obj is None else _do(obj)


def get(group: str, name: str) -> Any:
    try:
        return _REGISTRIES[group][name]
    except KeyError as e:
        avail = sorted(_REGISTRIES.get(group, {}))
        raise KeyError(f"unknown {group} '{name}'; available: {avail}") from e


def names(group: str) -> list:
    return sorted(_REGISTRIES.get(group, {}))


def _resolve(target: str) -> Callable:
    module, _, attr = target.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def instantiate(cfg: Any) -> Any:
    """Recursively build objects from {"_target_": ...} dicts."""
    if isinstance(cfg, dict):
        built = {k: instantiate(v) for k, v in cfg.items() if k != "_target_"}
        if "_target_" in cfg:
            return _resolve(cfg["_target_"])(**built)
        return built
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(v) for v in cfg)
    return cfg


def apply_overrides(cfg: Any, overrides: Iterable[str]) -> Any:
    """Apply "a.b.c=value" overrides to nested dicts/dataclasses.
    Dataclasses are rebuilt with dataclasses.replace (frozen-safe)."""
    import ast

    def parse(v: str) -> Any:
        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v

    def set_path(obj: Any, keys: list, value: Any) -> Any:
        k = keys[0]
        if len(keys) == 1:
            if dataclasses.is_dataclass(obj):
                return dataclasses.replace(obj, **{k: value})
            obj = dict(obj)
            obj[k] = value
            return obj
        child = getattr(obj, k) if dataclasses.is_dataclass(obj) else obj[k]
        new_child = set_path(child, keys[1:], value)
        if dataclasses.is_dataclass(obj):
            return dataclasses.replace(obj, **{k: new_child})
        obj = dict(obj)
        obj[k] = new_child
        return obj

    for ov in overrides:
        key, _, raw = ov.partition("=")
        cfg = set_path(cfg, key.strip().split("."), parse(raw.strip()))
    return cfg


# ---- built-in registrations (experiment-name parity) ----


def _register_builtin_presets() -> None:
    from gen3c_tpu.pipelines import factory, text2world

    for name, preset in factory.PRESETS.items():
        register("experiment", name, preset)
    register("experiment", "GEN3C_Cosmos_7B", factory.GEN3C_7B_PRESET)
    for name, preset in text2world.T2W_PRESETS.items():
        register("experiment", name, preset)
    from gen3c_tpu.pipelines import text2world_multiview

    for name, preset in text2world_multiview.MV_PRESETS.items():
        register("experiment", name, preset)

    # robot-action post-training family (reference training/config/
    # video2world_action/experiment.py): video-extend DiT + action MLPs
    import dataclasses as _dc

    from gen3c_tpu.models.dit_action import ActionDiTConfig

    # instruction post-training family (training/config/
    # video2world_instruction/experiment.py): the plain video-extend
    # DiT trained with text instructions — same net, [x, mask] layout
    for base_name, base in (
        ("video2world_instruction_tiny", factory.GEN3C_TINY_PRESET),
        ("video2world_instruction_7b", factory.GEN3C_7B_PRESET),
    ):
        dit = _dc.replace(base.dit, in_channels=base.dit.out_channels + 1)
        register(
            "experiment", base_name,
            _dc.replace(base, name=base_name, dit=dit),
        )

    for base_name, base in (
        ("video2world_action_tiny", factory.GEN3C_TINY_PRESET),
        ("video2world_action_7b", factory.GEN3C_7B_PRESET),
    ):
        dit = base.dit
        action_dit = ActionDiTConfig(
            **{f.name: getattr(dit, f.name)
               for f in _dc.fields(type(dit))},
        )
        # action experiments condition on [x, mask] only (in 16+1)
        action_dit = _dc.replace(
            action_dit, in_channels=dit.out_channels + 1)
        register(
            "experiment", base_name,
            _dc.replace(base, name=base_name, dit=action_dit),
        )


try:
    _register_builtin_presets()
except ImportError:  # during partial installs
    pass
