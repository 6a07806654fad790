"""Fine-grained PEFT/LoRA layer control.

Parity: diffusion/training/utils/layer_control/peft_control_config_
parser.py (LayerControlConfigParser) + peft/lora_config.py: a config
selects blocks (regex over block indices + "final_layer"), subblocks
(FA/CA/MLP/FL) and layers (to_q, to_v, ..., with optional per-layer
":rank:scale" overrides), producing a per-parameter plan consumed by
training.lora.init_lora_params(plan=...).

Config grammar (same keys as the reference):
  {
    "enabled": True,
    "customization_type": "LoRA",
    "rank": 8, "scale": 1.0,              # global defaults
    "edits": [
      {"blocks": r"\\b(0|1|25|26)\\b",    # regex over block ids
       "block_edit": ["FA[to_q, to_v]", "CA[to_q, to_v:16:0.5]"],
       "rank": 8, "scale": 1.0},          # per-edit overrides
      {"blocks": "final_layer",
       "block_edit": ["FL[l1]"]},
    ],
  }
"""

from __future__ import annotations

import json
import re
from typing import Dict, Tuple, Union

# reference subblock/layer vocabulary -> gen3c_tpu DiT pytree paths
_SUBBLOCK_LAYERS = {
    "FA": {"to_q": "fa/q/w", "to_k": "fa/k/w", "to_v": "fa/v/w",
           "to_out": "fa/out/w", "ada1": "fa/adaln/w1",
           "ada2": "fa/adaln/w2"},
    "CA": {"to_q": "ca/q/w", "to_k": "ca/k/w", "to_v": "ca/v/w",
           "to_out": "ca/out/w", "ada1": "ca/adaln/w1",
           "ada2": "ca/adaln/w2"},
    "MLP": {"l1": "mlp/fc1/w", "l2": "mlp/fc2/w",
            "ada1": "mlp/adaln/w1", "ada2": "mlp/adaln/w2"},
}
_FINAL_LAYERS = {
    "FL": {"l1": "final/linear/w", "ada1": "final/adaln/w1",
           "ada2": "final/adaln/w2"},
}
FINAL_LAYER_NAME = "final_layer"
_SUBBLOCK_RE = re.compile(r"^(?P<subblock>.+?)\[(?P<parameters>[^\]]+)\]$")
_LAYER_RE = re.compile(
    r"^(?P<layer>.+?)(?::(?P<rank>\d+))?(?::(?P<scale>[\d.]+))?$")


def parse_layer_control(
    config: Union[str, dict],
    num_blocks: int = 28,
) -> Dict[str, Tuple[int, float]]:
    """Parse a layer-control config into {param_path: (rank, scale)}.

    Returns an empty dict when disabled. Raises on unknown subblocks or
    layers (the reference validates against the same vocabulary)."""
    if isinstance(config, str):
        config = json.loads(config)
    if not config:
        return {}
    enabled = str(config.get("enabled", "False")).lower() in (
        "true", "1", "yes")
    if not enabled:
        return {}
    ctype = config.get("customization_type", "")
    if not ctype:
        raise ValueError("Must specify a top-level customization_type.")
    if str(ctype) not in ("LoRA", "CustomizationType.LORA"):
        raise ValueError(f"unsupported customization_type {ctype!r}")
    default_rank = config.get("rank")
    default_scale = config.get("scale")
    block_ids = [str(i) for i in range(num_blocks)] + [FINAL_LAYER_NAME]

    plan: Dict[str, Tuple[int, float]] = {}
    for edit in config.get("edits", []):
        blocks_pat = re.compile(str(edit["blocks"]))
        edit_rank = edit.get("rank", default_rank)
        edit_scale = edit.get("scale", default_scale)
        selected = [b for b in block_ids if blocks_pat.search(b)]
        if not selected:
            raise ValueError(
                f"edit selects no blocks: {edit['blocks']!r}")
        for spec in edit.get("block_edit", []):
            m = _SUBBLOCK_RE.match(spec.strip())
            if not m:
                raise ValueError(f"malformed block_edit entry {spec!r}")
            sub = m.group("subblock").strip()
            vocab = {**_SUBBLOCK_LAYERS, **_FINAL_LAYERS}.get(sub)
            if vocab is None:
                raise ValueError(f"unknown subblock {sub!r}")
            for layer_spec in m.group("parameters").split(","):
                lm = _LAYER_RE.match(layer_spec.strip())
                layer = lm.group("layer")
                if layer not in vocab:
                    raise ValueError(
                        f"unknown layer {layer!r} for subblock {sub!r}")
                rank = int(lm.group("rank") or edit_rank or 8)
                scale = float(lm.group("scale") or edit_scale or 1.0)
                for b in selected:
                    if sub in _FINAL_LAYERS:
                        if b != FINAL_LAYER_NAME:
                            continue
                        path = vocab[layer]
                    else:
                        if b == FINAL_LAYER_NAME:
                            continue
                        path = f"blocks/{b}/{vocab[layer]}"
                    plan[path] = (rank, scale)
    return plan
