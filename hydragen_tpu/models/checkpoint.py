"""Native checkpoint save/load (Orbax).

The reference's only persistence is reading HF checkpoints and offline
per-rank ``.pt`` shards (SURVEY.md §5 "Checkpoint / resume"). Here params —
including INT8-quantized pytrees — round-trip through Orbax, so a quantized
7B model loads in seconds without re-running HF conversion + quantization.

``QuantizedTensor`` is a NamedTuple pytree node, so it serializes natively;
the config is stored alongside as JSON metadata.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Tuple

from hydragen_tpu.models.config import ModelConfig


def save_checkpoint(path: str, cfg: ModelConfig, params) -> None:
    """Write params + config under ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "params", params, force=True)
    meta = dataclasses.asdict(cfg)
    (path / "config.json").write_text(json.dumps(meta, indent=1))


def load_checkpoint(path: str):
    """-> (cfg, params). Restores quantized pytrees as saved."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta = json.loads((path / "config.json").read_text())
    if meta.get("rope_scaling") is not None:
        meta["rope_scaling"] = tuple(meta["rope_scaling"])
    cfg = ModelConfig(**meta)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / "params")
    params = _restore_quantized(params)
    return cfg, params


def _restore_quantized(params):
    """Orbax restores NamedTuples as dicts without the target structure;
    rebuild QuantizedTensor / Quantized4Tensor nodes from their field
    signatures ({'q', 'scale'} / {'qp', 'gscale'})."""
    from hydragen_tpu.ops.quant import Quantized4Tensor, QuantizedTensor

    def fix(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "scale"}:
                return QuantizedTensor(q=node["q"], scale=node["scale"])
            if set(node.keys()) == {"qp", "gscale"}:
                return Quantized4Tensor(qp=node["qp"], gscale=node["gscale"])
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(params)
