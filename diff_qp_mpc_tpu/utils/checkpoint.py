"""Checkpointing (reference: torch.save of state_dict + args every 100
iters, train.py:117-124,195-196). Uses flax serialization; optimizer state
IS checkpointed (the reference skips it — noted in SURVEY.md §5)."""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    meta: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, template: Any) -> Any:
    """template: a pytree with the same structure (e.g. {'params': ...,
    'opt_state': ...}) used to restore types/shapes."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
