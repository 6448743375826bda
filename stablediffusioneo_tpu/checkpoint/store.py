"""Native pipeline snapshots (orbax) — fast-reload deployment format.

Loading a 5.4 GB torch pickle and key-mapping it takes tens of seconds;
`save_pipeline` persists the already-converted {unet, controlnet, vae,
clip} trees with orbax so warm deployments skip the torch parse entirely
(together with the XLA compile cache this is the full warm-start story —
the reference's serialized-engine equivalent on the weights side).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def save_pipeline(path: str, params: Dict[str, Dict]) -> str:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    return path


def load_pipeline(path: str, like: Dict[str, Dict]) -> Dict[str, Dict]:
    """Restore a snapshot. `like` provides the tree structure/shapes
    (e.g. from jax.eval_shape over the init functions)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
