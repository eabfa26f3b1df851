"""Device-mesh construction for the multi-chip paths.

Axes (MeshConfig): ``dp`` data, ``tp`` tensor (heads + KV-cache sharding),
``sp`` sequence/context.  The reference has no inter-device code (SURVEY
§2.6); these meshes lift its intra-device grid axes across chips — ``tp``
generalizes the B*H grid axis, ``sp`` generalizes the split-KV block axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from exploring_flash_attention_tpu.configs import MeshConfig


def make_mesh(
    config: MeshConfig,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = config.n_devices
    if len(devices) < n:
        raise ValueError(
            f"MeshConfig wants {n} devices ({config.shape}), "
            f"only {len(devices)} available"
        )
    arr = np.asarray(devices[:n]).reshape(config.shape)
    return Mesh(arr, axis_names=config.axis_names)
