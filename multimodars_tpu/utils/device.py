"""Host→device transfer helpers.

Over a tunneled/remote backend every *eager* op dispatch costs a full
round-trip (~30–140 ms measured on the axon tunnel), while plain array
transfers are ~1 ms/MB.  ``jnp.asarray(x, dtype=...)`` on a host array whose
dtype differs dispatches an eager ``convert_element_type`` on the device —
the single most expensive innocent-looking line in a host/device pipeline.

Rule: cast on the host with numpy, then transfer; never let an eager device
op sneak into the boundary.
"""

from __future__ import annotations

import numpy as np


def to_device(x, dtype=None, sharding=None):
    """Host-cast ``x`` to ``dtype`` (numpy), then transfer in one hop.

    ``sharding``: optional jax sharding — uses ``jax.device_put`` onto it.
    """
    import jax
    import jax.numpy as jnp

    arr = np.asarray(x)
    if dtype is not None and arr.dtype != np.dtype(dtype):
        arr = arr.astype(dtype)
    if sharding is not None:
        return jax.device_put(arr, sharding)
    return jnp.asarray(arr)
