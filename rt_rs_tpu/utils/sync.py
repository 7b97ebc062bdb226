"""Host↔device synchronization that actually blocks.

The reference measures pure GPU compute-pass time with timestamp
queries (``src/lib/timing.rs:221-300``).  JAX's equivalent fence is
``block_until_ready`` — but under the axon TPU tunnel that call returns
before the device finishes (see CLAUDE.md / PERF.md), so every timing
consumer that relied on it was recording async-dispatch latency.  The
one reliable fence is to reduce the array to a scalar and pull it
through the host link: 4 bytes, one RTT, negligible next to a frame.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def device_sync(x) -> None:
    """Block the host until ``x`` has actually been computed."""
    x.block_until_ready()  # correct (and sufficient) everywhere but axon
    np.asarray(jnp.sum(x))
