"""Backend probe shared by the ops dispatchers.

One definition instead of a copy in every kernel module: the probe must
recognize every TPU-like platform string ("axon" is the remote-tunnel TPU
registration this framework develops against), and a site missed during an
update would silently route to the slow interpret/oracle path.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when the default JAX backend is a (possibly tunneled) TPU."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
