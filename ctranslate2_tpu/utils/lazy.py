"""Deferred load-time weight transforms.

Eager per-weight work (host transposes, AWQ nibble unpack/repack) is the
dominant model-load cost: numpy does strided copies single-threaded, and
eager device ops cost one dispatch round-trip per weight. Param builders
emit ``Pending`` markers instead; ``finalize_params``
(models/params.py) resolves every marker in ONE jitted program — raw
host buffers batch-transfer and all transforms compile together.
"""

from __future__ import annotations

from typing import Callable, Optional


class Pending:
    """A parameter leaf awaiting a device-side transform.

    ``fn(*args)`` builds the final array with jnp ops (traced inside the
    finalize jit). ``host_fn(*args)``, when given, materializes the same
    value eagerly with numpy — used by code paths that must manipulate
    the array before finalization (e.g. splitting fused QKV).
    """

    __slots__ = ("fn", "args", "host_fn", "meta")

    def __init__(self, fn: Callable, args: tuple,
                 host_fn: Optional[Callable] = None, meta: dict = None):
        self.fn = fn
        self.args = tuple(args)
        self.host_fn = host_fn
        self.meta = meta or {}

    def host(self):
        """Materialize eagerly on the host."""
        if self.host_fn is not None:
            return self.host_fn(*self.args)
        import numpy as np

        return np.asarray(self.fn(*self.args))


def pending_transpose(array, dtype=None) -> Pending:
    """(out, in) -> (in, out) weight transpose, deferred."""
    meta = {"kind": "transpose", "dtype": dtype}
    if dtype is not None:
        return Pending(lambda a: a.astype(dtype).T, (array,),
                       host_fn=lambda a: a.T.astype(dtype), meta=meta)
    return Pending(lambda a: a.T, (array,), host_fn=lambda a: a.T,
                   meta=meta)
