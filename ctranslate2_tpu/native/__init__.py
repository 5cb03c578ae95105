"""Native host-runtime core: compiled on first import, Python fallbacks
otherwise.

Exposes:
  - ``Vocabulary``      fast token<->id hashing
  - ``RequestQueue``    bounded MPMC queue with timeout batch collection
  - ``rebatch``         length-sorted descending batching
  - ``parse_model_index``  zero-copy model.bin header parse
  - ``available``       True when the C++ extension loaded
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ct2tpu_host.cpp")

available = False
Vocabulary = None
RequestQueue = None
rebatch = None
parse_model_index = None


def _build() -> str:
    """Compile the extension in-place (g++, no setuptools ceremony)."""
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_HERE, "ct2tpu_host" + suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    include = sysconfig.get_path("include")
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", out + ".tmp",
    ]
    # Sanitizer / debug flags for CI (the reference runs an ASan job:
    # reference .github/workflows/ci.yml:74-123). e.g.
    # CT2TPU_NATIVE_CFLAGS="-fsanitize=address -g" plus LD_PRELOAD of
    # libasan when running Python.
    extra = os.environ.get("CT2TPU_NATIVE_CFLAGS")
    if extra:
        cmd[1:1] = extra.split()
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(out + ".tmp", out)
    return out


def _load():
    global available, Vocabulary, RequestQueue, rebatch, parse_model_index
    try:
        _build()
        if _HERE not in sys.path:
            sys.path.insert(0, _HERE)
        import ct2tpu_host  # noqa: F401

        Vocabulary = ct2tpu_host.Vocabulary
        RequestQueue = ct2tpu_host.RequestQueue
        rebatch = ct2tpu_host.rebatch
        parse_model_index = ct2tpu_host.parse_model_index
        available = True
    except Exception:  # noqa: BLE001 — fall back to pure Python
        available = False


_load()
