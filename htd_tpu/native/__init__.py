"""Native (C++) components, built lazily with graceful fallback.

`get_coco_match()` returns the compiled matching core or None; the
numpy evaluator in htd_tpu.data.coco_eval is the fallback.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "_build")
_failed = False
_mod = None


def build_coco_match() -> Optional[str]:
    """Compile coco_match.cpp into htd_tpu/native/_build. Returns .so path."""
    os.makedirs(_BUILD, exist_ok=True)
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so = os.path.join(_BUILD, "coco_match" + ext)
    src = os.path.join(_HERE, "coco_match.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", so,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def get_coco_match():
    """Import (building if needed) the native module, or None on failure."""
    global _mod, _failed
    if _mod is not None or _failed:
        return _mod
    try:
        build_coco_match()
        if _BUILD not in sys.path:
            sys.path.insert(0, _BUILD)
        import coco_match  # type: ignore

        _mod = coco_match
    except Exception:
        _failed = True
        _mod = None
    return _mod
