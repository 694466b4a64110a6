"""On-demand build of the _fastingest C extension.

Invokes the system C compiler directly (no pip/pybind11 in the image) and
caches the .so next to this module. Thread-unsafe first build is fine: worst
case two processes race and one wins the atomic rename.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
import tempfile
from typing import Optional

_CACHED = None
_TRIED = False


def _src_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)),
                        "csrc", "fastingest.c")


def _so_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(here, f"_fastingest{suffix}")


def build(verbose: bool = False) -> Optional[str]:
    so = _so_path()
    src = _src_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cc = os.environ.get("CC", "gcc")
    include = sysconfig.get_paths()["include"]
    with tempfile.NamedTemporaryFile(
            suffix=".so", dir=os.path.dirname(so), delete=False) as tmp:
        tmp_path = tmp.name
    cmd = [cc, "-shared", "-fPIC", "-O3", f"-I{include}", src, "-o", tmp_path]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        os.replace(tmp_path, so)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        if verbose:
            print(f"fastingest build failed: {e}", file=sys.stderr)
        return None


def load_fastingest():
    """The _fastingest module, or None when unavailable."""
    global _CACHED, _TRIED
    if _TRIED:
        return _CACHED
    _TRIED = True
    if build() is None:
        return None
    import importlib.util

    spec = importlib.util.spec_from_file_location("_fastingest", _so_path())
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
        _CACHED = mod
    except Exception:
        _CACHED = None
    return _CACHED
