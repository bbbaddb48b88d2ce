"""Build-on-first-use for the native CPU kernels.

The reference ships a platform-dispatching setup.py that compiles Cython
extensions at install time (reference setup.py:10-77); here the C++ source
(csrc/tvdn_cpu.cpp) is compiled once with the system compiler and cached
next to the package. No Cython, no build-time dependency: ``g++ -O3
-fopenmp -shared -fPIC`` is the whole build system.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB_PATH: Optional[str] = None
_FAILED = False

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_DIR = os.path.dirname(_PKG_DIR)
_SRC = os.path.join(_REPO_DIR, "csrc", "tvdn_cpu.cpp")
_OUT = os.path.join(_PKG_DIR, "cpp", "_tvdn_cpu.so")
_STAMP = _OUT + ".hash"


def _src_hash() -> str:
    """Hash of the source + a host ISA fingerprint. The cache key must not
    be an mtime (after a fresh clone mtimes are arbitrary), and because we
    compile ``-march=native`` the fingerprint must be finer than the
    architecture name: on a shared filesystem, an AVX-512 host's binary
    reused by a non-AVX-512 host would load fine and SIGILL at call time.
    The CPU feature-flag set plus the compiler version pin the binary to
    the microarchitecture class that built it."""
    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    h.update(os.uname().machine.encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    cc = _compiler()
    if cc:
        try:
            out = subprocess.run([cc, "--version"], capture_output=True,
                                 text=True, timeout=10).stdout
            h.update(out.splitlines()[0].encode() if out else b"")
        except Exception:
            pass
    return h.hexdigest()


def _compiler() -> Optional[str]:
    for cc in ("g++", "clang++", "c++"):
        if shutil.which(cc):
            return cc
    return None


def build_native(force: bool = False) -> Optional[str]:
    """Compile (if needed) and return the shared-library path, or None if
    no compiler/source is available (the JAX backends remain fully
    functional without it)."""
    global _LIB_PATH, _FAILED
    with _LOCK:
        if _LIB_PATH and not force:
            return _LIB_PATH
        if _FAILED and not force:
            return None
        if not os.path.exists(_SRC):
            _FAILED = True
            return None
        want = _src_hash()
        if not force and os.path.exists(_OUT) and os.path.exists(_STAMP):
            try:
                with open(_STAMP) as f:
                    have = f.read().strip()
            except OSError:
                have = ""
            if have == want:
                _LIB_PATH = _OUT
                return _OUT
        cc = _compiler()
        if cc is None:
            _FAILED = True
            return None
        cmd = [
            cc, "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
            "-march=native", _SRC, "-o", _OUT,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError:
            # retry without -march=native (unsupported on some toolchains)
            cmd.remove("-march=native")
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
            except subprocess.CalledProcessError:
                _FAILED = True
                return None
        try:
            with open(_STAMP, "w") as f:
                f.write(want)
        except OSError:
            pass
        _LIB_PATH = _OUT
        return _OUT
