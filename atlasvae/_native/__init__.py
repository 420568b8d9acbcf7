"""On-demand g++ builds for the framework's native helpers.

The C++ sources live in this package directory so installed wheels
carry them (pyproject ``package-data``).  ``build(name)`` compiles
``<name>.cpp`` to ``lib<name>.so`` next to the source when the
directory is writable (the repo-checkout case), else into a per-user
cache directory (the installed-package case), with an atomic rename so
a concurrent loader never dlopens a half-written library.  Cache
libraries are keyed on a hash of the source bytes
(``lib<name>-<sha1[:12]>.so``) so upgrading an installed wheel — whose
reproducible timestamps would defeat an mtime check — can never reuse
a stale build; the writable-checkout path keeps the cheap mtime check
(source edits bump mtime there).  Callers degrade gracefully: every
native helper has a pure-Python/JAX fallback (etl/rootnative.py,
stats/native.py).
"""

import hashlib
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))


def source_path(name: str) -> str:
    return os.path.join(_DIR, name + ".cpp")


def _output_path(name: str) -> str:
    out = os.path.join(_DIR, "lib" + name + ".so")
    if os.access(_DIR, os.W_OK):
        return out
    with open(source_path(name), "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache = os.environ.get("ATLASVAE_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "atlasvae")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"lib{name}-{tag}.so")


def build(name: str) -> str:
    """Compile (if stale/missing) and return the shared-library path.

    Raises CalledProcessError/FileNotFoundError when g++ is missing or
    the compile fails — callers catch and fall back.
    """
    src = source_path(name)
    out = _output_path(name)
    if (not os.path.isfile(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(out))
        os.close(fd)
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC",
                            "-o", tmp, src], check=True)
            os.replace(tmp, out)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        _prune_cache(name, out)
    return out


def _prune_cache(name: str, keep: str) -> None:
    """Drop superseded cache builds of ``name`` (older source hashes and
    the pre-hash ``lib<name>.so`` spelling) so wheel upgrades don't
    accumulate one orphaned .so per source revision.  Only the per-user
    cache is pruned — never the package directory build."""
    cache_dir = os.path.dirname(keep)
    if os.path.realpath(cache_dir) == os.path.realpath(_DIR):
        return
    import glob
    for stale in glob.glob(os.path.join(cache_dir, f"lib{name}*.so")):
        if stale != keep:
            try:
                os.unlink(stale)
            except OSError:
                pass  # concurrent builder; best-effort cleanup
