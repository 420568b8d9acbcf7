"""Packaging metadata (pyproject.toml) stays consistent with the code.

The reference ships loose scripts with no package structure
(ref README.md "python vae.py ..."); atlasvae is an installable
package with console entry points, so the script targets and the
package-data native sources must keep resolving.
"""

import importlib
import os

import atlasvae

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read_pyproject():
    import pytest
    # tomllib is 3.11+; pyproject declares requires-python >=3.10, so a
    # 3.10 interpreter must skip these tests, not error collecting them
    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve_to_callables():
    cfg = _read_pyproject()
    scripts = cfg["project"]["scripts"]
    assert len(scripts) >= 6
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_version_matches_package():
    cfg = _read_pyproject()
    assert cfg["project"]["version"] == atlasvae.__version__


def test_native_sources_ship_as_package_data():
    cfg = _read_pyproject()
    patterns = cfg["tool"]["setuptools"]["package-data"]["atlasvae"]
    assert "_native/*.cpp" in patterns
    from atlasvae import _native
    for name in ("rootio_decode", "bumphunter_oracle"):
        assert os.path.isfile(_native.source_path(name))


def test_native_build_falls_back_to_cache_dir(tmp_path, monkeypatch):
    """Installed wheels land in read-only site-packages; build() must
    divert the .so to ATLASVAE_NATIVE_CACHE instead of failing — keyed
    on the source hash so upgrading a wheel (whose reproducible
    timestamps defeat an mtime check) can never reuse a stale build."""
    import hashlib
    from atlasvae import _native
    monkeypatch.setattr(_native.os, "access", lambda p, m: False)
    monkeypatch.setenv("ATLASVAE_NATIVE_CACHE", str(tmp_path))
    out = _native._output_path("rootio_decode")
    with open(_native.source_path("rootio_decode"), "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    assert out == str(tmp_path / f"librootio_decode-{tag}.so")
    # a source change must produce a different cache name
    alt = tmp_path / "alt.cpp"
    alt.write_bytes(b"// changed\n")
    monkeypatch.setattr(_native, "source_path", lambda name: str(alt))
    assert _native._output_path("rootio_decode") != out


def test_native_cache_prunes_stale_hashes(tmp_path, monkeypatch):
    """A rebuilt cache library removes superseded source-hash builds
    (wheel upgrades must not accumulate orphaned .so files)."""
    from atlasvae import _native
    monkeypatch.setattr(_native.os, "access", lambda p, m: False)
    monkeypatch.setenv("ATLASVAE_NATIVE_CACHE", str(tmp_path))
    (tmp_path / "librootio_decode.so").write_bytes(b"old unhashed")
    (tmp_path / "librootio_decode-0123456789ab.so").write_bytes(b"old hash")
    out = _native.build("rootio_decode")
    assert os.path.isfile(out) and os.path.dirname(out) == str(tmp_path)
    leftovers = sorted(os.listdir(tmp_path))
    assert leftovers == [os.path.basename(out)], leftovers
