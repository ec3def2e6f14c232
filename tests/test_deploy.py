"""The --py-files artifact: the zip built by ``deploy.build_zip`` must be
a complete, self-sufficient copy of the engine — an executor Python
worker sees ONLY the zip on its path (that is what ``spark-submit
--py-files`` / ``sc.addPyFile`` provide), so every module the package
imports at module level has to resolve from inside it.

Reference analog: stellar-etl ships as a single static Go binary
(Dockerfile / GitHub releases); the PySpark equivalent of "one artifact
runs everywhere" is this zip.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import stellar_etl_spark
from stellar_etl_spark.deploy import build_zip

PKG_DIR = os.path.dirname(os.path.abspath(stellar_etl_spark.__file__))


def _all_modules() -> list[str]:
    """Every importable module path in the source tree."""
    mods = []
    for root, _, files in os.walk(PKG_DIR):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, f), os.path.dirname(PKG_DIR))
            mod = rel[: -len(".py")].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            mods.append(mod)
    return mods


def test_zip_contains_every_source_module(tmp_path):
    z = build_zip(str(tmp_path / "engine.zip"))
    names = set(zipfile.ZipFile(z).namelist())
    for root, _, files in os.walk(PKG_DIR):
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(
                    os.path.join(root, f), os.path.dirname(PKG_DIR)
                ).replace(os.sep, "/")
                assert rel in names, f"{rel} missing from the --py-files zip"


def test_every_module_imports_from_zip_alone(tmp_path):
    """Simulate an executor worker: the zip is the ONLY place the
    package can come from (repo dir absent from sys.path), and every
    module — operators, streaming, functions, CLI — must import."""
    z = build_zip(str(tmp_path / "engine.zip"))
    mods = _all_modules()
    assert len(mods) > 20  # the walk found the real tree
    prog = (
        "import sys\n"
        # drop any path that could shadow the zip with the source tree
        f"sys.path = [p for p in sys.path if not p.startswith({os.path.dirname(PKG_DIR)!r})]\n"
        f"sys.path.insert(0, {z!r})\n"
        "import importlib\n"
        f"for m in {mods!r}:\n"
        "    mod = importlib.import_module(m)\n"
        "    assert mod.__file__.startswith(sys.path[0]), (m, mod.__file__)\n"
        "print('imported', len(" + repr(mods) + "))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # not the repo root
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"imported {len(mods)}" in out.stdout
