"""Every entry-point script and tool must at least byte-compile.

The tools under tools/ are run ad hoc on hardware windows and are not
exercised by the suite; a syntax error there surfaces exactly when a scarce
TPU window opens (it happened once: a trailing comma turned a bench.py
expression into a generator and broke the capture gate). Byte-compiling is
a 100 ms guard against that whole class — no imports are executed, so the
tools' env-mutating prologues (platform pins, cache dirs) stay inert.
"""
import pathlib
import py_compile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

SCRIPTS = sorted(
    [p for p in REPO.glob("*.py")] + [p for p in (REPO / "tools").glob("*.py")]
)


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: str(p.relative_to(REPO)))
def test_script_byte_compiles(path, tmp_path):
    py_compile.compile(str(path), cfile=str(tmp_path / "out.pyc"), doraise=True)
