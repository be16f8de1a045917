"""Load reference modules directly as test oracles.

The reference package's __init__ imports heavy optional dependencies
(polars, fastapi, sentence-transformers), so modules are loaded under a
synthetic package whose __path__ points at the reference source — relative
imports resolve, the real __init__ never runs.  Two tiny dependency stubs
make the pure-algorithm modules importable in this environment:

- ``loguru``: most reference modules do ``from loguru import logger`` and
  only call logging methods on it — stubbed with a no-op logger.
- ``numba``: utils.py decorates pure-numpy functions with ``@njit``; the
  stub makes the decorator an identity, so the reference's own Python
  bodies execute (same values, interpreted speed).

Nothing here copies reference code — it EXECUTES the reference as the
ground truth the parity tests compare against.
"""

import importlib
import sys
import types

REF_PKG_DIR = "/root/reference/search_engine"
_PKG = "ref_search_engine"


class _NoopLogger:
    def __getattr__(self, name):
        return lambda *a, **k: None


def _njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]
    return lambda f: f


def load(modname: str):
    """Import reference module ``modname`` (e.g. 'bm25', 'chunker')."""
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")
        loguru.logger = _NoopLogger()
        sys.modules["loguru"] = loguru
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = _njit
        sys.modules["numba"] = numba
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REF_PKG_DIR]
        sys.modules[_PKG] = pkg
    return importlib.import_module(f"{_PKG}.{modname}")
