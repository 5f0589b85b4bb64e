"""Load the actual reference PyTorch code (/root/reference) as a parity oracle.

The reference depends on ``rotary_embedding_torch``, which is not installed;
``tests/_vendor`` provides an API-compatible shim (our own implementation of
the interleaved-pair convention) so the reference modules import unchanged.
Test-only machinery — the shipped framework never touches /root/reference.
"""

import importlib.util
import os
import sys
import types

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
_VENDOR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def _load(modname: str, relpath: str):
    if modname in sys.modules:
        return sys.modules[modname]
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REFERENCE_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_mss_module():
    """The reference ``models/mss_tflocoformer.py`` module."""
    return _load("ref_mss_tflocoformer", "models/mss_tflocoformer.py")


def reference_standalone_modules():
    """The reference ``standalone/`` pair (tflocoformer, bslocoformer)."""
    if "ref_standalone" not in sys.modules:
        pkg = types.ModuleType("ref_standalone")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "standalone")]
        sys.modules["ref_standalone"] = pkg
    tf = _load("ref_standalone.tflocoformer_separator",
               "standalone/tflocoformer_separator.py")
    bs = _load("ref_standalone.bslocoformer_separator",
               "standalone/bslocoformer_separator.py")
    return tf, bs
