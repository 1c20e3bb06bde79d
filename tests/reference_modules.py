"""Import helpers for the REAL reference implementation (torch CPU).

The reference at /root/reference/code runs on CPU for everything that does
not touch Kaolin/CUDA (models, quaternion ops, camera transforms, the
termination-prob math).  The parity suite (tests/test_reference_parity.py)
drives those modules with the SAME weights as this framework and asserts
forward equality — converting BASELINE's "outputs matching the PyTorch
reference" north star from claim to test.

Import quirks handled here:

* ``code/`` is not a package; most modules do flat imports
  (``from basic_blocks import ...``) -> both ``code/`` and ``code/utils``
  go on sys.path.
* ``code/utils/effective_loss_function.py`` uses RELATIVE imports
  (``from ..camera...``) -> it must be imported as a submodule of a package
  whose ``__path__`` is ``code/``; we synthesize one ("refcode") without
  writing anything to the read-only reference checkout.
"""

from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference/code"


def add_reference_paths() -> None:
    # models/ on the path: models.encoder does ``from basic_blocks import``
    for p in (REF, f"{REF}/utils", f"{REF}/models"):
        if p not in sys.path:
            sys.path.append(p)  # append: never shadow framework modules


def import_flat(name: str):
    """Import a flat reference module (models.gan, rendering.utils, ...)."""
    add_reference_paths()
    return importlib.import_module(name)


def import_refcode(name: str):
    """Import a reference module that uses relative imports (utils.*)."""
    add_reference_paths()
    if "refcode" not in sys.modules:
        pkg = types.ModuleType("refcode")
        pkg.__path__ = [REF]
        sys.modules["refcode"] = pkg
    return importlib.import_module(f"refcode.{name}")
