"""Shared CLI flag helpers.

The reference uses ``argparse type=bool`` for several flags
(``code/main.py:40,59`` etc.), which silently parses ``--flag False`` as
True (``bool('False')`` is truthy).  "Implement the intent": these flags
accept explicit true/false words and reject anything else.
"""

from __future__ import annotations

import argparse

_TRUE = {"1", "true", "t", "yes", "y", "on"}
_FALSE = {"0", "false", "f", "no", "n", "off"}


def str2bool(value) -> bool:
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in _TRUE:
        return True
    if v in _FALSE:
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")
