"""Expression-composition helpers shared by the Catalyst layer."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let_"]


def let_(col: Column, f) -> Column:
    """Bind ``col`` to a lambda variable so it is evaluated once per
    row: ``transform(array(col), f)[0]``. Catalyst never substitutes a
    lambda variable with its defining expression, so every reference
    inside ``f`` shares the single evaluation — the per-row ``let``
    that stops Python Column-tree composition from pasting a shared
    subexpression into every consumer (PLANS.md #17; the scalar
    sibling of the #1 MinHash trap)."""
    return F.transform(F.array(col), f)[0]
