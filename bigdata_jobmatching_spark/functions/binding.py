"""Catalyst-native let-binding.

Spark's CollapseProject optimizer inlines aliased expressions into
every consuming expression. For a reused *expensive* subexpression
(a tokenize-regex chain referenced inside a 32-way higher-order
minhash loop) this turns O(1) evaluations per row into O(k) — we
measured a 50x slowdown on shingling.

``let(value, fn)`` forces once-per-row evaluation natively: the value
becomes the element of a one-element array and ``fn`` receives the
*bound lambda variable* (a cheap reference), which CollapseProject
cannot inline through. Zero Python-per-row; one tiny array
allocation per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and pass the bound variable to
    ``fn``. Works for any value type (bind several via ``F.struct``).
    """
    return F.transform(F.array(value), fn)[0]
