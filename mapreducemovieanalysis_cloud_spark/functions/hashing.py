"""Engine-neutral hash-bucketing expressions.

One definition for the md5-prefix bucket idiom used by deterministic
sampling, stratified sampling, and the count-min sketch, so the
engine-side expression and its DuckDB oracle twin stay synchronized in a
single place. (SimHash in operators/dedup.py keeps its own wider-window
md5 slicing — different substring offsets, documented there.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(col: str | Column, mod: int, salt: str = "") -> Column:
    """Leading 16 bits of md5(salt || str(col)), mod ``mod``.

    A pure function of the key value: stable across engines,
    partitionings, retries, and appends. DuckDB twin::

        CAST(('0x' || substr(md5('<salt>' || CAST(x AS VARCHAR)), 1, 4))
             AS INTEGER) % <mod>
    """
    s = (F.col(col) if isinstance(col, str) else col).cast("string")
    base = F.concat(F.lit(salt), s) if salt else s
    return F.conv(F.substring(F.md5(base), 1, 4), 16, 10).cast("long") % mod
