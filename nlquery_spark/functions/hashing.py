"""The repo-wide portable 64-bit uniform hash.

ONE definition of the cross-engine hash convention every sampler,
sharder, and drawer in this codebase relies on: the first 64 bits of
md5 as an unsigned integer, held in decimal(20,0) (LongType cannot
represent the full unsigned range). DuckDB oracles reproduce it as
``('0x' || substr(md5(x), 1, 16))::UBIGINT`` and Python as
``int(md5(x).hexdigest()[:16], 16)`` — bit-identical across engines,
partitionings, and retries, which is what makes samples/shards
resumable and auditable where ``rand()``/``xxhash`` defaults are not.

A second or third inline copy of this expression is how the convention
silently forks — import this instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def md5_u64(col) -> "F.Column":
    """First 64 bits of md5(col) as decimal(20,0) (unsigned)."""
    return F.conv(F.substring(F.md5(col), 1, 16), 16, 10).cast("decimal(20,0)")


def md5_u64_py(s: str) -> int:
    """The SAME hash for Python-side kernels (Arrow UDF batches):
    bit-identical to :func:`md5_u64` and the DuckDB UBIGINT form."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
