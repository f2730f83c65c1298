"""Hash functions (no_hash/hash32/hash64/crc/hashmd5, ecl/hql/
hqlexpr.hpp:330-333,566 in the reference).

The reference's HASH32/HASH64 are FNV-style and CRC is hardware CRC32 —
algorithm-specific bits are not portable semantics (even the reference's
engines only promise self-consistency), so we map to Spark's native
hashes: stable within this engine, vectorized, and usable for DISTRIBUTE/
dedup exactly like the originals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ecl_hash32(*cols: Column | str) -> Column:
    """HASH32 → Murmur3 32-bit (Spark ``hash``)."""
    return F.hash(*[F.col(c) if isinstance(c, str) else c for c in cols])


def ecl_hash64(*cols: Column | str) -> Column:
    """HASH64 → xxhash64."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def ecl_hashcrc(col: Column | str) -> Column:
    """HASHCRC → crc32 over the string bytes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.crc32(c.cast("binary"))


def ecl_hashmd5(col: Column | str) -> Column:
    """HASHMD5 → md5 hex over the UTF-8 bytes (cross-engine stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))
