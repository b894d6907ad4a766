"""IP address expressions — native Catalyst, no Python UDF.

The reference computes the /24 network of an IPv4-as-int with a
pickled Python UDF over the `ipaddress` module (hha.py:20, applied at
hha.py:161,166), forcing a JVM->Python round trip per row and breaking
whole-stage codegen. The /24 network base of an integer IPv4 is just
the address with the low 8 bits cleared, so a single JVM-side bitmask
expression replaces it and stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 0xFFFFFF00 — clear host byte
_NET24_MASK = 0xFFFFFF00


def ip_to_net24(ip: Column | str) -> Column:
    """/24 network base address of an IPv4-as-int column (LongType).

    Replaces the reference's `IpToNetwork` UDF (hha.py:20). Stays
    numeric (LongType) instead of the reference's stringified int; the
    value is identical (`str(int(x))` vs `x`).
    """
    col = F.col(ip) if isinstance(ip, str) else ip
    return col.bitwiseAND(F.lit(_NET24_MASK))


def net24_base(ip_int: int) -> int:
    """Driver-side helper with identical semantics (for tests/oracles)."""
    return ip_int & _NET24_MASK
