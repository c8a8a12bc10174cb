"""Bit-exact key hashes from the reference's star schema.

- X7 ``hashed_id``   = int(sha256(s).hexdigest(), 16) % (2**63 - 1)
  (Project_Scripts/08_sqlite_setup.py:28-30; 10_vector_database.py:8-10)
- X8 ``location_id`` = int(sha1(s).hexdigest(), 16) % (10**8)
  (Project_Scripts/08_sqlite_setup.py:82)

Both need 160/256-bit integer arithmetic, so they live in Arrow-batched
pandas UDFs (Python bigint is exact); Spark's ``sha2``/``xxhash64`` cannot
reproduce the modulus.  The UDFs are vectorized over Arrow batches — the
per-element hashlib call is unavoidable, but there is no per-row
serialization boundary.

DuckDB-oracle equivalence note (used by __spark_entry__.oracle_sql): with
p = 2**63 - 1, 2**64 ≡ 2 (mod p), so the sha256 hex can be folded 64 bits at
a time: r = (r * 2 + chunk) % p over the four 16-hex-digit chunks.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_P63 = (1 << 63) - 1


def hash_uuid_py(s: str) -> int:
    """Reference X7, exact (08_sqlite_setup.py:28-30)."""
    return int(hashlib.sha256(s.encode()).hexdigest(), 16) % _P63


def location_id_py(s: str) -> int:
    """Reference X8, exact (08_sqlite_setup.py:82)."""
    return int(hashlib.sha1(s.encode()).hexdigest(), 16) % (10**8)


@F.pandas_udf(LongType())
def hashed_id_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else hash_uuid_py(v)).astype("Int64")


@F.pandas_udf(LongType())
def location_id_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else location_id_py(v)).astype("Int64")


def hashed_id_sql(col: Column) -> Column:
    """Pure-SQL (JVM-side, codegen-able) equivalent of X7 using the
    2**64 ≡ 2 (mod 2**63-1) folding trick over sha256 hex chunks.

    conv(hex,16,10) returns an unsigned decimal *string*; chunks are up to
    2**64-1 so they go through DECIMAL(38,0) before the fold.
    """
    h = F.sha2(col, 256)
    r = F.lit(0).cast("decimal(38,0)")
    for i in range(4):
        chunk = F.conv(F.substring(h, 1 + 16 * i, 16), 16, 10).cast("decimal(38,0)")
        r = F.pmod(r * 2 + chunk, F.lit(_P63).cast("decimal(38,0)"))
    return r.cast("long")
