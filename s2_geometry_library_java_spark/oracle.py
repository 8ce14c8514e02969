"""DuckDB oracle-SQL generators.

The driver's correctness gate runs each ``queries()`` DataFrame against an
ANSI-SQL oracle in DuckDB. For cell-id operators the oracle must recompute
the Hilbert encode *independently of the numpy kernel* — this module emits
plain SQL that does so: the 1024-entry 4-bit lookup table is inlined as a
VALUES list and applied through 8 chained CTE joins, mirroring the spec of
S2CellId.fromFaceIJ (S2CellId.java:1206-1240) in pure integer SQL.

Also provides pure-SQL cell-id bit algebra (level/parent/range) matching
functions/columns.py, so joins and rollups can be verified end-to-end.
"""

from __future__ import annotations

from .kernel.cellid import LOOKUP_POS

MAX_LEVEL = 30
TWO_61 = 1 << 61


def lookup_pos_values() -> str:
    """The LOOKUP_POS table as a SQL VALUES list (key -> 10-bit value)."""
    pairs = ",".join(f"({k},{int(v)})" for k, v in enumerate(LOOKUP_POS))
    return f"(VALUES {pairs}) AS __lut(lk, lv)"


def hilbert_encode_sql(pts_sql: str, carry_cols: list[str]) -> str:
    """SQL computing ``cell_id`` (signed-int64 raw bits, leaf level) from a
    subquery ``pts_sql`` exposing integer columns face, i, j plus
    ``carry_cols`` passed through.

    Returns a full SELECT usable as a CTE body or subquery.
    """
    carry = ", ".join(carry_cols)
    carry_comma = f"{carry}, " if carry else ""
    sql = f"WITH __pts AS ({pts_sql}),\n"
    sql += f"__s8 AS (SELECT {carry_comma}face, i, j, (face & 1) AS bits, CAST(0 AS BIGINT) AS pos FROM __pts)"
    for k in range(7, -1, -1):
        prev = f"__s{k + 1}"
        cur = f"__s{k}"
        idx = (
            f"(bits + (((i >> {k * 4}) & 15) << 6) + (((j >> {k * 4}) & 15) << 2))"
        )
        # At k=7 only 4 pos bits are meaningful (i,j < 2^30): mask before the
        # shift or DuckDB's checked << overflows (Java/numpy wrap silently).
        chunk = ("((CAST(lv AS BIGINT) >> 2) & 15)" if k == 7 else "(CAST(lv AS BIGINT) >> 2)")
        sql += (
            f",\n{cur} AS (SELECT {carry_comma}face, i, j, (lv & 3) AS bits, "
            f"(pos | ({chunk} << {k * 8})) AS pos "
            f"FROM {prev} JOIN {lookup_pos_values()} ON __lut.lk = {idx})"
        )
    # signed two's-complement assembly: faces 4,5 wrap negative.
    sql += (
        f"\nSELECT {carry_comma}"
        f"(CASE WHEN face >= 4 THEN face - 8 ELSE face END) * {TWO_61} "
        f"+ pos * 2 + 1 AS cell_id FROM __s0"
    )
    return sql


# -- pure-SQL cell-id bit algebra (twin of functions/columns.py) -------------

def lsb_sql(cid: str) -> str:
    return f"(({cid}) & (-({cid})))"


def level_sql(cid: str) -> str:
    return (
        f"CAST({MAX_LEVEL} - CAST(log2(CAST({lsb_sql(cid)} AS DOUBLE)) AS BIGINT) / 2 "
        f"AS INTEGER)"
    )


def lsb_for_level_sql(level: str) -> str:
    return f"(CAST(1 AS BIGINT) << (2 * ({MAX_LEVEL} - ({level}))))"


def parent_sql(cid: str, level: str) -> str:
    lsb = lsb_for_level_sql(level)
    return f"((({cid}) & (-{lsb})) | {lsb})"


def range_min_sql(cid: str) -> str:
    return f"(({cid}) - ({lsb_sql(cid)} - 1))"


def range_max_sql(cid: str) -> str:
    return f"(({cid}) + ({lsb_sql(cid)} - 1))"


def biased_sql(cid: str) -> str:
    return f"xor(({cid}), CAST(-9223372036854775808 AS BIGINT))"


def token_sql(cid: str) -> str:
    """16-digit lowercase zero-padded hex, trailing zeros stripped."""
    return (
        f"(CASE WHEN ({cid}) = 0 THEN 'X' ELSE "
        f"regexp_replace(lower(lpad(hex({cid}), 16, '0')), '0+$', '') END)"
    )


def md5_hash32_sql(expr: str, seed: int) -> str:
    """Portable deterministic 32-bit string hash: first 8 hex chars of
    md5(seed || value). Twin of the Spark conv(substr(md5(..)))."""
    return f"CAST(('0x' || substr(md5('{seed}:' || ({expr})), 1, 8)) AS BIGINT)"
