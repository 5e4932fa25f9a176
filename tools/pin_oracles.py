#!/usr/bin/env python3
"""Generate value-pinned DuckDB oracles for seeded-deterministic gates.

Some gates (seeded LSH pair lists, ANN shortlists, BPE merge tables,
sketch estimates) compute functions that plain ANSI SQL cannot re-derive,
so they cannot get an algebraic DuckDB oracle. But their outputs ARE pure
deterministic functions of the input tables: same parquet in, same rows
out, at any parallelism. For those, the oracle is an EXPECTED TABLE —
a VALUES literal of the full result at the driver's verification scale
(sf0.01) — so any drift in a seeded path fails the correctness gate
instead of only a unit test.

The determinism proof is part of the pin, not an honor-system step:
this script takes TWO verify output dirs — produced by `graft.Verify`
runs at DIFFERENT SPARK_GRAFT_CPUS (different shuffle partitioning) —
and refuses to pin any gate whose canonicalized results differ between
the runs. Values are compared exactly (NULL, NaN, and every IEEE bit
pattern are distinct).

Usage:
  pin_oracles.py <verifyOutDirA> <verifyOutDirB> <gate> [gate ...]

Writes src/main/resources/graft/pinned/<gate>.sql for each gate; wire the
names into SparkEntry.pinnedOracleGates.
"""
import math
import os
import sys

import duckdb

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "main", "resources", "graft", "pinned")

# The driver-proven pin type set. DECIMAL and DATE are REFUSED by
# design: in round 11, across all 54 pinned gates, exactly the 8 pins
# containing a DECIMAL(p,s) literal column hash-failed in the driver's
# canonicalization while all 46 pins without one passed (and no green
# pin contained a DATE). Gates must re-emit decimals as micro-integer
# BIGINTs or strings, and dates as ISO strings, BEFORE pinning.
SUPPORTED = {"BIGINT", "INTEGER", "DOUBLE", "BOOLEAN", "VARCHAR"}
REFUSED_HINT = (
    "the driver's hash canonicalization rejects pinned DECIMAL/DATE "
    "literals (r11 evidence: 8/8 DECIMAL pins red, 46/46 others green). "
    "Re-emit the column as BIGINT micro-units or an ISO/plain string "
    "on the Spark side, then re-pin.")


def load(con, out: str, gate: str):
    """Canonicalized (cols, types, rows) for one gate's verify output.

    fetchall(), NOT .df(): pandas renders a genuinely-NULL DOUBLE cell
    as NaN, which would pin NULL as 'nan' and (with check.py's NaN==NaN
    rule) make the pinned gate blind to a NULL→NaN regression. DuckDB's
    native fetch keeps None and float('nan') distinct.
    ORDER BY ALL gives a deterministic row order (DuckDB sorts NULL and
    NaN deterministically; Python tuple-sort would choke on None/NaN).
    """
    rel = con.sql(
        f"SELECT * FROM '{out}/{gate}/*.parquet' ORDER BY ALL")
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    for c, t in zip(cols, types):
        if t == "DATE" or t.startswith("DECIMAL("):
            raise SystemExit(
                f"REFUSING to pin {gate}: column {c} is {t} — {REFUSED_HINT}")
        if t not in SUPPORTED:
            raise SystemExit(
                f"{gate}: unsupported column type {c}:{t}; extend pin_oracles")
    return cols, types, rel.fetchall()


def cell_key(v):
    """Exact-equality key: NULL, NaN and each IEEE bit pattern distinct."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        return ("f", math.isnan(v), repr(v) if not math.isnan(v) else "")
    return ("v", v)


def lit(v, duckt: str) -> str:
    if v is None:
        return "NULL"
    if duckt == "DOUBLE":
        # quoted string, resolved by the outer CAST(... AS DOUBLE): strtod
        # is correctly rounded, so repr()'s shortest round-trip form lands
        # on the same IEEE bits. A bare decimal literal would be parsed as
        # DECIMAL first and can land one ULP off.
        if isinstance(v, float) and math.isnan(v):
            return "'nan'"
        if isinstance(v, float) and math.isinf(v):
            return f"'{'-' if v < 0 else ''}inf'"
        return "'" + repr(float(v)) + "'"
    if duckt == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if duckt == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    return str(int(v))


def pin(out_a: str, out_b: str, gate: str) -> None:
    con = duckdb.connect()
    cols, types, rows = load(con, out_a, gate)
    cols_b, types_b, rows_b = load(con, out_b, gate)
    # --- determinism proof: the two differently-partitioned runs must
    # agree bit-for-bit, or the gate has no business being value-pinned
    if cols != cols_b or types != types_b:
        raise SystemExit(
            f"REFUSING to pin {gate}: schema differs between runs "
            f"({cols}:{types} vs {cols_b}:{types_b})")
    ka = [tuple(cell_key(v) for v in r) for r in rows]
    kb = [tuple(cell_key(v) for v in r) for r in rows_b]
    if ka != kb:
        diff = next((i for i, (x, y) in enumerate(zip(ka, kb)) if x != y),
                    min(len(ka), len(kb)))
        a_row = rows[diff] if diff < len(rows) else "<missing>"
        b_row = rows_b[diff] if diff < len(rows_b) else "<missing>"
        raise SystemExit(
            f"REFUSING to pin {gate}: output is NOT deterministic across "
            f"shuffle partitionings ({len(rows)} vs {len(rows_b)} rows; "
            f"first difference at sorted row {diff}:\n  A: {a_row}\n"
            f"  B: {b_row}).\nFix the operator (seeded hashes, total "
            f"ordering) before pinning.")

    vals_rows = ["  (" + ", ".join(
        lit(v, t) for v, t in zip(r, types)) + ")" for r in rows]
    sel = ", ".join(
        f"CAST(c{i} AS {t}) AS {c}"
        for i, (c, t) in enumerate(zip(cols, types)))
    alias = ", ".join(f"c{i}" for i in range(len(cols)))
    sql = (f"-- value-pinned expected table for {gate} at sf0.01\n"
           f"-- generated by tools/pin_oracles.py (determinism proven by\n"
           f"-- byte-comparing two differently-partitioned Verify runs);\n"
           f"-- regenerate after any intentional change to the seeded path\n"
           f"SELECT {sel}\nFROM (VALUES\n" + ",\n".join(vals_rows) +
           f"\n) t({alias})\n")
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{gate}.sql")
    with open(path, "w") as f:
        f.write(sql)
    print(f"pinned {gate}: {len(rows)} rows -> {path}")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    if os.path.realpath(dir_a) == os.path.realpath(dir_b):
        raise SystemExit(
            "determinism proof requires TWO verify runs at different "
            "SPARK_GRAFT_CPUS — got the same directory twice")
    for g in sys.argv[3:]:
        pin(dir_a, dir_b, g)
