#!/usr/bin/env python3
"""Self-test for pin_oracles.py's determinism refusal and NULL/NaN
fidelity. Run with the duckdb-capable interpreter:

  /root/.pyenv/shims/python3 tools/test_pin_oracles.py

1. A seeded-random dummy gate whose two "runs" differ by one double
   must be REFUSED (SystemExit) — the determinism proof is enforced,
   not assumed.
2. Identical runs containing a NULL double AND a NaN double must pin
   NULL as NULL and NaN as 'nan' — distinct, so a NULL→NaN regression
   in a double column fails the pinned gate.
3. Passing the same directory twice must be refused outright.
"""
import os
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pin_oracles  # noqa: E402


def write_gate(root, gate, rows_sql):
    d = os.path.join(root, gate)
    os.makedirs(d, exist_ok=True)
    duckdb.connect().sql(
        f"COPY ({rows_sql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")


def expect_refusal(fn, needle):
    try:
        fn()
    except SystemExit as e:
        msg = str(e)
        assert needle in msg, f"refusal lacked '{needle}': {msg}"
        return
    raise AssertionError(f"expected SystemExit containing '{needle}'")


def main():
    tmp = tempfile.mkdtemp(prefix="pin_selftest_")
    pin_dir = os.path.join(tmp, "pinned")
    pin_oracles.OUT_DIR = pin_dir  # keep the real resources untouched
    a, b = os.path.join(tmp, "a"), os.path.join(tmp, "b")

    # 1. nondeterministic dummy: the second "run" shifts one value, the
    #    way an unseeded sample or a partition-dependent tie-break would
    base = ("SELECT * FROM (VALUES (1, CAST(0.5 AS DOUBLE)), "
            "(2, CAST({v} AS DOUBLE))) t(id, score)")
    write_gate(a, "dummy_rand", base.format(v=0.25))
    write_gate(b, "dummy_rand", base.format(v=0.250000001))
    expect_refusal(lambda: pin_oracles.pin(a, b, "dummy_rand"),
                   "NOT deterministic")
    assert not os.path.exists(os.path.join(pin_dir, "dummy_rand.sql")), \
        "refused gate must not leave a pin file"

    # 2. deterministic gate with NULL and NaN doubles: both runs equal
    det = ("SELECT * FROM (VALUES "
           "(1, CAST(NULL AS DOUBLE)), "
           "(2, CAST('nan' AS DOUBLE)), "
           "(3, CAST(1.5 AS DOUBLE))) t(id, score)")
    write_gate(a, "dummy_det", det)
    write_gate(b, "dummy_det", det)
    pin_oracles.pin(a, b, "dummy_det")
    sql = open(os.path.join(pin_dir, "dummy_det.sql")).read()
    assert "(1, NULL)" in sql, f"NULL double must pin as NULL:\n{sql}"
    assert "(2, 'nan')" in sql, f"NaN double must pin as 'nan':\n{sql}"
    assert "(3, '1.5')" in sql, f"doubles pin as quoted strings:\n{sql}"
    # and the pin round-trips through DuckDB to the same values
    con = duckdb.connect()
    got = con.sql(sql).fetchall()
    assert got[0][1] is None and got[1][1] != got[1][1] \
        and got[2][1] == 1.5, f"pin round-trip mismatch: {got}"

    # 3. same-dir invocation is not a determinism proof
    import subprocess
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "pin_oracles.py"), a, a, "dummy_det"],
        capture_output=True, text=True)
    assert r.returncode != 0 and "TWO verify runs" in (r.stderr + r.stdout), \
        f"same-dir must be refused: rc={r.returncode} {r.stderr}"

    shutil.rmtree(tmp)
    print("pin_oracles selftest: all 3 checks passed")


if __name__ == "__main__":
    main()
