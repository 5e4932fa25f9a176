#!/usr/bin/env python3
"""Lint oracle SQL for DuckDB-version-sensitive constructs.

Round 10's driver run flipped nine gates red whose oracles leaned on
constructs whose results drift across DuckDB builds even though each
build is self-consistent. This lint bans those construct classes from
every algebraic oracle (the value-pinned VALUES literals are immune by
construction: strtod / exact integer & decimal literals only).

Banned (case-insensitive, scanned over the oracle-SQL region of
SparkEntry.scala — the `oracleSql` map plus every `*OracleSql` helper
template — and the pinned resources as a belt-and-braces check):

  1. `CAST(round(...) AS ...)` — a double round() feeding a cast
     (usually to DECIMAL) double-rounds: the inner round's half-rule on
     DOUBLE and the cast's tie handling are both engine-build-dependent.
     EXCEPTION: `CAST(round(ln(x), 9) AS DECIMAL(p, >=12))` (and log):
     the 9-rounded double sits within ~1e-13 of the 9-decimal grid
     point, so a scale>=12 cast lands mid-interval, never at a tie —
     this is the repo's documented ulp-absorption discipline for
     transcendental outputs and is tie-free by construction.

  2. Single-argument `round(x)` or `round(x, 0)` — round-to-integer of
     a DOUBLE. Use `floor(x + 0.5)` (floor is exact IEEE: identical on
     every engine/version evaluating the same double; for the
     non-negative quantities these oracles round it IS half-up).
     For cents: `CAST(floor(price * 100 + 0.5) AS BIGINT)`.

  3. `sum(CAST(... AS DECIMAL ...)) OVER` — a running/windowed decimal
     sum: exact in any one engine but the class that drifted in r10's
     driver build (q250). Running sums belong in 64-bit integer
     micro-units (`floor(x*1e6 + 0.5)`), divided once at the end.

Display rounding — `round(x, n)` with 1 <= n <= 9 on a FINAL output
column, no downstream arithmetic or cast — stays sanctioned: both
engines round the bit-identical double, and the inputs this repo
rounds (single correctly-rounded divisions of exact sums) do not land
on representable decimal midpoints.

Exit 1 with findings, 0 clean. Run by gen_gate_index.py before every
index regeneration.
"""
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
ENTRY = os.path.join(ROOT, "src", "main", "scala", "graft",
                     "SparkEntry.scala")
PINNED = os.path.join(ROOT, "src", "main", "resources", "graft", "pinned")

# the ulp-absorption discipline: CAST(round(ln|log(...), 9) AS DECIMAL)
LN_DISCIPLINE = re.compile(r"CAST\(\s*round\(\s*(ln|log)\s*\(", re.I)
CAST_ROUND = re.compile(r"CAST\(\s*round\(", re.I)


def dec_win_sum_spans(text):
    """Spans of sum(<contains DECIMAL>) immediately followed by OVER."""
    spans = []
    for m in re.finditer(r"\bsum\(", text, re.I):
        i, depth = m.end(), 1
        while i < len(text) and depth > 0:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        seg = text[m.start():i]
        if re.search(r"DECIMAL", seg, re.I) and \
                re.match(r"\s*OVER\b", text[i:], re.I):
            spans.append((m.start(), seg))
    return spans


def round_to_int_spans(text):
    """Spans of round(...) with no top-level comma or a literal-0 arg."""
    spans = []
    for m in re.finditer(r"\bround\(", text, re.I):
        i, depth, top_comma = m.end(), 1, None
        while i < len(text) and depth > 0:
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1 and top_comma is None:
                top_comma = i
            i += 1
        seg = text[m.start():i]
        if top_comma is None or re.search(r",\s*0\s*\)$", seg):
            spans.append((m.start(), seg))
    return spans


def oracle_region(src):
    """SparkEntry text that produces oracle SQL: every *OracleSql helper
    plus everything from `def oracleSql` to EOF (the literal map)."""
    parts = []
    for m in re.finditer(r"private def \w*OracleSql\w*\(", src):
        end = src.find("\n  }", m.start())
        parts.append(src[m.start():end if end > 0 else m.start() + 4000])
    parts.append(src[src.index("def oracleSql"):])
    return parts


def main():
    findings = []
    src = open(ENTRY).read()
    for part in oracle_region(src):
        name = part[:60].replace("\n", " ")
        for m in CAST_ROUND.finditer(part):
            if LN_DISCIPLINE.match(part, m.start()):
                continue
            findings.append(
                f"CAST(round(...)): near '{part[m.start():m.start()+70]}'")
        for pos, seg in round_to_int_spans(part):
            findings.append(f"round-to-integer: '{seg[:70]}'")
        for pos, seg in dec_win_sum_spans(part):
            findings.append(f"decimal window sum: '{seg[:70]}'")
    if os.path.isdir(PINNED):
        for f in sorted(os.listdir(PINNED)):
            text = open(os.path.join(PINNED, f)).read()
            if re.search(r"\bround\(|\bsum\(", text, re.I):
                findings.append(f"pinned resource {f} contains computation")
    if findings:
        print(f"ORACLE LINT: {len(findings)} version-sensitive construct(s)")
        for f in findings:
            print("  -", " ".join(f.split()))
        return 1
    print("oracle lint: clean (no version-sensitive constructs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
