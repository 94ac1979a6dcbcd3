#!/usr/bin/env python3
"""Cross-engine twin of Similarity.planeCountFor (dev tool only).

The Scala side derives the hyperplane count as
    p = max(4, |{ g in [0,30] : 2^(g+11) < n }|)
and the DuckDB oracles derive it in SQL (the `nplanes` CTE).  This script
evaluates the EXACT oracle SQL fragment over a sweep of corpus sizes and
compares it against the formula, including the pinned table asserted by
TopKAndPrefixSpec ("planeCountFor: integer-exact ...") — one table, three
implementations, zero drift.
"""
import duckdb
import sys

NPLANES_SQL = """SELECT GREATEST(4, (
    SELECT count(*) FROM generate_series(0, 30) AS g(g)
    WHERE CAST(power(2, g.g + 11) AS BIGINT) < {n}))"""

def formula(n: int) -> int:
    return max(4, sum(1 for g in range(31) if (1 << (g + 11)) < n))

# pinned table — keep in lockstep with TopKAndPrefixSpec
PINNED = [(0, 4), (1, 4), (500, 4), (2000, 4), (2048, 4), (2049, 4),
          (4096, 4), (4097, 4), (60000, 5), (100000, 6), (1000000, 9),
          (10000000, 13), (1000000000, 19), (100000000000, 26)]

def main() -> int:
    con = duckdb.connect()
    bad = 0
    sweep = sorted({n for n, _ in PINNED}
                   | {2 ** k for k in range(1, 45)}
                   | {2 ** k + 1 for k in range(1, 45)}
                   | {2 ** k - 1 for k in range(1, 45)})
    for n in sweep:
        got = con.sql(NPLANES_SQL.format(n=n)).fetchone()[0]
        want = formula(n)
        if got != want:
            print(f"MISMATCH n={n}: sql={got} formula={want}")
            bad += 1
    for n, p in PINNED:
        if formula(n) != p:
            print(f"PINNED TABLE DRIFT n={n}: formula={formula(n)} pinned={p}")
            bad += 1
    print(f"planes_check: {len(sweep)} sizes swept, "
          f"{len(PINNED)} pinned, {bad} mismatches")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
