#!/usr/bin/env python3
"""Dev harness: prove the DuckDB side of the MomentGuard envelope raises
on the same inputs the Spark side raises on (MomentGuardSpec's cases).
The fragment text below must stay in sync with graft.util.MomentGuard —
MomentGuardSpec pins Spark↔Duck fragment identity, this script pins the
Duck fragment's runtime behavior.

Usage: python3 scripts/guard_check.py   (exit 0 = both cases behave)
"""
import duckdb, sys

GUARD = ("CASE WHEN CAST(count(*) AS DOUBLE) * CAST(max(abs(t)) AS DOUBLE) <= 9.0e18 "
         "THEN CAST(sum(t) AS BIGINT) ELSE CAST(error('spec: BIGINT moment may overflow "
         "(n * max|term| > 9.0e18); widen to DECIMAL(38,0) or shard the group') "
         "AS BIGINT) END")
QUANT = ("CASE WHEN abs(v) <= 3000 THEN CAST(round((v) * 1000) AS BIGINT) "
         "ELSE CAST(error('spec: value outside quantization envelope "
         "(|value| > 3000)') AS BIGINT) END")

con = duckdb.connect()
ok = con.execute(
    f"SELECT {GUARD} AS s FROM (SELECT unnest([1000000,1000000,1000000,1000000,1000000]) AS t)"
).fetchone()[0]
assert ok == 5000000, ok

try:
    con.execute(
        f"SELECT {GUARD} AS s FROM (SELECT unnest(["
        "4000000000000000000,1,1]) AS t)"
    ).fetchone()
    sys.exit("over-bound group did NOT raise in DuckDB")
except duckdb.Error as e:
    assert "BIGINT moment may overflow" in str(e), e

ok = con.execute(f"SELECT {QUANT} AS q FROM (SELECT 2.5 AS v)").fetchone()[0]
assert ok == 2500, ok
try:
    con.execute(f"SELECT {QUANT} AS q FROM (SELECT 3000.5 AS v)").fetchone()
    sys.exit("out-of-envelope value did NOT raise in DuckDB")
except duckdb.Error as e:
    assert "outside quantization envelope" in str(e), e

print("guard_check: both DuckDB guard raises match the Spark side")
