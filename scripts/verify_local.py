#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script just lets us catch
oracle mismatches before the driver does).

Usage: python3 scripts/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, sorts columns by name, and compares row-by-row hashes.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def frame_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. tools/ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noracle = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_cols, spark_rows = frame_rows(con, f"SELECT * FROM '{d}/*.parquet'")
        if name not in oracles:
            print(f"  ~ {name}: no oracle ({len(spark_rows)} rows, rows-only check)")
            n_noracle += 1
            continue
        try:
            o_cols, o_rows = frame_rows(con, oracles[name])
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        if [c.lower() for c in spark_cols] != [c.lower() for c in o_cols]:
            print(f"  ✗ {name}: column mismatch spark={spark_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(o_rows):
            print(f"  ✗ {name}: row count spark={len(spark_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(spark_rows, o_rows)) if a != b]
        if bad:
            i = bad[0]
            print(f"  ✗ {name}: {len(bad)}/{len(o_rows)} rows differ; first at {i}:")
            print(f"      spark : {spark_rows[i]}")
            print(f"      oracle: {o_rows[i]}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(o_rows)} rows match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

def parse_bench_tail(text, tail_chars=2000):
    """Replica of the round driver's bench capture: keep the last
    `tail_chars` characters, then try to json-parse each line — raw first,
    then with a leading "[level] " logger prefix stripped — and return the
    last object that looks like the Bench summary ({"metric": ...}).

    Returns the parsed dict or None (the driver's `parsed` field).
    """
    import re
    tail = text[-tail_chars:]
    hit = None
    for line in tail.splitlines():
        for cand in (line, re.sub(r"^\[\w+\]\s*", "", line)):
            cand = cand.strip()
            if not cand.startswith("{"):
                continue
            try:
                obj = json.loads(cand)
            except Exception:
                continue
            if isinstance(obj, dict) and "metric" in obj:
                hit = obj
            break
    return hit


def bench_tail_main(path):
    """`verify_local.py --bench-tail <file>`: file holds a captured
    `sbt "runMain graft.Bench"` output (or a BENCH_rN.json whose `tail`
    field to check). Prints the parsed summary or fails loudly.
    """
    with open(path) as f:
        text = f.read()
    # Accept a driver BENCH_rN.json directly: parse its `tail` field.
    try:
        as_json = json.loads(text)
        if isinstance(as_json, dict) and "tail" in as_json:
            text = as_json["tail"]
    except Exception:
        pass
    parsed = parse_bench_tail(text)
    if parsed is None:
        print("parsed: null — the driver would NOT extract a bench number")
        sys.exit(1)
    print(json.dumps({"parsed": parsed}, indent=2))
    # Strict-mode check: would it also parse with NO prefix-stripping and
    # only the raw lines (the most conservative driver implementation)?
    raw_only = None
    for line in text[-2000:].splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
                if isinstance(obj, dict) and "metric" in obj:
                    raw_only = obj
            except Exception:
                pass
    print(f"raw-line-only parse: {'OK' if raw_only else 'FAIL — line still prefixed/truncated'}")
    sys.exit(0 if raw_only else 1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--bench-tail":
        bench_tail_main(sys.argv[2])
    else:
        main()
