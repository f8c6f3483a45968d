#!/usr/bin/env python3
"""Local differential-correctness check: compare Verify's parquet dumps
against the DuckDB oracle (mirrors the driver's gate, but stricter:
exact value equality after normalization, row order included).

Usage: python tools/check_correctness.py [verify_out_dir] [sf_dir]
"""
import sys, os, json, glob, math, datetime, decimal

import duckdb
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def read_spark(name):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        return None, None
    t = pq.read_table(files[0])
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = [tuple(norm(v) for v in r) for r in zip(*[t.column(c).to_pylist() for c in cols])]
    return cols, rows


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        scols, srows = read_spark(name)
        if scols is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            ocols_raw = [c[0] for c in res.description]
            orows_raw = res.fetchall()
            # the driver compares pandas frames, where int-vs-float dtype
            # KIND differences (e.g. DuckDB HUGEINT -> float64) break the
            # value hash even when Python-level values compare equal
            odf = con.execute(sql).df()
            sdf_files = glob.glob(f"{OUT}/{name}/*.parquet")
            sdf = pq.read_table(sorted(sdf_files)[0]).to_pandas()
            for c in sdf.columns:
                if c in odf.columns:
                    sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
                    num = {"i": "n", "u": "n", "f": "f"}
                    if num.get(sk, sk) != num.get(ok, ok) and "O" not in (sk, ok):
                        print(f"FAIL {name}: dtype kind differs on {c}: "
                              f"spark {sdf[c].dtype} vs oracle {odf[c].dtype}")
                        raise SystemExit(f"dtype kind mismatch in {name}.{c}")
        except SystemExit:
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [tuple(norm(r[i]) for i in order) for r in orows_raw]
        if scols != ocols:
            print(f"FAIL {name}: columns differ\n  spark:  {scols}\n  oracle: {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            diffs = [(c, x, y) for c, x, y in zip(scols, a, b) if x != y]
            print(f"FAIL {name}: first diff at row {i}: {diffs[:4]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only
    for d in sorted(glob.glob(f"{OUT}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        _, rows = read_spark(name)
        status = "rows-only" if rows else "EMPTY"
        print(f"INFO {name}: {status} ({len(rows) if rows else 0} rows)")
        n_skip += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
