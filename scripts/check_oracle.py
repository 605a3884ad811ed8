#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name + rows by value, and compares cell by
cell. Reports per-query PASS/FAIL with the first diff. Dev-only tool — not
part of the shipped library.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float) \
            and math.isnan(a) and math.isnan(b):
        return True
    # Compare formatted values, like the driver's hasher: float64 5.0
    # ("5.0") != int64 5 ("5"), so a DuckDB HUGEINT/DECIMAL column that
    # pandas widens to float64 fails against a Spark BIGINT — this is
    # exactly what made q23/q31 driver-red in rounds 2-3 while the old
    # fetchall()-based check (HUGEINT -> python int) passed.
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark result dir")
            n_fail += 1
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        try:
            # Fetch through pandas so DuckDB HUGEINT/DECIMAL columns widen
            # to float64 exactly as they would in the driver's hasher.
            spd = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).df()
            sdf = list(spd.itertuples(index=False, name=None))
            scols = list(spd.columns)
            opd = con.execute(oracles[name]).df()
            odf = list(opd.itertuples(index=False, name=None))
            ocols = list(opd.columns)
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        sc, sr = canon(sdf, scols)
        oc, orr = canon(odf, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, orr)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not cells_equal(x, y):
                    bad = (i, sc[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
