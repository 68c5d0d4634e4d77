#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate (NOT part of the
library): run `sbt runMain graft.Verify <sfDir> <out>` first, then this script
runs each oracle_sql.json query in DuckDB over the same parquet tables and
compares against the Spark parquet results.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut>
"""
import json
import sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_parity_errors(expected: pd.DataFrame,
                        actual: pd.DataFrame) -> list:
    """Fail any column whose oracle dtype is float/decimal while the Spark
    parquet dtype is integer (round-12 verdict: DuckDB widens windowed
    sum(BIGINT) to HUGEINT, which arrives as float64 through arrow while
    Spark emits int64 — equal values, split typed hash in the driver).
    NaN-bearing oracle floats are exempt: a nullable int lands as float64
    through pandas on BOTH sides, so the driver sees matching types there.
    """
    import decimal
    errs = []
    for c in sorted(set(expected.columns) & set(actual.columns)):
        e, a = expected[c], actual[c]
        if not pd.api.types.is_integer_dtype(a):
            continue
        if pd.api.types.is_float_dtype(e) and not e.isna().any():
            errs.append(f"col {c}: oracle {e.dtype} vs spark {a.dtype} "
                        f"(un-cast HUGEINT/DOUBLE in oracle projection?)")
        elif e.dtype == object:
            nn = e.dropna()
            if len(nn) and isinstance(nn.iloc[0], decimal.Decimal):
                errs.append(f"col {c}: oracle DECIMAL vs spark {a.dtype} "
                            f"(cast the oracle column to BIGINT)")
    return errs


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints -> int64, floats -> float64, ts -> us
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected_raw = con.execute(sql).df()
            actual_raw = pd.read_parquet(f"{out_dir}/{name}")
            parity = dtype_parity_errors(expected_raw, actual_raw)
            if parity:
                for p in parity:
                    print(f"FAIL {name}: dtype parity — {p}")
                failures += 1
                continue
            expected = normalize(expected_raw)
            actual = normalize(actual_raw)
            if list(expected.columns) != list(actual.columns):
                print(f"FAIL {name}: columns {list(actual.columns)} != "
                      f"{list(expected.columns)}")
                failures += 1
                continue
            if len(expected) != len(actual):
                print(f"FAIL {name}: rows {len(actual)} != {len(expected)}")
                failures += 1
                continue
            ok = True
            for c in expected.columns:
                e, a = expected[c], actual[c]
                if pd.api.types.is_float_dtype(e):
                    import numpy as np
                    bad = pd.Series(
                        ~np.isclose(e, a, rtol=0, atol=1e-9, equal_nan=True),
                        index=e.index)
                    if bad.any():
                        i = bad.idxmax()
                        print(f"FAIL {name}: col {c} row {i}: "
                              f"{a[i]!r} != {e[i]!r}")
                        ok = False
                        break
                else:
                    neq = ~((e == a) | (e.isna() & a.isna()))
                    if neq.any():
                        i = neq.idxmax()
                        print(f"FAIL {name}: col {c} row {i}: "
                              f"{a[i]!r} != {e[i]!r}")
                        ok = False
                        break
            if ok:
                print(f"OK   {name} ({len(expected)} rows)")
            else:
                failures += 1
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            failures += 1
    print(f"== {len(oracle) - failures}/{len(oracle)} queries match ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
