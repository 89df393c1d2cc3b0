"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, sorted column names,
and cell values exactly (column-name-sorted, row-sorted) — stricter than any
reasonable value-hash, so passing here should pass the driver.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from bob_vector_db_spark.session import get_spark  # noqa: E402
from bob_vector_db_spark.sources.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
    if len(df) == 0:
        return df
    key = df.astype(str).agg("\x1f".join, axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    issues = []
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [i for i, (x, y) in enumerate(zip(sv, ov)) if not cells_equal(x, y)]
        if bad:
            i = bad[0]
            issues.append(f"col {c}: {len(bad)} diffs, first@{i}: spark={sv[i]!r} oracle={ov[i]!r}")
        # dtype drift warning (driver may hash dtype-sensitively)
        if str(s[c].dtype) != str(o[c].dtype):
            issues.append(f"col {c}: DTYPE spark={s[c].dtype} oracle={o[c].dtype}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        hard = [i for i in issues if not i.startswith("col") or "DTYPE" not in i]
        if hard:
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for i in issues[:8]:
                print(f"   {i}")
            n_fail += 1
        else:
            extra = "; ".join(i for i in issues if "DTYPE" in i)
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)"
                  + (f" [warn: {extra}]" if extra else ""))
            n_pass += 1

    if not only:
        t0 = time.time()
        res = entrymod.entry(spark)
        n = res.count()
        print(f"ENTRY smoke: {n} rows, schema={res.schema.simpleString()} ({time.time()-t0:.1f}s)")

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
