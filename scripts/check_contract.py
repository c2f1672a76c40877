"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf dir,
compare row count, column names, and values (exact where possible,
reporting max float deviation otherwise).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import glob
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cuplyr_spark.session import get_session


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        try:
            import numpy as np

            if np.issubdtype(out[c].dtype, np.floating):
                continue
        except Exception:
            pass
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class mirroring the driver's typed value-hash: an
    int64 Spark column vs a HUGEINT/object DuckDB column must FAIL even
    when the Python values compare equal."""
    import numpy as np

    if np.issubdtype(s.dtype, np.floating):
        return "float"
    if np.issubdtype(s.dtype, np.integer):
        return "int"
    if s.dtype == bool:
        return "bool"
    if str(s.dtype).startswith("datetime"):
        return "datetime"
    # object: look at the first non-null value
    for v in s:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        return "str"
    return "empty"


def compare(name, got: pd.DataFrame, want: pd.DataFrame) -> tuple[bool, str]:
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns {sorted(got.columns)} vs {sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"rows {len(got)} vs {len(want)}"
    for c in got.columns:
        gk, wk = _dtype_kind(got[c]), _dtype_kind(want[c])
        if "empty" in (gk, wk):
            continue
        if gk != wk:
            return False, f"dtype mismatch in {c}: spark={got[c].dtype}({gk}) vs oracle={want[c].dtype}({wk})"
    a, b = normalize(got), normalize(want)
    max_dev = 0.0
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for x, y in zip(av, bv):
            xna = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            yna = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xna and yna:
                continue
            if xna != yna:
                return False, f"null mismatch in {c}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                if float(x) != float(y):
                    dev = abs(float(x) - float(y))
                    max_dev = max(max_dev, dev)
                    if dev > 1e-6:
                        return False, f"value mismatch in {c}: {x!r} vs {y!r}"
            elif x != y:
                return False, f"value mismatch in {c}: {x!r} vs {y!r}"
    note = f"FLOAT-DEV {max_dev:.2e} (exact-hash would FAIL)" if max_dev > 0 else "exact"
    return True, note


def source_hash() -> str:
    """sha256 over the contract surface (__spark_entry__.py + every
    engine module). Recorded in the ledger JSON; tests fail when the
    committed ledger's hash no longer matches the tree — the guard that
    keeps a green-but-stale ledger from shipping (the round-3 failure
    mode: entry edits landed after the last full contract run)."""
    import hashlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = [os.path.join(root, "__spark_entry__.py")] + sorted(
        glob.glob(os.path.join(root, "cuplyr_spark", "**", "*.py"), recursive=True)
    )
    h = hashlib.sha256()
    for p in files:
        h.update(p.removeprefix(root).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    # --time-spark-only: additionally record a bench-comparable
    # `spark_sec` per query (noop sink, 1 warmup + median of 3 — the
    # bench's methodology), so ledger-to-ledger perf deltas mean
    # something; the default `sec` still covers spark + duckdb +
    # compare and is unchanged for older-ledger comparability.
    time_spark = "--time-spark-only" in argv
    if time_spark:
        argv.remove("--time-spark-only")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        tname = os.path.basename(path).replace(".parquet", "")
        con.execute(f"CREATE OR REPLACE VIEW {tname} AS SELECT * FROM read_parquet('{path}')")

    spark = get_session(app_name="contract_check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    ledger = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            ledger[name] = {"status": "FAIL", "err": f"spark: {str(e)[:200]}"}
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            elapsed = time.time() - t0
            print(f"SKIP {name}: no oracle (rows-only) — {len(got)} rows, {elapsed:.1f}s")
            ledger[name] = {
                "status": "ROWS_ONLY",
                "rows": len(got),
                "sec": round(elapsed, 2),
                "err": None,
            }
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            ledger[name] = {"status": "FAIL", "err": f"duckdb: {str(e)[:200]}"}
            n_fail += 1
            continue
        ok, note = compare(name, got, want)
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        elapsed = time.time() - t0
        spark_sec = None
        if time_spark and ok:
            import statistics as _st

            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warmup
            samples = []
            for _ in range(3):
                s0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - s0)
            spark_sec = round(_st.median(samples), 4)
        extra = f", spark {spark_sec}s" if spark_sec is not None else ""
        print(f"{status} {name}: {note} ({len(got)} rows, {elapsed:.1f}s{extra})")
        ledger[name] = {
            "status": status,
            "note": note,
            "rows": len(got),
            "oracle_rows": len(want),
            "sec": round(elapsed, 2),
            "err": None if ok else note,
        }
        if spark_sec is not None:
            ledger[name]["spark_sec"] = spark_sec
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "source_hash": source_hash(),
                    "partial": sorted(only) if only else None,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": sum(1 for v in ledger.values() if v["status"] == "ROWS_ONLY"),
                    "queries": ledger,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    # entry smoke
    rows = entrymod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
