"""Differential-test helper: compare a Spark result against a DuckDB
oracle order-insensitively (reference pattern: dplyr-as-oracle with
sort-before-compare, ``tests/testthat/test-workflow.R:28-55``)."""

from __future__ import annotations

import math

import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values, reset index — makes
    two frames comparable regardless of row/column order."""
    out = pdf[sorted(pdf.columns)].copy()
    # Arrow-backed dtypes from duckdb vs numpy dtypes from Spark: align.
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_frame_matches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rel: float = 1e-9, abs_: float = 1e-9):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if _is_na(x) and _is_na(y):
                continue
            if isinstance(x, float) or isinstance(y, float):
                assert _close(float(x), float(y), rel, abs_), f"{c}[{i}]: {x} != {y}"
            else:
                assert x == y, f"{c}[{i}]: {x!r} != {y!r}"


def _is_na(v) -> bool:
    try:
        return v is None or (isinstance(v, float) and math.isnan(v)) or pd.isna(v)
    except (TypeError, ValueError):
        return False


def _close(x: float, y: float, rel: float, abs_: float) -> bool:
    if math.isnan(x) and math.isnan(y):
        return True
    if math.isinf(x) or math.isinf(y):
        return x == y
    return math.isclose(x, y, rel_tol=rel, abs_tol=abs_)


def oracle(duck, sql: str) -> pd.DataFrame:
    return duck.execute(sql).fetchdf()
