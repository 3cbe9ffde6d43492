"""DuckDB oracle comparison harness (mirrors the driver's t2 check:
row count + schema + order-insensitive value hash, columns sorted by
name before hashing)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from docker_aktin_dwh_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            out[c] = s.map(_norm_obj)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
    out = out.sort_values(by=list(out.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)
    return out


def _norm_obj(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return str(v)


def compare(spark_df, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    sp = canonicalize(spark_df.toPandas())
    du = canonicalize(duck_pdf)
    if list(sp.columns) != list(du.columns):
        return False, f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return False, f"row count differs: spark={len(sp)} duck={len(du)}"
    for c in sp.columns:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa = a.astype("float64")
            bb = b.astype("float64")
            ok = ((aa.isna() & bb.isna())
                  | (aa == bb)
                  | ((aa - bb).abs() < 1e-9)).all()
        else:
            av = a.map(_norm_obj)
            bv = b.map(_norm_obj)
            # pandas elementwise == treats None as missing (None != None),
            # so count both-missing as equal explicitly
            ok = bool(((av.isna() & bv.isna()) | (av == bv)).all())
        if not ok:
            bad = None
            for i in range(len(sp)):
                va, vb = a.iloc[i], b.iloc[i]
                same = (pd.isna(va) and pd.isna(vb)) or va == vb
                if not same:
                    bad = (i, va, vb)
                    break
            return False, f"column {c} differs, first diff {bad}"
    return True, "ok"
