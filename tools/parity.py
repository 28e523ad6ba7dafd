"""Local oracle-parity harness — mimics the driver's correctness gate.

Runs every catalog query through Spark AND its DuckDB oracle on the same
parquet, then compares row count, column names, and values (sorted by all
columns). Float comparison is BIT-EXACT by default — the driver hashes
exact values, and round 6 proved the old float-tolerant default ships
real driver failures green (scalar_math_funcs2, 1-ulp libm drift).
Pass --tolerant for triage-mode comparison (atol 1e-6 / rtol 1e-9) when
you want to see whether a mismatch is drift or a real value bug.

    python tools/parity.py [sf_dir] [query ...] [--tolerant]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_capstone_spark.catalog import load_all
from data_engineering_capstone_spark.session import get_spark
from data_engineering_capstone_spark.sources.testdata import TABLES

FLOAT_ATOL = 0.0  # bit-exact default (the driver's gate); --tolerant relaxes
FLOAT_RTOL = 0.0


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    import datetime as _dt

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        elif pdf[c].dtype == object:
            nonnull = pdf[c].dropna()
            if len(nonnull) and nonnull.map(lambda v: isinstance(v, (_dt.date, _dt.datetime))).all():
                pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
            else:
                pdf[c] = pdf[c].map(lambda v: str(v) if v is not None else None)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


# Engine-level type-class GATE (mapping shared with float_audit.py via
# tools/typeclass.py — round-8 ADVICE; see that module's docstring for
# why classification reads ENGINE types and which policy lives where).
# date-vs-timestamp is excluded from this HARD gate — the driver
# canonicalizes datetimes (judge-verified: scalar_date_funcs was green
# in r1/r2 with the skew live) — but float_audit reports it as a skew.
from tools.typeclass import CLASS_SKEWS as _CLASS_SKEWS  # noqa: E402
from tools.typeclass import duck_class as _duck_class  # noqa: E402
from tools.typeclass import spark_class as _spark_class  # noqa: E402


def typeclass_problems(spark_schema, duck_rel) -> list[str]:
    """Engine-type gate: Spark lazy schema vs DuckDB prepared types."""
    s_types = {f.name: _spark_class(f.dataType) for f in spark_schema.fields}
    d_types = dict(zip(duck_rel.columns, (_duck_class(t) for t in duck_rel.types)))
    problems = []
    for c in sorted(set(s_types) & set(d_types)):
        ca, cb = s_types[c], d_types[c]
        if ca != cb and {ca, cb} in _CLASS_SKEWS:
            problems.append(
                f"col {c}: engine type-class skew spark={ca} duck={cb} — the "
                f"driver hash distinguishes these even at equal values; cast "
                f"both sides"
            )
    return problems


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_f = pd.to_numeric(av, errors="coerce").astype(float)
            bv_f = pd.to_numeric(bv, errors="coerce").astype(float)
            if not np.allclose(av_f, bv_f, atol=FLOAT_ATOL, rtol=FLOAT_RTOL, equal_nan=True):
                bad = (~np.isclose(av_f, bv_f, atol=FLOAT_ATOL, rtol=FLOAT_RTOL, equal_nan=True)).sum()
                problems.append(f"col {c}: {bad} float mismatches (e.g. {av_f[~np.isclose(av_f, bv_f, atol=FLOAT_ATOL, rtol=FLOAT_RTOL, equal_nan=True)].head(3).tolist()} vs duck)")
        else:
            eq = (av.fillna("\0NULL") == bv.fillna("\0NULL")) if av.dtype == object else (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(f"col {c}: {int((~eq).sum())} mismatches (first at row {i}: spark={av[i]!r} duck={bv[i]!r})")
    return problems


def main() -> int:
    global FLOAT_ATOL, FLOAT_RTOL
    args = sys.argv[1:]
    if "--tolerant" in args:
        # triage mode: forgive float drift to separate "libm ulp" from
        # "wrong value" — NOT what the driver does (it hashes exact)
        FLOAT_ATOL = 1e-6
        FLOAT_RTOL = 1e-9
    types_only = "--types-only" in args
    # --exact kept as a no-op for muscle memory: exact IS the default
    args = [a for a in args if a not in ("--exact", "--tolerant", "--types-only")]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    catalog = load_all()
    names = args or list(catalog)
    spark = get_spark("parity")
    con = duck_con(sf_dir)
    failures = 0
    skipped_no_oracle = 0
    for name in names:
        spec = catalog[name]
        t0 = time.time()
        if types_only:
            # Schema-only boundary audit (round-9 verdict task 2): Spark
            # lazy schema vs DuckDB prepared types, no execution. Catches
            # the HUGEINT/DECIMAL-at-hashed-boundary class catalog-wide
            # in seconds instead of a full value-parity run.
            if spec.oracle is None:
                skipped_no_oracle += 1
                continue
            try:
                sdf = spec.fn(spark, sf_dir)
                tc_problems = typeclass_problems(sdf.schema, con.sql(spec.oracle))
            except Exception as exc:  # noqa: BLE001
                failures += 1
                print(f"FAIL  {name}: {exc}")
                continue
            if tc_problems:
                failures += 1
                print(f"FAIL  {name}:")
                for p in tc_problems:
                    print(f"      - {p}")
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        import decimal as _dec

        for c in spark_pdf.columns:
            col = spark_pdf[c]
            if col.dtype != object:
                continue
            nonnull = col.dropna()
            if nonnull.map(lambda v: isinstance(v, _dec.Decimal)).any():
                print(f"WARN  {name}: column {c!r} is DECIMAL at the output boundary — "
                      f"cast to double in the query (object dtype desyncs sorted comparison)")
            if nonnull.map(lambda v: isinstance(v, (list, np.ndarray, dict))).any():
                print(f"WARN  {name}: column {c!r} is ARRAY/MAP at the output boundary — "
                      f"flatten it (array_join / element_at): the driver's value-hash "
                      f"sorts all columns and list cells are unhashable there")
        if spec.oracle is None:
            print(f"ok    {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            tc_problems = typeclass_problems(sdf.schema, con.sql(spec.oracle))
            duck_pdf = con.execute(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = tc_problems + compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(spark_pdf)} rows):")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")
    audited = len(names) - skipped_no_oracle
    suffix = (f" ({skipped_no_oracle} rows-only entries skipped — no oracle to type-audit)"
              if skipped_no_oracle else "")
    print(f"\n{audited - failures}/{audited} queries match{suffix}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
