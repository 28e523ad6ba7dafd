"""Float-output invariant audit (round-7 verdict task 3).

The driver's correctness gate hashes EXACT values, so any oracle-paired
entry that emits a float column is only green if Spark and DuckDB produce
bit-identical doubles. That invariant has two safe foundations and one
unsafe one:

- **IEEE-exact**: the output is produced by IEEE-754 basic operations
  (+ - * / sqrt, casts) over identical inputs in the same order on both
  sides, or is decimal-derived. Basic ops are correctly rounded by the
  standard, so identical expressions are engine-exact BY CONSTRUCTION —
  no libm involved.
- **quantized**: the output passes through a transcendental (ln, exp,
  pow, trig — only faithfully rounded, implementations legally differ by
  1 ulp) but is rounded on BOTH sides to a grid ≥6 orders of magnitude
  coarser than the drift, so a different libm cannot flip the hash.
- **libm-luck**: a raw transcendental output (or a decimal cast fine
  enough to preserve 1-ulp drift) reaches the boundary. Green only while
  both engines' libm agree on the sampled domain — the failure mode that
  shipped `scalar_math_funcs2` red in round 6.

This tool runs every oracle-paired entry at a small SF, finds float
output columns, greps the query source for transcendental calls, and
emits a classification table (used to build FLOATS.md). Entries flagged
`CHECK` have both float outputs and transcendental calls and must be
manually classified as quantized / decimal-path / libm-luck.
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_capstone_spark.catalog import load_all
from data_engineering_capstone_spark.session import get_spark

TRANSCENDENTAL = re.compile(
    r"\bF\.(log|log10|log1p|log2|exp|expm1|pow|power|sin|cos|tan|atan|atan2|"
    r"asin|acos|cbrt|sinh|cosh|tanh|hypot)\b"
    r"|\b(ln|log|log10|log2|exp|pow|power|sin|cos|tan|atan|atan2|expm1|log1p)\s*\("
)
# sqrt is IEEE-correctly-rounded — exempt.

# Helper functions that contain transcendental calls: a query whose
# source references one of these names inherits the dependency even
# though the call site lives in another module.
TRANSCENDENTAL_HELPERS = (
    "psi_term",                  # functions/drift.py — F.log
    "quality_classifier_score",  # llm/scoring.py — F.exp (sigmoid)
    "_bm25_scored",              # queries_llm.py — F.log (IDF)
    "_sigmoid_log1p",            # queries_udf.py — np.log1p/np.exp
)


def classify(sf_dir: str) -> list[tuple[str, str, list[str], list[str]]]:
    catalog = load_all()
    spark = get_spark("float_audit")
    rows = []
    for name, spec in sorted(catalog.items()):
        if spec.oracle is None:
            continue
        df = spec.fn(spark, sf_dir)
        float_cols = [f.name for f in df.schema.fields
                      if f.dataType.typeName() in ("double", "float")]
        if not float_cols:
            continue
        src = inspect.getsource(spec.fn) + (spec.oracle or "")
        trans = sorted({m.group(0).strip("(F. \t") for m in TRANSCENDENTAL.finditer(src)})
        trans += [h for h in TRANSCENDENTAL_HELPERS if h in src]
        flag = "TRANSCENDENTAL" if trans else "ieee"
        rows.append((name, flag, float_cols, trans))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rows = classify(sf_dir)
    print(f"{len(rows)} oracle-paired entries emit float columns")
    for name, flag, float_cols, trans in rows:
        print(f"{flag:14s} {name:40s} float_cols={float_cols} trans={trans}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
