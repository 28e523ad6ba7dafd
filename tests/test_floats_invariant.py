"""Drift guard for the FLOATS.md float-exactness invariant (round 7).

The driver hashes exact values, so every oracle-paired entry emitting a
double must be either ieee-exact (basic ops only) or quantized at the
boundary. `tools/float_audit.py` detects transcendental dependencies by
source scan; this test pins its output to the documented classification
so a NEW entry that adds a transcendental (or routes one through a new
helper) fails CI until it is classified in FLOATS.md and quantized —
the enforcement the round-6 `scalar_math_funcs2` failure showed was
missing.
"""

from __future__ import annotations

import ast
import inspect
import re
import textwrap

import pytest

from data_engineering_capstone_spark.catalog import load_all

# The 15 entries allowed to depend on transcendentals — every one
# quantizes at the output boundary (see FLOATS.md for the per-entry
# mechanism). Adding a name here requires adding the FLOATS.md row.
DOCUMENTED_TRANSCENDENTAL = {
    "etl_benford_report",
    "etl_psi_drift",
    "llm_bm25_search",
    "llm_dsir_weights",
    "llm_hybrid_rrf_search",
    "llm_kl_drift",
    "llm_perplexity_filter",
    "llm_quality_classifier",
    "llm_tfidf_top_terms",
    "llm_unigram_logprob",
    "llm_zipf_fit",
    "scalar_math_funcs",
    "scalar_math_funcs2",
    "stream_psi_drift",
    "udf_pandas_scalar",
}

TRANSCENDENTAL = re.compile(
    r"\bF\.(log|log10|log1p|log2|exp|expm1|pow|power|sin|cos|tan|atan|atan2|"
    r"asin|acos|cbrt|sinh|cosh|tanh|hypot)\b"
    r"|\b(ln|log|log10|log2|exp|pow|power|sin|cos|tan|atan|atan2|expm1|log1p)"
    r"\s*\("
)
HELPERS = (
    "psi_term",
    "quality_classifier_score",
    "_bm25_scored",
    "_sigmoid_log1p",
)


def _code_only(fn) -> str:
    """Function source with the decorator (which embeds the oracle SQL),
    the docstring, and comments removed — classification must track CODE,
    not prose: a docstring sentence like "ln() is only faithfully
    rounded" must not flip the pinned set (round-8 ADVICE fix)."""
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    fdef = tree.body[0]
    fdef.decorator_list = []
    if (
        fdef.body
        and isinstance(fdef.body[0], ast.Expr)
        and isinstance(fdef.body[0].value, ast.Constant)
        and isinstance(fdef.body[0].value.value, str)
    ):
        fdef.body = fdef.body[1:] or [ast.Pass()]
    return ast.unparse(tree)


def _sql_code_only(oracle: str | None) -> str:
    """Oracle SQL with `-- ...` line comments stripped (same prose rule)."""
    return re.sub(r"--[^\n]*", "", oracle or "")


def _depends_on_transcendental(fn, oracle: str | None) -> bool:
    src = _code_only(fn) + _sql_code_only(oracle)
    if TRANSCENDENTAL.search(src):
        return True
    return any(h in src for h in HELPERS)


def test_transcendental_entries_are_exactly_the_documented_set():
    """Source-level scan (no Spark session needed): the set of
    oracle-paired entries whose query source or oracle SQL touches a
    transcendental must equal the FLOATS.md quantized list — a new
    transcendental dependency must be classified before it ships."""
    catalog = load_all()
    found = {
        name
        for name, spec in catalog.items()
        if spec.oracle is not None
        and _depends_on_transcendental(spec.fn, spec.oracle)
    }
    unclassified = found - DOCUMENTED_TRANSCENDENTAL
    stale = DOCUMENTED_TRANSCENDENTAL - found
    assert not unclassified, (
        f"entries gained a transcendental dependency without a FLOATS.md "
        f"classification + boundary quantization: {sorted(unclassified)}"
    )
    assert not stale, (
        f"FLOATS.md lists entries that no longer touch a transcendental — "
        f"update the doc: {sorted(stale)}"
    )


@pytest.mark.parametrize("name", sorted(DOCUMENTED_TRANSCENDENTAL))
def test_transcendental_entry_rounds_at_the_boundary(name):
    """Every documented transcendental entry must show an explicit
    rounding call in BOTH the Spark source and the oracle SQL (the
    quantization contract). Coarse but effective: the detailed per-
    column mechanism is reviewed in FLOATS.md; this pins that neither
    side silently drops its rounding."""
    spec = load_all()[name]
    src = inspect.getsource(spec.fn)
    # rounding may live in a shared helper the entry delegates to —
    # follow one level of the known kernel helpers
    from data_engineering_capstone_spark import queries_etl, queries_llm

    for mod, helper in (
        (queries_etl, "_psi_report"),
        (queries_llm, "_bm25_scored"),
    ):
        if helper in src:
            src += inspect.getsource(getattr(mod, helper))
    assert re.search(r"F\.round\(|\.cast\(\s*[\"']decimal", src), (
        f"{name}: Spark side has no F.round()/decimal quantization"
    )
    assert re.search(r"ROUND\s*\(|::DECIMAL|AS\s+DECIMAL", spec.oracle or "",
                     re.IGNORECASE), (
        f"{name}: oracle SQL has no ROUND()/DECIMAL quantization"
    )
