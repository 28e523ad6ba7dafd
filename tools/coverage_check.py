"""Cross-check SURVEY.md §2 against the live catalog.

Fails if (a) SURVEY cites a catalog query name that doesn't exist, or
(b) a registered query is never mentioned in SURVEY.md — either way the
coverage map is lying. Run in CI next to parity.

Usage: python tools/coverage_check.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_capstone_spark.catalog import load_all


def main() -> int:
    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    cited = set(re.findall(r"`([a-z0-9_]+)`", survey))
    registered = set(load_all())

    phantom = sorted(
        n for n in cited if n not in registered
        # heuristic: only names that LOOK like catalog queries
        and re.match(
            r"^(q\d|agg_|window_|scan_|etl_|llm_|mm_|stream_|ts_|sql_|udf_|udtf_|"
            r"set_ops|null_|filter_|pivot_|unpivot_|rollup_|cube_|asof_|range_|"
            r"cross_|outer_|full_|anti_|skew_|bucketed_|interval_|join_|"
            r"json_|map_|array_|scalar_)",
            n,
        )
    )
    unmentioned = sorted(n for n in registered if n not in cited)

    ok = True
    if phantom:
        ok = False
        print(f"PHANTOM (cited in SURVEY, not registered): {phantom}")
    if unmentioned:
        ok = False
        print(f"UNDOCUMENTED (registered, absent from SURVEY): {unmentioned}")
    print(f"{len(registered)} registered, {len(registered) - len(unmentioned)} documented")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
