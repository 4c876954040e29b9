"""Emit the registry coverage counts SURVEY.md quotes, from the source
of truth (`all_queries()` / `oracle_sql()`), so the documented numbers
can never drift from the code: `tests/test_survey_counts.py` asserts
the LATEST "registry: **N queries, M oracle-exact, K rows-only**" claim
in SURVEY.md equals this script's output.

Usage: python tools/survey_counts.py
Prints one line, e.g.:  208 queries, 198 oracle-exact, 10 rows-only
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def counts() -> tuple[int, int, int]:
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    return len(q), len(set(q) & set(o)), len(set(q) - set(o))


if __name__ == "__main__":
    n, oracle_exact, rows_only = counts()
    print(f"{n} queries, {oracle_exact} oracle-exact, {rows_only} rows-only")
