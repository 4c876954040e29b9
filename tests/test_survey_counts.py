"""SURVEY.md's registry-count claims are generated, not hand-maintained
(round-4 verdict #7): the latest "registry: **N queries, M oracle-exact,
K rows-only" statement must equal tools/survey_counts.py's output."""

from __future__ import annotations

import re

from tools.survey_counts import counts

SURVEY = "/root/repo/SURVEY.md"
CLAIM = re.compile(
    r"registry:\s*\*\*(\d+)\s+queries,\s*(\d+)\s+oracle-exact,\s*"
    r"(\d+)\s+rows-only"
)


def test_survey_counts_match_registry():
    claims = CLAIM.findall(open(SURVEY).read())
    assert claims, "SURVEY.md no longer states registry counts"
    n, oracle_exact, rows_only = counts()
    latest = tuple(int(x) for x in claims[-1])
    assert latest == (n, oracle_exact, rows_only), (
        f"SURVEY.md's latest registry claim {latest} != actual "
        f"({n}, {oracle_exact}, {rows_only}); run tools/survey_counts.py "
        "and update the newest round section"
    )
