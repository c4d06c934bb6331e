"""README claims about test/query counts must track reality (VERDICT r8
order #3 — the counts drifted three rounds running; now a drift fails
the suite instead of waiting for the judge to notice)."""

import re
import subprocess
import sys
from pathlib import Path

import __spark_entry__ as entry_mod

REPO = Path(__file__).resolve().parent.parent


def _readme() -> str:
    return (REPO / "README.md").read_text()


def test_readme_oracle_counts_match_entry():
    m = re.search(
        r"all (\d+) oracled queries in\s+`__spark_entry__\.py` "
        r"\(of (\d+) total\)",
        _readme(),
    )
    assert m, "README lost its oracled-query count sentence"
    assert int(m.group(1)) == len(entry_mod.oracle_sql())
    assert int(m.group(2)) == len(entry_mod.queries())


def test_readme_test_count_matches_collection():
    m = re.search(r"`python -m pytest tests/ -q` — (\d+) tests", _readme())
    assert m, "README lost its test-count sentence"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    c = re.search(r"(\d+) tests? collected", out.stdout)
    assert c, out.stdout[-2000:]
    assert int(m.group(1)) == int(c.group(1)), (
        f"README says {m.group(1)} tests; collection finds {c.group(1)} — "
        "sync README.md's Testing section"
    )
