"""Registry/docs drift guard (VERDICT r5 task 5): the generated
QUERIES.md header and table must agree with the live registry, so the
hand-edited "sync counts" commits of earlier rounds can never recur —
any drift fails the suite and the fix is one regen command.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY


def _queries_md():
    with open(os.path.join(REPO, "QUERIES.md")) as fh:
        return fh.read()


def test_queries_md_header_matches_registry():
    md = _queries_md()
    m = re.search(r"^(\d+) queries; (\d+) with exact DuckDB oracles", md, re.M)
    assert m, "QUERIES.md header missing/reformatted — regen it"
    n, n_oracle = int(m.group(1)), int(m.group(2))
    assert n == len(REGISTRY), (
        f"QUERIES.md says {n} queries, registry has {len(REGISTRY)} — "
        "run: python tools/gen_queries_md.py"
    )
    live_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    assert n_oracle == live_oracle, (
        f"QUERIES.md says {n_oracle} exact oracles, registry has "
        f"{live_oracle} — run: python tools/gen_queries_md.py"
    )


def test_queries_md_rows_match_registry_names():
    md = _queries_md()
    rows = set(re.findall(r"^\| `([^`]+)` \|", md, re.M))
    assert rows == set(REGISTRY), (
        f"QUERIES.md rows drifted: missing={sorted(set(REGISTRY) - rows)} "
        f"stale={sorted(rows - set(REGISTRY))} — run: python "
        "tools/gen_queries_md.py"
    )


def test_queries_md_regen_is_idempotent():
    """The committed QUERIES.md is byte-identical to a fresh regen —
    i.e. nobody hand-edited the generated file."""
    before = _queries_md()
    out = subprocess.run(
        [sys.executable, os.path.join("tools", "gen_queries_md.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    assert _queries_md() == before, (
        "committed QUERIES.md differs from a fresh regen"
    )


def test_readme_carries_no_hardcoded_registry_counts():
    """README defers counts to the generated catalog; a literal
    'N queries' claim there is exactly the drift the guard exists to
    prevent."""
    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    assert not re.search(r"\b\d+ (named )?quer", readme), (
        "README hardcodes a query count — defer to QUERIES.md"
    )
