"""Regenerate QUERIES.md from the query registry docstrings.

Run after any registry change: python tools/gen_queries_md.py
"""

import sys

sys.path.insert(0, ".")

from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY  # noqa: E402

n = len(REGISTRY)
n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
lines = [
    "# QUERIES — auto-generated registry catalog",
    "",
    f"{n} queries; {n_oracle} with exact DuckDB oracles",
    "(regen: python tools/gen_queries_md.py).",
    "",
    "| query | oracle | tags | what it does |",
    "|---|---|---|---|",
]
for name in sorted(REGISTRY):
    spec = REGISTRY[name]
    doc = (spec.fn.__doc__ or "").strip().splitlines()
    first = doc[0].strip() if doc else ""
    oracle = "exact" if spec.oracle else "rows-only"
    tags = ", ".join(spec.tags)
    lines.append(f"| `{name}` | {oracle} | {tags} | {first} |")
lines.append("")
with open("QUERIES.md", "w") as fh:
    fh.write("\n".join(lines))
print(f"QUERIES.md: {n} queries, {n_oracle} exact oracles")
