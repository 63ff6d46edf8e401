"""Generate OPERATORS.md — the registry cross-index.

One row per registered spec: name, driver-window position, tags, oracle
presence, and the first sentence of its doc. Regenerate after adding
specs: python tools/inventory.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from etl_dag_paris_velib_spark.plans import DEMOTED, REGISTRY

    names = list(REGISTRY.specs)
    window = set(names[: len(names) - len(DEMOTED)])
    out = [
        "# OPERATORS — registered query surface (auto-generated)",
        "",
        f"{len(names)} specs; the first {len(window)} (insertion order) sit in",
        "the external harness's checked window, the tail is verified every",
        "pytest run by tests/test_demoted_parity.py against the same DuckDB",
        "oracles. Regenerate with `python tools/inventory.py`.",
        "",
        "| spec | checked by | tags | summary |",
        "|---|---|---|---|",
    ]
    for name, spec in REGISTRY.specs.items():
        where = "driver window" if name in window else "parity test (tail)"
        first = (spec.doc or "").split(". ")[0].replace("\n", " ").strip()
        if len(first) > 140:
            first = first[:137] + "..."
        tags = ", ".join(spec.tags)
        out.append(f"| {name} | {where} | {tags} | {first} |")
    with open(os.path.join(ROOT, "OPERATORS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote OPERATORS.md ({len(names)} specs)")


if __name__ == "__main__":
    main()
