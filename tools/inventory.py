"""Generate OPERATORS.md and patch README.md's spec counts.

One OPERATORS.md row per registered spec: name, driver-window position,
tags, oracle presence, and the first sentence of its doc. README.md's
inline counts (spec total, spec-number range, fuzz query total) are
rewritten from the same source of truth — the registry and the fuzzer's
parametrize lists — so they can no longer drift by hand (the stale-count
advice item recurred three rounds running). Regenerate after adding
specs: python tools/inventory.py; tests/test_plans.py asserts the
written counts match len(REGISTRY.specs).
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def fuzz_query_count() -> int:
    """Total generated-query count: the sum of every test_fuzzed_*
    parametrize list in tests/test_fuzz_differential.py (SEEDS resolves
    to its literal), matching `pytest --collect-only | grep -c
    test_fuzzed`."""
    src = open(os.path.join(ROOT, "tests", "test_fuzz_differential.py")).read()
    seeds = int(re.search(r"^SEEDS = list\(range\((\d+)\)\)", src, re.M).group(1))
    total, matched = 0, 0
    for m in re.finditer(
        r'@pytest\.mark\.parametrize\("seed", (SEEDS|list\(range\((\d+)\)\))\)'
        r"\s*\ndef test_fuzzed_",
        src,
    ):
        total += seeds if m.group(1) == "SEEDS" else int(m.group(2))
        matched += 1
    # every test_fuzzed_* def must have been counted — a parametrize
    # spelled any other way (range(20) without list(), a tuple, a named
    # constant) would otherwise silently undercount, and the README pin
    # test compares against this same function so the drift would pass CI
    n_defs = len(re.findall(r"^def test_fuzzed_", src, re.M))
    if matched != n_defs:
        raise AssertionError(
            f"fuzz_query_count matched {matched} parametrize blocks but "
            f"found {n_defs} test_fuzzed_* defs — a grammar's parametrize "
            "uses an unrecognized spelling; extend the regex (or use "
            "SEEDS / list(range(N)))"
        )
    return total


def patch_readme(n_specs: int, max_q: int) -> None:
    path = os.path.join(ROOT, "README.md")
    src = open(path).read()
    nfuzz = fuzz_query_count()
    src = re.sub(
        r"\d+ specs, q01–q\d+", f"{n_specs} specs, q01–q{max_q}", src
    )
    src = re.sub(
        r"\d+ generated SQL queries", f"{nfuzz} generated SQL queries", src
    )
    src = re.sub(
        r"the \d+ hand-written specs", f"the {n_specs} hand-written specs", src
    )
    open(path, "w").write(src)
    print(f"patched README.md ({n_specs} specs, {nfuzz} fuzz queries)")


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
    max_q = max(
        int(m.group(1)) for m in (re.match(r"q(\d+)", n) for n in names) if m
    )
    patch_readme(len(names), max_q)


if __name__ == "__main__":
    main()
