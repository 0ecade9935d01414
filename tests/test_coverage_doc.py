"""Doc-lint: every pointer in COVERAGE.md must resolve.

Round-3 verdict found stale filenames (a renamed test module kept being
cited); this test pins the document to reality:

- every ``tests/<file>.py`` mention exists;
- every ``tests/<file>.py::test_name`` mention names a real test;
- every ``<module>.py::name`` mention of an ic_spark module resolves to
  a real attribute/function in that module's source;
- every backticked query name that looks like a registry entry exists.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "COVERAGE.md")


def _doc() -> str:
    with open(DOC) as f:
        return f.read()


def test_cited_test_files_exist():
    text = _doc()
    missing = []
    for m in set(re.findall(r"tests/(test_[a-z0-9_]+\.py)", text)):
        if not os.path.exists(os.path.join(REPO, "tests", m)):
            missing.append(m)
    assert not missing, f"COVERAGE.md cites absent test files: {missing}"


def test_cited_test_functions_exist():
    text = _doc()
    missing = []
    # Both "tests/test_x.py::test_y" and "test_x::test_y" forms appear.
    for mod, fn in set(
        re.findall(r"(test_[a-z0-9_]+)(?:\.py)?::(test_[a-z0-9_]+)", text)
    ):
        path = os.path.join(REPO, "tests", f"{mod}.py")
        if not os.path.exists(path):
            missing.append(f"{mod}.py")
            continue
        with open(path) as f:
            if f"def {fn}(" not in f.read():
                missing.append(f"{mod}.py::{fn}")
    assert not missing, f"COVERAGE.md cites absent tests: {missing}"


def test_cited_module_symbols_exist():
    text = _doc()
    missing = []
    for mod, sym in set(
        re.findall(r"([a-z0-9_/]+\.py)::([A-Za-z_][A-Za-z0-9_.]*)", text)
    ):
        if mod.startswith("test_") or "/test_" in mod:
            continue  # covered above
        # Resolve the module path inside ic_spark (doc may cite either
        # "planner.py" or "compaction/planner.py" or a full path).
        cands = []
        top = os.path.join(REPO, os.path.basename(mod))
        if os.path.exists(top):
            cands.append(top)  # repo-root modules (bench.py, entry)
        for root, _, files in os.walk(os.path.join(REPO, "ic_spark")):
            for f in files:
                p = os.path.join(root, f)
                if p.endswith(mod) or f == os.path.basename(mod):
                    cands.append(p)
        if not cands:
            missing.append(mod)
            continue
        head = sym.split(".")[0]
        found = False
        for p in cands:
            src = open(p).read()
            if re.search(
                rf"^(def {head}\b|class {head}\b|{head}\s*=|\s+def {head}\b)",
                src,
                re.M,
            ):
                found = True
                break
        if not found:
            missing.append(f"{mod}::{sym}")
    assert not missing, f"COVERAGE.md cites absent symbols: {missing}"


def test_cited_query_names_exist():
    from ic_spark.queries import REGISTRY

    text = _doc()
    known_prefixes = (
        "mor_", "dedup_", "sim_", "text_", "agg_", "window_", "scalar_",
        "setop_", "events_", "asof_", "range_", "overlap_", "pivot_",
        "unpivot_", "join_", "pack_", "embedding_", "sample_", "prep_",
        "pipeline_", "json_",
    )
    missing = []
    # bench.py is part of the search scope: bench-only timing rows
    # (sim_ivfpq_index_serve, dedup_minhash_lsh_skew) are legitimate
    # citable names that never enter the registry.  Read once, with a
    # context manager (r12 ADVICE: the per-name re-open leaked handles).
    with open(os.path.join(REPO, "bench.py")) as fh:
        bench_text = fh.read()
    for name in set(re.findall(r"\b([a-z][a-z0-9_]{3,})\b", text)):
        if not name.startswith(known_prefixes):
            continue
        # Only flag names that LOOK like registry entries (contain two
        # underscores-worth of structure) and are absent.
        if name in REGISTRY:
            continue
        # tolerate operator/function names sharing prefixes
        if any(name in q for q in REGISTRY):
            continue
        if re.search(rf"`{name}`|\b{name}\b \(", text) and "_" in name:
            # cited emphatically -> must exist somewhere in the repo.
            hit = name in bench_text
            for root, _, files in os.walk(os.path.join(REPO, "ic_spark")):
                if hit:
                    break
                for f in files:
                    if f.endswith(".py"):
                        with open(os.path.join(root, f)) as fh:
                            if name in fh.read():
                                hit = True
                                break
                if hit:
                    break
            if not hit:
                missing.append(name)
    assert not missing, f"COVERAGE.md cites unknown query names: {missing}"
