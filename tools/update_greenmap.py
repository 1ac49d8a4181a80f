#!/usr/bin/env python
"""Maintain greenmap.json — the per-query record of the last DRIVER-green
round and the sha256 of the implementing module AT that round.

Closes the round-4 rotation hole (VERDICT r4, "What's wrong" #1): a
query whose module changed after its last driver-green must re-enter
the 50-query correctness window; tests/test_rotation_guard.py enforces
that by comparing each module's current sha against this map.

Usage:
  python tools/update_greenmap.py                # rebuild from all CORRECTNESS_r*.json
  python tools/update_greenmap.py --round 5      # fold in round 5 results with
                                                 # CURRENT module contents (run right
                                                 # after a round's CORRECTNESS lands)

Bootstrap mode resolves each module's content at the round's driver
commit (the `round N: verdict/...` commit) via git, so greens recorded
in past rounds carry the module sha the driver actually verified.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "greenmap.json")


def query_modules(closure: bool = False) -> dict[str, list[str]]:
    """query name -> repo-relative paths of the query's dep set.

    closure=False (the recording default through round 6): the
    implementing module only — editing a query module re-windows every
    query it defines. Edits to operator modules a query merely imports
    are NOT auto-detected at this granularity; round-5 practice
    re-windowed them manually (seen_filter -> bloom_prefilter_dedup/
    seen_antijoin/crawl_e2e*, components -> dedup_components/
    corpus_clean_fuzzy).

    closure=True (VERDICT r5 task 3): the module PLUS every
    `operators/`/`functions/`/`plans/` module it statically imports,
    transitively WITHIN those three dirs — the targeted closure that
    catches operator edits without the measured too-broad full-closure
    blowup (shared textdedup helpers flagged 54/85 queries). Round-6
    note: the optimization-round contract FREEZES the 50-query window,
    and flipping the recording default to the closure mid-round would
    flag closure-stale queries that cannot be re-admitted; the next
    build round should record greens with `--round N --closure` and
    re-window from `--stale --closure`."""
    import __spark_entry__ as entry

    out = {}
    for name, fn in entry.queries().items():
        mod = sys.modules[fn.__module__]
        path = os.path.relpath(mod.__file__, REPO)
        out[name] = sorted(_dep_closure(path)) if closure else [path]
    return out


def _static_imports(path: str) -> set[str]:
    """Repo-relative paths of `operators/`/`functions/`/`plans/` modules
    the file statically imports (any nesting depth — function-level
    imports included, via a full AST walk)."""
    import ast

    pkg = "openslack_crawler_spark"
    full = os.path.join(REPO, path)
    try:
        tree = ast.parse(open(full, "rb").read())
    except (OSError, SyntaxError):
        return set()
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against the package
                base = node.module or ""
            elif (node.module or "").startswith(pkg + "."):
                base = node.module[len(pkg) + 1:]
            else:
                continue
            # `from .operators import frontier` puts the module in names
            cands = [base] + [
                f"{base}.{a.name}" if base else a.name for a in node.names
            ]
            for c in cands:
                rel = os.path.join(pkg, *c.split("."))
                if os.path.isfile(os.path.join(REPO, rel + ".py")):
                    mods.add(rel + ".py")
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(pkg + "."):
                    rel = os.path.join(pkg, *a.name[len(pkg) + 1:].split("."))
                    if os.path.isfile(os.path.join(REPO, rel + ".py")):
                        mods.add(rel + ".py")
    keep_dirs = tuple(
        os.path.join("openslack_crawler_spark", d) + os.sep
        for d in ("operators", "functions", "plans")
    )
    return {m for m in mods if m.startswith(keep_dirs)}


def _dep_closure(path: str) -> set[str]:
    """path + transitive operators/functions/plans imports."""
    seen = {path}
    frontier = [path]
    while frontier:
        nxt = []
        for p in frontier:
            for dep in _static_imports(p):
                if dep not in seen:
                    seen.add(dep)
                    nxt.append(dep)
        frontier = nxt
    return seen


def is_green(rec: dict) -> bool:
    if rec.get("err") == "no_oracle":  # rows-only contract (crawl_e2e)
        # require a POSITIVE signal that the Spark run produced output:
        # spark_rows is absent on failure, so default to -1 (advisor r5:
        # `rec.get("spark_rows", 0) >= 0` was a tautology that recorded
        # any no_oracle record as green)
        return bool(rec.get("rows_match")) or rec.get("spark_rows", -1) >= 0
    return bool(
        rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
    )


def round_commit(n: int) -> str | None:
    out = subprocess.run(
        ["git", "log", "--all", "--format=%H %s"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(rf"^round {n}: ", subj):
            return sha
    return None


def sha_at(paths: list[str], commit: str | None) -> str | None:
    """Combined sha256 over the dep closure's file contents (sorted
    path order). None if any file is unreadable at that commit."""
    acc = hashlib.sha256()
    for path in sorted(paths):
        if commit is None:  # current working tree
            full = os.path.join(REPO, path)
            if not os.path.exists(full):
                return None
            data = open(full, "rb").read()
        else:
            p = subprocess.run(
                ["git", "show", f"{commit}:{path}"],
                capture_output=True, cwd=REPO,
            )
            if p.returncode != 0:
                return None
            data = p.stdout
        acc.update(path.encode() + b"\x00" + data + b"\x00")
    return acc.hexdigest()


def stale_queries(closure: bool = False) -> list[str]:
    """Queries whose dep content changed since their recorded
    driver-green (the set the rotation rule forces into the window).
    closure=True compares against the targeted operator-import closure
    instead of the recorded deps — the next build round's windowing
    input (see query_modules)."""
    greenmap = json.load(open(OUT)) if os.path.exists(OUT) else {}
    mods = query_modules(closure=closure)
    out = []
    for name, deps in mods.items():
        rec = greenmap.get(name)
        if rec is None:
            out.append(name)
        elif closure:
            # compare the CURRENT closure's content now vs at the green
            # round's commit — self-contained even though past greens
            # recorded only the module sha
            commit = round_commit(rec["green_round"])
            if commit is None or sha_at(deps, commit) != sha_at(deps, None):
                out.append(name)
        elif sha_at(rec["deps"], None) != rec["deps_sha"]:
            out.append(name)
    return sorted(out)


def main() -> None:
    if "--stale" in sys.argv:
        for name in stale_queries(closure="--closure" in sys.argv):
            print(name)
        return
    mods = query_modules(closure="--closure" in sys.argv)
    greenmap: dict[str, dict] = {}
    if "--round" in sys.argv:
        n = int(sys.argv[sys.argv.index("--round") + 1])
        greenmap = json.load(open(OUT)) if os.path.exists(OUT) else {}
        rounds = [(n, None)]  # current tree contents
    else:
        rounds = [
            (int(re.search(r"r(\d+)", f).group(1)), None)
            for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        ]
        rounds = [(n, round_commit(n)) for n, _ in rounds]
    for n, commit in rounds:
        path = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if not os.path.exists(path):
            continue
        recs = json.load(open(path))
        for name, rec in recs.items():
            if name not in mods or not is_green(rec):
                continue
            sha = sha_at(mods[name], commit)
            if sha is None:
                continue
            greenmap[name] = {
                "green_round": n,
                "deps": mods[name],
                "deps_sha": sha,
            }
    json.dump(greenmap, open(OUT, "w"), indent=1, sort_keys=True)
    print(f"greenmap.json: {len(greenmap)} queries recorded")


if __name__ == "__main__":
    main()
