"""Interleaved A/B of a single `queries()` entry between two git revs.

Same drift protocol as ab_headline.py (this box's throughput swings
±40% inside minutes): materialize each rev in a worktree, run the query
in fresh subprocesses strictly interleaved (A, B, A, B, ...) with a
pure-CPU burn sample per round, and report min-per-side plus per-round
paired ratios. Each side runs ITS OWN __ray_entry__.queries()[name]
under its own package tree, so the comparison is rev-faithful.

Usage: python tools/ab_query.py <rev_a> <rev_b|HEAD> <query> [rounds=3]
Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (32).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import os, sys, time
sys.path.insert(0, os.environ["AB_REPO"])
import ray
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as entry
q = entry.queries()[os.environ["AB_QUERY"]]
sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
t0 = time.perf_counter()
out = q(sf)
import ray.data as rd
n = out.count() if isinstance(out, rd.Dataset) else len(out)
dt = time.perf_counter() - t0
print("AB_RESULT", dt, n)
ray.shutdown()
"""


def _ensure_worktree(rev: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if rev == "HEAD":
        return repo
    sha = subprocess.run(
        ["git", "rev-parse", rev], cwd=repo, capture_output=True, text=True,
        check=True,
    ).stdout.strip()
    wt = f"/tmp/ab_worktree_{sha[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=repo, check=True, capture_output=True,
        )
    return wt


def _run_leg(repo_dir: str, query: str) -> tuple[float, int]:
    env = dict(os.environ, AB_REPO=repo_dir, AB_QUERY=query)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, cwd=repo_dir,
        capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        if line.startswith("AB_RESULT"):
            _, dt, n = line.split()
            return float(dt), int(n)
    raise RuntimeError(f"no AB_RESULT in output:\n{out[-2000:]}")


def main() -> None:
    rev_a, rev_b, query = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "cpu_burn_control",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "cpu_burn_control.py"),
    )
    burn = ilu.module_from_spec(spec)
    spec.loader.exec_module(burn)

    dir_a, dir_b = _ensure_worktree(rev_a), _ensure_worktree(rev_b)
    trials: dict[str, list[float]] = {"a": [], "b": []}
    rows: dict[str, int] = {}
    burns: list[float] = []
    for _ in range(rounds):
        dt, n = _run_leg(dir_a, query); trials["a"].append(dt); rows["a"] = n
        dt, n = _run_leg(dir_b, query); trials["b"].append(dt); rows["b"] = n
        burns.append(burn.run_side(ncpu))
    a_sec, b_sec = min(trials["a"]), min(trials["b"])
    paired = [round(trials["a"][i] / trials["b"][i], 3) for i in range(rounds)]
    print(json.dumps({
        "a": rev_a, "b": rev_b, "query": query, "num_cpus": ncpu,
        "rows": rows,
        "a_sec": round(a_sec, 3), "b_sec": round(b_sec, 3),
        "speedup_b_over_a": round(a_sec / b_sec, 3),
        "paired_speedups": paired,
        "burn_sides": [round(x, 3) for x in burns],
        "trials": {k: [round(x, 3) for x in v] for k, v in trials.items()},
    }))


if __name__ == "__main__":
    main()
