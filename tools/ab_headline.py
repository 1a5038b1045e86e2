"""Interleaved A/B of the headline ER benchmark between two git revs.

This box's throughput drifts ±40% over tens of minutes, so back-to-back
whole runs of two revisions compare different machine states. Protocol
(same as bench.py --scaling): materialize rev A in a worktree, then run
single-trial ER-only legs strictly interleaved (A, B, A, B, ...) with a
pure-CPU burn control sampled between rounds, and report min-per-side
plus the burn range as the drift bound.

Usage: python tools/ab_headline.py <rev_a> [rev_b=HEAD] [rounds=3]
Prints one JSON line: {"a": ..., "b": ..., "a_sec": ..., "b_sec": ...,
"speedup_b_over_a": ..., "burn_sides": [...], "trials": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


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


def _run_leg(repo_dir: str, ncpu: int) -> float:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_ER_ONLY="1",
        GRAFT_ER_TRIALS="1",
        GRAFT_ER_REPEAT=os.environ.get("GRAFT_AB_REPEAT", "16"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench.py")],
        env=env, cwd=repo_dir, capture_output=True, text=True, check=True,
    ).stdout
    return float(json.loads(out.strip().splitlines()[-1])["value"])


def main() -> None:
    rev_a = sys.argv[1]
    rev_b = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
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
    burns: list[float] = []
    for _ in range(rounds):
        trials["a"].append(_run_leg(dir_a, ncpu))
        trials["b"].append(_run_leg(dir_b, ncpu))
        burns.append(burn.run_side(ncpu))
    a_sec, b_sec = min(trials["a"]), min(trials["b"])
    print(json.dumps({
        "a": rev_a, "b": rev_b, "num_cpus": ncpu,
        "a_sec": round(a_sec, 3), "b_sec": round(b_sec, 3),
        "speedup_b_over_a": round(a_sec / b_sec, 3),
        "burn_sides": [round(x, 3) for x in burns],
        "trials": {k: [round(x, 3) for x in v] for k, v in trials.items()},
    }))


if __name__ == "__main__":
    main()
