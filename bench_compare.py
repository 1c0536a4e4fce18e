#!/usr/bin/env python
"""Per-query round-over-round bench regression report.

Usage: python bench_compare.py BENCH_r01.json [BENCH_r02.json]

With one argument, runs bench.py fresh and compares against the given
baseline; with two, compares the two recorded files. Prints one line per
query with the time ratio (current / baseline) and flags anything above
the 1.5× regression bar from the round-1 verdict.

Contention awareness (VERDICT r11 ask #7): each side's ``contended``
flag is printed in the header, and a cross-state comparison (settled vs
contended) is ANNOTATED as not like-for-like — per-query ratios against
a hot side mostly measure ambient load, not plan changes. Pass
``--allow-contended`` to compare anyway without the nonzero exit that a
cross-state mismatch otherwise adds.
"""

from __future__ import annotations

import json
import subprocess
import sys


def _load(path: str) -> dict:
    """Accept either bench.py's bare JSON line or the driver's BENCH_r{N}.json
    wrapper (bench stdout embedded in its "tail" field)."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    for line in doc.get("tail", "").splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(
        f"no bench JSON found in {path} (the driver keeps only the last "
        "2000 stdout chars — bench.py emits a compact line since round 12 "
        "so this should not recur; older artifacts may be unreadable)"
    )


def _contention_state(doc: dict) -> str:
    """settled / contended / unknown (pre-round-10 artifacts lack the flag)."""
    c = doc.get("contended")
    if c is None:
        return "unknown"
    return "contended" if c else "settled"


def main() -> None:
    allow_contended = "--allow-contended" in sys.argv
    argv = [a for a in sys.argv if a != "--allow-contended"]
    if len(argv) not in (2, 3):
        raise SystemExit(__doc__)
    base = _load(argv[1])
    if len(argv) == 3:
        cur = _load(argv[2])
    else:
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, check=True
        )
        cur = json.loads(out.stdout.strip().splitlines()[-1])

    bs, cs = _contention_state(base), _contention_state(cur)
    print(f"STATE    baseline={bs}  current={cs}")
    cross_state = bs != cs or "contended" in (bs, cs) or "unknown" in (bs, cs)
    if cross_state:
        print(
            "WARNING  not like-for-like: at least one side is contended or "
            "unlabeled — per-query ratios reflect ambient load as much as "
            "plan changes; prefer comparing two settled artifacts"
            + (" (continuing: --allow-contended)" if allow_contended else "")
        )

    regressions = 0
    for name, b in base["queries"].items():
        c = cur["queries"].get(name)
        if c is None:
            print(f"MISSING  {name}: not in current run")
            regressions += 1
            continue
        ratio = c / b if b else float("inf")
        flag = "REGRESS " if ratio > 1.5 else "ok      "
        if ratio > 1.5:
            regressions += 1
        print(f"{flag} {name}: {b*1000:.1f}ms -> {c*1000:.1f}ms  ({ratio:.2f}x)")
    for name in cur["queries"]:
        if name not in base["queries"]:
            print(f"NEW      {name}: {cur['queries'][name]*1000:.1f}ms")
    t = cur["value"] / base["value"] if base.get("value") else float("nan")
    print(f"TOTAL    {base['value']:.3f}s -> {cur['value']:.3f}s  ({t:.2f}x)")
    sys.exit(1 if regressions or (cross_state and not allow_contended) else 0)


if __name__ == "__main__":
    main()
