"""Round-over-round bench honesty check: compare two bench outputs on
their common query set and flag any query whose min-of-iters wall moved
by more than 1.5x in either direction (the documented noise band on
this box is wide — see BENCH.md — so a flag is a re-measure trigger,
not automatically a regression).

Accepts either a driver BENCH_r{N}.json capture (the JSON line lives in
its "tail" field) or a raw `python bench.py` log/stdout file.

Usage: python tools/bench_delta.py OLD NEW [threshold]
Exit code 0 always (informational); prints a markdown delta table.
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    # driver capture: {"tail": "...{json line}..."}
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "queries" in obj:
            return obj["queries"]
        if isinstance(obj, dict) and "tail" in obj:
            text = obj["tail"]
    except json.JSONDecodeError:
        pass
    # raw log: last line containing a "queries" JSON object
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    # BENCH.md-style markdown table: | query | sec | iteration walls |
    # (driver BENCH_r{N}.json captures truncate the JSON line, so the
    # committed BENCH.md — `git show <rev>:BENCH.md` — is the durable
    # per-query record)
    out: dict[str, float] = {}
    for line in text.splitlines():
        cells = [c.strip() for c in line.split("|")]
        if len(cells) >= 4 and cells[1] and cells[1] not in ("query", "---"):
            try:
                out[cells[1]] = float(cells[2])
            except ValueError:
                continue
    if out:
        return out
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    print(f"| query | old s | new s | ratio | flag (> {thr}x) |")
    print("| --- | --- | --- | --- | --- |")
    flagged = []
    for q in common:
        o, n = old[q], new[q]
        ratio = n / o if o else float("inf")
        flag = "FLAG" if ratio > thr or ratio < 1 / thr else ""
        if flag:
            flagged.append(q)
        print(f"| {q} | {o} | {n} | {ratio:.2f} | {flag} |")
    print()
    print(f"{len(common)} common queries; {len(flagged)} flagged: {flagged}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new this round (no prior number): {only_new}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
