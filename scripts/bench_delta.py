"""Self-reported bench regression table: compare a fresh bench run
against the previous round's driver-recorded numbers and write
BENCH_DELTA.md naming any query >20% slower.

Usage: python scripts/bench_delta.py <old_bench.json> <new_bench.json>

Accepts either the raw one-line bench.py output or the driver's
wrapper JSON (with a "parsed" key).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:
        data = data["parsed"]
    return data


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    rows, regressions = [], []
    for name in nq:
        n = nq[name]
        o = oq.get(name)
        if o is None:
            rows.append((name, None, n, None))
            continue
        delta = (n - o) / o * 100 if o else 0.0
        rows.append((name, o, n, delta))
        if delta > 20:
            regressions.append((name, o, n, delta))

    lines = [
        "# BENCH_DELTA — per-query change vs previous round",
        "",
        f"Old: `{old_path}` (total {old['value']}s) -> "
        f"New: `{new_path}` (total {new['value']}s)",
        "",
        "| query | old s | new s | delta |",
        "|---|---|---|---|",
    ]
    for name, o, n, d in sorted(rows, key=lambda r: -(r[3] or 0)):
        od = f"{o:.3f}" if o is not None else "—"
        dd = f"{d:+.1f}%" if d is not None else "new"
        lines.append(f"| {name} | {od} | {n:.3f} | {dd} |")
    lines.append("")
    if regressions:
        lines.append("## Regressions >20%")
        lines.append("")
        for name, o, n, d in regressions:
            lines.append(f"- **{name}**: {o:.3f}s -> {n:.3f}s ({d:+.1f}%)")
    else:
        lines.append("No query regressed by more than 20%.")
    lines.append("")
    with open("BENCH_DELTA.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
