#!/usr/bin/env python3
"""Split `graft.Explain --explain` output into per-query plan files.

Usage: split_plans.py <explain_output> <outdir> <suffix>

Writes <outdir>/<query>_<suffix>.txt holding the formatted plan plus the
job/stage/task/shuffle counter line for each query in the capture (sbt's
`[info] ` decoration stripped).
"""
import os
import re
import sys


def main() -> None:
    src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(outdir, exist_ok=True)
    plans: dict[str, list[str]] = {}
    counters: dict[str, str] = {}
    cur = None
    for raw in open(src, errors="replace"):
        line = raw.rstrip("\n")
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        m = re.match(r"===== (\S+) plan =====", line)
        if m:
            cur = m.group(1)
            plans[cur] = []
            continue
        m = re.match(r"===== (\S+): (.*)", line)
        if m:
            counters[m.group(1)] = m.group(2)
            cur = None
            continue
        if cur is not None:
            plans[cur].append(line)
    for name, body in plans.items():
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            if name in counters:
                f.write(f"== measured: {counters[name]}\n")
            f.write("\n".join(body).rstrip() + "\n")
    print(f"wrote {len(plans)} plans to {outdir} (*_{suffix}.txt)")


if __name__ == "__main__":
    main()
