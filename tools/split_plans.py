#!/usr/bin/env python3
"""Split a graft.Explain log into per-query plan files.

Usage: split_plans.py <explain_log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for every '===== name =====' section
(the '===== Subqueries =====' continuation lines stay inside the section
they belong to).
"""
import re
import sys
import pathlib

log, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
outdir.mkdir(parents=True, exist_ok=True)
cur, buf = None, []
known = re.compile(r"^\[info\] ===== ([a-z0-9_]+) =====$")


def flush():
    if cur:
        (outdir / f"{cur}_{suffix}.txt").write_text("".join(buf))


for line in open(log):
    m = known.match(line.rstrip())
    if m and m.group(1) != "subqueries":
        flush()
        cur, buf = m.group(1), []
    elif cur is not None:
        # strip the sbt [info]/[error] prefixes for readability
        buf.append(re.sub(r"^\[(info|error)\] ?", "", line))
flush()
print("wrote", len(list(outdir.glob(f"*_{suffix}.txt"))), "files")
