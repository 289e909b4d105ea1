#!/usr/bin/env python3
"""Regenerate COVERAGE.md's per-query ✓/✗ marks from a correctness JSON.

Usage: python3 tools/regen_coverage.py [correctness.json]

Defaults to the highest-numbered CORRECTNESS_r*.json in the repo root;
pass a fresh local file (tools/check_oracle.py's third argument) to mark
against HEAD instead of the last driver round.

A marked token `qNN ✓`/`qNN ✗` flips to ✓ only when the JSON has the
query with rows/schema/hash all matching and no error; a marked query
ABSENT from the JSON renders ✗ (round 8's failure mode: dead queries
simply had no correctness row, and hand-maintained ✓s went stale).
Bare `qNN` mentions in prose are left untouched.
"""
import datetime
import glob
import json
import os
import re
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_correctness():
    files = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not files:
        sys.exit("no CORRECTNESS_r*.json in repo root and no argument given")
    return max(files, key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else latest_correctness()
    data = json.load(open(src))
    status = {}
    for full, r in data.items():
        short = re.match(r"(q\d+[a-z]*)", full).group(1)
        status[short] = (bool(r.get("rows_match")) and bool(r.get("schema_match"))
                         and bool(r.get("hash_match")) and not r.get("err"))

    path = os.path.join(root, "COVERAGE.md")
    text = open(path, encoding="utf-8").read()

    flips = []

    def sub(m):
        q, old = m.group(1), m.group(2)
        new = "✓" if status.get(q, False) else "✗"
        if new != old:
            flips.append(f"{q} {old}->{new}")
        return f"{q} {new}"

    new_text = re.sub(r"\b(q\d+[a-z]*) ([✓✗])", sub, text)
    marked = set(re.findall(r"\b(q\d+[a-z]*) [✓✗]", new_text))
    # stamp the regen note with the run it ACTUALLY used — the r9 verdict
    # caught the prose saying "126/126" under a 137-query table because
    # only the marks regenerated, not the note
    green = sum(1 for q in marked if status.get(q, False))
    stamp = (f"Last regenerated: {datetime.date.today().isoformat()} from "
             f"{os.path.basename(src)} ({green}/{len(marked)} marked queries "
             f"green; source file has {len(status)} query rows).")
    new_text, n_stamped = re.subn(
        r"Last regenerated:.*?(?=\n\n)", stamp, new_text, count=1,
        flags=re.DOTALL)
    if n_stamped != 1:
        sys.exit("COVERAGE.md regen note ('Last regenerated:') not found — "
                 "refusing to write marks without an accurate stamp")
    open(path, "w", encoding="utf-8").write(new_text)
    print(f"source: {os.path.basename(src)}; marked queries: {len(marked)}; "
          f"green: {green}; flips: {flips if flips else 'none'}")


if __name__ == "__main__":
    main()
