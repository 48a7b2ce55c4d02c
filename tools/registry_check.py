#!/usr/bin/env python3
"""Name-level registry assertion: the set of query names documented in
SURVEY.md must equal the live `SparkEntry.queries` key set.

The round-9 lesson was count drift (an op that exists but isn't
declared is invisible coverage); the count-only grep that fixed it
could still be fooled by a rename or swap that preserves cardinality.
This check is set-valued in both directions:

  1. every live query name must appear backticked in SURVEY.md —
     exactly, or (for the `qNN_suffix` relational family) via its
     `qNN` prefix, including prefixes expanded from range shorthand
     like `q01`–`q13`;
  2. every query-shaped backticked token in SURVEY.md (`qNN`,
     `qNN_*`, `bench_*`, `llm_*`, `st_*`) must correspond to a live
     query — exact name, or a `qNN` prefix some live name extends.

Usage: registry_check.py <survey.md> <live-names-file-or-dir>
  (a dir means one subdir per query — graft.Verify's output layout)

Exit 1 with the offending names on any mismatch.
"""
import os
import re
import sys


def live_names(path):
    if os.path.isdir(path):
        return {d for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d))}
    with open(path) as f:
        return {ln.strip() for ln in f if ln.strip()}


def main():
    survey, live_src = sys.argv[1], sys.argv[2]
    live = live_names(live_src)
    text = open(survey).read()
    toks = set(re.findall(r"`([A-Za-z0-9_]+)`", text))
    for a, b in re.findall(r"`q(\d+)`[–-]`q(\d+)`", text):
        toks.update("q%02d" % i for i in range(int(a), int(b) + 1))

    undocumented = sorted(
        n for n in live
        if n not in toks
        and not (re.match(r"^(q\d+)_", n)
                 and re.match(r"^(q\d+)_", n).group(1) in toks))

    queryish = [t for t in toks
                if re.match(r"^(q\d+$|q\d+_|bench_|llm_|st_)", t)]
    ghosts = sorted(
        t for t in queryish
        if t not in live
        and not (re.match(r"^q\d+$", t)
                 and any(n.startswith(t + "_") for n in live)))

    ok = True
    if undocumented:
        print("FAIL: live queries not documented in SURVEY.md: %s"
              % ", ".join(undocumented), file=sys.stderr)
        ok = False
    if ghosts:
        print("FAIL: SURVEY.md names queries that do not exist in "
              "SparkEntry.queries: %s" % ", ".join(ghosts),
              file=sys.stderr)
        ok = False
    if ok:
        print("registry names: %d live, all documented; no ghosts"
              % len(live))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
