#!/usr/bin/env python3
"""Differential check of graft's robots verdicts against CPython itself.

Usage: python3 tools/robots_differential.py <verifyOutDir>

Rebuilds the robots_fetch fixture's robots.txt (the same bytes
SyncOps.qRobotsFetch synthesizes per host), feeds it to the STDLIB
urllib.robotparser — a fully independent implementation of the grouping
state machine, entry selection, and first-match-wins — and replays every
(url, user-agent) verdict from the graft dump's robots_fetch parquet.

Stdlib robotparser and the reference's wildcard-extended RuleLine agree on
every fixture rule EXCEPT "Disallow: /exact$": stdlib treats the "$" as a
literal character (so "/exact" is allowed), while the reference's patch
gives it exact-match semantics (denied) — and graft implements the
reference. The check therefore asserts two things at once:

  1. every verdict outside the "$"-rule cases agrees with CPython's own
     state machine / entry selection / first-match-wins;
  2. the disagreement set is EXACTLY the "$"-semantics cases (ua matching
     the named group, url path exactly "/exact", graft deny vs stdlib
     allow) — proving graft implements the reference's extension rather
     than vanilla stdlib.

Exit 0 = both hold; exit 1 = unexpected divergence printed.
"""
import io
import sys
import urllib.robotparser

import pyarrow.parquet as pq

FIXTURE = (
    "User-agent: graftbot\n"
    "Disallow: /docs/private/\n"
    "Allow: /docs/\n"
    "Disallow: /search?\n"
    "Disallow: /exact$\n"
    "Disallow: /team\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /"
)


def parser_for_host():
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(FIXTURE.splitlines())
    return rp


def main(out_dir: str) -> int:
    tbl = pq.read_table(f"{out_dir}/robots_fetch")
    rows = tbl.to_pylist()
    if not rows:
        print("robots_differential: no rows in dump")
        return 1
    rp = parser_for_host()
    bad = 0
    expected_dollar = 0
    for r in rows:
        # stdlib can_fetch expects the full url; agent matching is the same
        # substring rule graft implements
        expect = rp.can_fetch(r["ua"], r["url"])
        if bool(r["allowed"]) == bool(expect):
            continue
        is_dollar_case = (r["ua"].startswith("graftbot")
                          and r["url"].endswith(".example.eu/exact")
                          and not r["allowed"] and expect)
        if is_dollar_case:
            expected_dollar += 1
        else:
            bad += 1
            if bad <= 10:
                print(f"MISMATCH ua={r['ua']} url={r['url']} "
                      f"graft={r['allowed']} cpython={expect}")
    n = len(rows)
    if bad:
        print(f"robots_differential: {bad}/{n} verdicts disagree with CPython "
              f"outside the $-semantics cases")
        return 1
    if expected_dollar == 0:
        print("robots_differential: no $-rule case seen — fixture drifted?")
        return 1
    print(f"robots_differential: {n - expected_dollar}/{n} verdicts agree with "
          f"CPython robotparser; {expected_dollar} differ exactly where the "
          f"reference's $-exact extension applies (graft deny, stdlib allow)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
