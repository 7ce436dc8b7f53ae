#!/usr/bin/env python3
"""Merge a correctness_sf10 block into SCALE_sf10.json.

Usage: python3 tools/merge_correctness_sf10.py <block.json> [scale.json]

The block is produced by hand from the sf10 Verify + selfcheck runs
(full rows+schema+hash for the bounded-result queries; the deterministic
md5 sampling modes for the hash-kernel families whose full twin
re-derivation is quadratic or training-heavy at x100). Keeping the merge
in a script keeps SCALE_sf10.json regenerable: scale_decade.py writes the
timing half, this writes the adjudication half.
"""
import json
import sys


def main():
    block = json.load(open(sys.argv[1]))
    path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_sf10.json"
    rec = json.load(open(path))
    rec["correctness_sf10"] = block
    json.dump(rec, open(path, "w"), indent=1)
    print(json.dumps({"out": path, "result": block.get("result")}))


if __name__ == "__main__":
    main()
