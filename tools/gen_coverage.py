"""Regenerate COVERAGE.md's "Driver gates" registry listing from
__spark_entry__.queries(), and report the registry-vs-artifact match for
the most recent CORRECTNESS_r{N}.json. Run at round end so the coverage
claims are derived, not asserted."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    missing = [q for q in qs if q not in oracles]
    arts = sorted(glob.glob("CORRECTNESS_r*.json"))
    print(f"registry: {len(qs)} gates; oracles missing: {missing or 'none'}")
    if arts:
        art = json.load(open(arts[-1]))
        extra = sorted(set(art) - set(qs))
        absent = sorted(set(qs) - set(art))
        green = sum(
            1 for v in art.values()
            if v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match")
        )
        print(f"{arts[-1]}: {len(art)} rows, {green} fully green; "
              f"renamed/merged since: {extra or 'none'}; "
              f"not yet in artifact: {absent or 'none'}")
    path = "COVERAGE.md"
    src = open(path).read()
    listing = ", ".join(qs)
    new = re.sub(
        r"(Registry \()\d+( gates.*?:\n\n).*?$",
        lambda m: f"{m.group(1)}{len(qs)}{m.group(2)}{listing}\n",
        src,
        flags=re.S,
    )
    if new != src:
        open(path, "w").write(new)
        print("COVERAGE.md registry listing regenerated")
    else:
        print("COVERAGE.md registry listing already current")


if __name__ == "__main__":
    main()
