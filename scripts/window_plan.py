"""Print the recommended driver-window order for the NEXT round.

Wraps registry.window() (the rotation policy as code, VERDICT r6 item
6): ranks modules by (never-checked member, changed member, pinned,
oldest latest-green round) over the CORRECTNESS_r*.json artifacts,
folds import-dependency modules forward, and shows where the 50-query
cut lands. The round builder copies the module order into
queries/__init__.py and updates tests/test_window.py's CHANGED/PIN
inputs; the fixed-point test then keeps the two in sync.

Usage:
  python scripts/window_plan.py [--changed q_a,q_b] [--pin mod1,mod2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from discogs_xml_to_parquet_spark import registry  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--changed", default="",
                   help="comma-separated query names changed since "
                        "their last green driver row")
    p.add_argument("--pin", default="",
                   help="comma-separated modules to force in-window")
    p.add_argument("--size", type=int, default=50)
    p.add_argument("--max-round", type=int, default=None,
                   help="ignore CORRECTNESS artifacts newer than this "
                        "round (pin the derivation; copy the value "
                        "into tests/test_window.py DERIVED_AT_ROUND)")
    args = p.parse_args()

    registry.load_all_queries()
    changed = frozenset(x for x in args.changed.split(",") if x)
    pin = tuple(x for x in args.pin.split(",") if x)
    order = registry.window(size=len(registry.QUERIES),
                            changed=changed, pin=pin,
                            max_round=args.max_round)
    latest = registry._latest_green_round(str(REPO),
                                          max_round=args.max_round)
    mod_of = {n: fn.__module__.rsplit(".", 1)[-1]
              for n, fn in registry.QUERIES.items()}

    pos = 0
    cur_mod = None
    for name in order:
        pos += 1
        m = mod_of[name]
        if m != cur_mod:
            cur_mod = m
            n_mod = sum(1 for q in order if mod_of[q] == m)
            print(f"-- {m} ({n_mod})")
        ev = ("NEVER" if name not in latest else f"r{latest[name]}")
        tag = " CHANGED" if name in changed else (
            " PIN" if m in pin else "")
        print(f"  {pos:3d} {name}  [{ev}]{tag}")
        if pos == args.size:
            print(f"{'=' * 12} {args.size}-query window cut {'=' * 12}")


if __name__ == "__main__":
    main()
