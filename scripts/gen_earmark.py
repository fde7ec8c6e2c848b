#!/usr/bin/env python
"""Generate the NEXT round's earmark queue mechanically.

The queue is the complete age-ordered rotation: every queries() entry
that is neither in the current 50-slot window (`_WINDOW_PRIORITY`) nor
pinned-once exempt, ascending by its LATEST driver round (union of all
CORRECTNESS_r*.json), never-driver-seen names first, ties broken by
name. The r9 audit found a hand-written queue had silently skipped 102
queries; this script replaces hand curation.

Usage: python scripts/gen_earmark.py
Prints a Python tuple literal ready to paste into __spark_entry__.py.

NOTE (r12): scripts/rotate_window.py now performs the WHOLE rotation in
place (window swap + queue regeneration + round-number prose), calling
this module's `build_queue`; prefer `rotate_window.py --apply` over
hand-pasting this script's output.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod

# Pinned-once rows-only exemptions (see _WINDOW_PRIORITY note in
# __spark_entry__.py): slots are never re-burned on these.
EXEMPT = {
    "embedding_principal_component",
    "parquet_footer_stats",
    "approx_distinct_customers",
}


def latest_rounds(max_round: int | None = None) -> dict[str, int]:
    """Latest driver round per query name. `max_round` clamps the union
    to files <= that round — rotate_window uses it to reconstruct the
    state a PAST rotation was rendered from, so a new CORRECTNESS file
    landing does not retroactively change what the committed prose is
    checked against."""
    latest: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        if max_round is not None and rnd > max_round:
            continue
        for name in json.loads(p.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def build_queue(names, window, latest) -> tuple[str, ...]:
    """The ONE queue-construction rule: every non-window, non-exempt
    name, never-driver-seen first, then ascending latest driver round,
    name tiebreak. Both main() and the pinning test
    (tests/test_round5_late_ops.py::test_earmark_matches_generator)
    call THIS function, so the script and the test cannot drift apart
    (r10 ADVICE: the test used to re-implement the sort key)."""
    return tuple(sorted(
        (n for n in names if n not in window and n not in EXEMPT),
        key=lambda n: (latest.get(n, 0), n),
    ))


def main() -> None:
    latest = latest_rounds()
    queue = build_queue(set(entry_mod.queries()),
                        set(entry_mod._WINDOW_PRIORITY),
                        latest)
    print("(")
    cur = None
    for n in queue:
        rnd = latest.get(n, 0)
        if rnd != cur:
            cur = rnd
            label = f"round {rnd}" if rnd else "never driver-seen"
            print(f"    # latest driver row {label}")
        print(f'    "{n}",')
    print(")")
    print(f"# total {len(queue)}", file=sys.stderr)
    # The mechanical NEXT rotation: the current earmark's first 50
    # become the new _WINDOW_PRIORITY; re-running this script AFTER
    # that swap generates the new earmark. Printed as a reminder so a
    # rotation round needs zero hand-curated name lists. Reds and
    # same-round reworks still jump the queue by hand.
    print("# next _WINDOW_PRIORITY = current _NEXT_EARMARK[:50]:",
          file=sys.stderr)
    for n in entry_mod._NEXT_EARMARK[:50]:
        print(f'#     "{n}",', file=sys.stderr)


if __name__ == "__main__":
    main()
