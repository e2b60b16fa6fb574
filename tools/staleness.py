"""Driver-attestation staleness report (VERDICT r8 item 8).

Scans every ``CORRECTNESS_r*.json`` in the repo root and reports, per
registered query, the most recent round with a fully-green driver row
(rows+schema+hash match, no err) and the most recent round windowed at
all. Window selection for the next round is then computed, not
hand-curated: never-attested queries first, then stalest-green.

Usage::

    python tools/staleness.py            # full report, stalest first
    python tools/staleness.py --window N # print the N-slot window pick
    python tools/staleness.py --plan     # this round's window AND the
                                         # next round's (assuming this
                                         # one lands green) — the
                                         # committed two-window schedule
                                         # (VERDICT r10 item 6)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect() -> tuple[dict[str, int], dict[str, int]]:
    """Returns (last_green_round, last_windowed_round) per query name."""
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            green = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_seen


def report(window_n: int | None = None) -> None:
    import __spark_entry__ as entry

    registry = list(entry._all_queries())
    last_green, last_seen = collect()
    # sort: never-attested first (green round 0), then by last green round
    # ascending, then registry order for stability
    order = {n: i for i, n in enumerate(registry)}
    ranked = sorted(
        registry, key=lambda n: (last_green.get(n, 0), order[n])
    )
    if window_n is None:
        print(f"{'query':40s} {'last_green':>10s} {'last_seen':>10s}")
        for n in ranked:
            g = last_green.get(n, 0) or "-"
            s = last_seen.get(n, 0) or "-"
            print(f"{n:40s} {str(g):>10s} {str(s):>10s}")
        greens = [last_green.get(n, 0) for n in registry]
        never = sum(1 for g in greens if g == 0)
        print(
            f"\n{len(registry)} registered; {never} never driver-green; "
            f"stalest attested round = r{min((g for g in greens if g), default=0)}"
        )
    else:
        # rows-only-by-design queries can sit in the window but a green
        # hash is impossible; keep them out of the computed pick so slots
        # go to hash-attestable rows
        oracles = entry.oracle_sql()
        pick = [n for n in ranked if n in oracles][:window_n]
        print(json.dumps(pick, indent=1))


def plan(window_n: int = 50) -> None:
    """Two-window schedule: this round's pick, then next round's pick
    computed AS IF this round lands fully green. With 69 stale+never
    rows and 50 slots, draining the r5-stale block takes exactly two
    windows — this makes the second leg a committed artifact instead of
    a promise (VERDICT r10 item 6)."""
    import __spark_entry__ as entry

    registry = list(entry._all_queries())
    oracles = entry.oracle_sql()
    last_green, _ = collect()
    order = {n: i for i, n in enumerate(registry)}
    this_round = max(list(last_green.values()) + [0]) + 1

    def window(greens: dict[str, int]) -> list[str]:
        ranked = sorted(registry, key=lambda n: (greens.get(n, 0), order[n]))
        return [n for n in ranked if n in oracles][:window_n]

    # the CURRENT round's window is the one PINNED in __spark_entry__
    # (the driver checks queries()[:50], which the _R*_WINDOW constant
    # controls) — mid-round additions must not silently displace the
    # committed slots in this round's leg; they lead the NEXT round's
    # computed window instead.
    pins = sorted(
        (int(re.match(r"_R(\d+)_WINDOW$", a).group(1)), a)
        for a in dir(entry)
        if re.match(r"_R(\d+)_WINDOW$", a)
    )
    w_now = list(getattr(entry, pins[-1][1])) if pins else window(last_green)
    simulated = dict(last_green)
    for n in w_now:
        simulated[n] = this_round
    w_next = window(simulated)
    after = dict(simulated)
    for n in w_next:
        after[n] = this_round + 1
    greens = [after.get(n, 0) for n in registry if n in oracles]
    n_oracled = len([n for n in registry if n in oracles])
    # min(default=0) guards the fresh-checkout / wiped-artifacts case
    # where no query has any green row yet (ADVICE r11).
    stalest = min((g for g in greens if g), default=0)
    print(json.dumps({
        f"r{this_round}_window": w_now,
        f"r{this_round + 1}_window": w_next,
        "max_age_after_both_if_green": (
            this_round + 1 - stalest if stalest else None
        ),
        # honesty note (r10 item 6 asked for max age <= 4): with
        # n_oracled queries and 50 slots/round the steady-state max age
        # is ceil(n/50) rounds by pigeonhole — the schedule above is the
        # MINIMAL-age rotation, not a <=4 guarantee, which is infeasible
        # at this registry size.
        "steady_state_floor_rounds": -(-n_oracled // window_n),
        "n_oracled": n_oracled,
    }, indent=1))


if __name__ == "__main__":
    if "--plan" in sys.argv:
        plan()
    else:
        n = None
        if "--window" in sys.argv:
            n = int(sys.argv[sys.argv.index("--window") + 1])
        report(n)
