#!/usr/bin/env python3
"""Rotate the driver gate window onto the next 50 never-gated ops.

Round 8 shipped zero commits, the manual rotation never ran, and the driver
burned its entire 50-slot verification budget re-proving round 7's window.
This tool makes the rotation a single idempotent command so that can never
happen again. Run it at the START of a round, after the driver's
CORRECTNESS_r{N}.json for the previous round has landed:

    python tools/rotate_window.py [--dry-run]

It performs, atomically in this order:
  1. FREEZE — verify CORRECTNESS_r{N}.json (N = max frozen round + 1) is on
     disk and its name set equals the live ``registry._WINDOW_PRIORITY``;
     append its per-op verdicts to tools/gate_history.json.
  2. ROTATE — compute the never-gated oracle-backed pool from the frozen
     history and rewrite the tuple between the WINDOW START/END markers in
     registry.py with the first 50 pool names (sorted — the same
     deterministic order DRIVER_COVERAGE.md's planned windows use).
  3. REGEN — rewrite DRIVER_COVERAGE.md from the updated history + window.

If the pool is empty the tool freezes the round and leaves the window
unchanged (every oracle-backed op has been driver-gated at least once).
Safe to re-run: a round already frozen is skipped with a message.
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import gen_driver_coverage as gdc  # noqa: E402
from highspeedrailwaybigdatasystem_spark import registry  # noqa: E402

REGISTRY_PATH = REPO / "highspeedrailwaybigdatasystem_spark" / "registry.py"
START = "# --- WINDOW START (rewritten by tools/rotate_window.py) ---"
END = "# --- WINDOW END ---"


def freeze_finished_round(all_green_round: int | None = None) -> int | None:
    """Append the finished round's driver verdicts to gate_history.json.
    Returns the frozen round number, or None if nothing new is on disk.

    ``all_green_round`` handles a round whose CORRECTNESS_r{N}.json was
    consumed by the driver instead of being left on disk, but whose verdict
    the judge quoted verbatim as all-green in VERDICT.md (round 11 is the
    precedent — provenance documented in gen_driver_coverage's docstring).
    It freezes the LIVE window as green for that round; it refuses any
    round other than the next unfrozen one, and is a no-op if an on-disk
    artifact exists (the artifact always wins)."""
    hist = gdc.history()
    n = max(hist) + 1
    path = REPO / f"CORRECTNESS_r{n:02d}.json"
    if not path.exists():
        if all_green_round == n:
            window = sorted(
                name for name in registry._WINDOW_PRIORITY
                if name in registry.all_queries()
                and name in registry.all_oracles()
            )
            raw = json.loads(gdc._HISTORY_JSON.read_text())
            # Recorded as "green-attested", NOT "green": the provenance is
            # a judge quote, not an on-disk CORRECTNESS artifact. The
            # ledger displays the distinction and plan_window re-proves
            # attested greens before artifact greens of the same round
            # (r12 ADVICE: the auditable-from-git chain must show which
            # rounds are artifact-backed).
            raw[str(n)] = {name: "green-attested" for name in window}
            gdc._HISTORY_JSON.write_text(json.dumps(raw, indent=1))
            print(
                f"froze round {n}: {len(window)}/{len(window)} "
                "green-attested from --freeze-window-green (verdict-quoted; "
                "no on-disk artifact)"
            )
            return n
        if all_green_round is not None:
            raise SystemExit(
                f"--freeze-window-green {all_green_round}: next unfrozen "
                f"round is {n}; refusing."
            )
        print(f"nothing to freeze: {path.name} not on disk (round {n} pending)")
        return None
    verdicts = gdc._disk_verdicts(path)
    window = {
        name for name in registry._WINDOW_PRIORITY
        if name in registry.all_queries() and name in registry.all_oracles()
    }
    if set(verdicts) != window:
        extra = sorted(set(verdicts) - window)[:5]
        missing = sorted(window - set(verdicts))[:5]
        raise SystemExit(
            f"{path.name} name set does not match the live window "
            f"(extra={extra}, missing={missing}) — refusing to freeze a "
            "mismatched round; reconcile manually."
        )
    raw = json.loads(gdc._HISTORY_JSON.read_text())
    raw[str(n)] = dict(sorted(verdicts.items()))
    gdc._HISTORY_JSON.write_text(json.dumps(raw, indent=1))
    n_green = sum(1 for v in verdicts.values() if v == "green")
    print(f"froze round {n}: {n_green}/{len(verdicts)} green -> gate_history.json")
    return n


def next_window(frozen: dict[int, dict[str, str]]) -> list[str]:
    """Delegates to gen_driver_coverage.plan_window — the ONE rotation
    policy (never-gated pool, then fail requeue, then rewritten-since-green
    re-proofs, then oldest-green re-proof rotation)."""
    return gdc.plan_window(frozen)


def window_stamp(names: list[str], round_no: int, seq: int) -> str:
    """Pin-provenance stamp: round, pin sequence within the round, and a
    hash of the tuple contents. tests/test_registry.py recomputes the
    hash from the live tuple — a hand edit that skips --repin leaves a
    stale stamp and fails the suite, so every mid-round re-pin is
    recorded (r14 ADVICE: the tuple was re-pinned 4x mid-round with
    nothing mechanical logging it)."""
    import hashlib

    h = hashlib.sha256("\n".join(names).encode()).hexdigest()[:12]
    return f"    # pin: r{round_no} seq {seq} sha {h}"


def current_pin() -> tuple[int, int] | None:
    """(round, seq) of the live window's stamp, or None (pre-stamp pin)."""
    m = re.search(r"# pin: r(\d+) seq (\d+) sha ", REGISTRY_PATH.read_text())
    return (int(m.group(1)), int(m.group(2))) if m else None


def rewrite_window(
    names: list[str], round_no: int, pool_size: int, seq: int = 1
) -> None:
    src = REGISTRY_PATH.read_text()
    i, j = src.index(START), src.index(END)
    n_new = min(pool_size, len(names))
    body = [
        START,
        "_WINDOW_PRIORITY: tuple[str, ...] = (",
        f"    # ROUND {round_no} window — generated by tools/rotate_window.py:",
        f"    # {n_new} never-gated (pool was {pool_size}) + "
        f"{len(names) - n_new} re-proof slots",
        "    # (plan_window policy; matches DRIVER_COVERAGE.md's planned lists).",
        window_stamp(names, round_no, seq),
    ]
    for k in range(0, len(names), 3):
        body.append("    " + " ".join(f'"{n}",' for n in names[k:k + 3]))
    body.append(")")
    body.append("")
    REGISTRY_PATH.write_text(src[:i] + "\n".join(body) + src[j:])
    tag = f"round-{round_no}" + (f" (re-pin seq {seq})" if seq > 1 else "")
    print(f"rotated _WINDOW_PRIORITY -> {len(names)} {tag} names")


def repin() -> None:
    """Mid-round re-pin: recompute plan_window for the CURRENT (unfrozen)
    round — picking up newly registered ops and new REPROOF_REWRITTEN
    entries — and rewrite the tuple with the pin sequence incremented.
    Loud by design: prints the promoted/dropped diff and the evidence
    obligation. The freeze path is untouched (still once per round)."""
    hist = gdc.history()
    round_no = max(hist) + 1
    pin = current_pin()
    if pin is not None and pin[0] != round_no:
        raise SystemExit(
            f"live stamp says r{pin[0]} but current round is {round_no}: "
            "run the normal rotation first (freeze + rotate), then --repin."
        )
    seq = (pin[1] if pin is not None else 1) + 1
    old = list(registry._WINDOW_PRIORITY)
    names = gdc.plan_window(hist)
    promoted = [n for n in names if n not in old]
    dropped = [n for n in old if n not in names]
    pool_size = len(
        [n for n in registry.all_oracles()
         if n not in {op for v in hist.values() for op in v}]
    )
    rewrite_window(names, round_no, pool_size, seq=seq)
    # registry.py changed on disk but this process imported the old tuple;
    # regen the ledger in a fresh interpreter so it reads the new pin.
    import subprocess

    subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_driver_coverage.py")],
        check=True,
    )
    print(
        f"RE-PIN r{round_no} seq {seq}: promoted {promoted or '[]'}, "
        f"dropped {dropped or '[]'}.\n"
        "OBLIGATION: each promoted op must have a fresh tools/mirror.py "
        "PASS (sf0.01 at minimum) in this round's record before round "
        "close — the stamp makes this re-pin visible to the judge."
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--freeze-window-green", type=int, default=None, metavar="ROUND",
        help="freeze the live window as all-green for ROUND when the "
        "driver consumed CORRECTNESS_r{ROUND}.json but the judge quoted it "
        "as 50/50 green in VERDICT.md (document provenance in "
        "gen_driver_coverage.py's docstring)",
    )
    ap.add_argument(
        "--repin", action="store_true",
        help="mid-round re-pin: recompute the CURRENT round's window "
        "(new ops / new REPROOF entries), increment the pin seq stamp, "
        "print the promoted-ops evidence obligation",
    )
    args = ap.parse_args()

    if args.repin:
        repin()
        return

    frozen_round = (
        freeze_finished_round(args.freeze_window_green)
        if not args.dry_run else None
    )
    if frozen_round is None and not args.dry_run:
        return
    hist = gdc.history()
    if args.dry_run:
        # Preview what a REAL run would rotate onto: a real run first
        # freezes the pending on-disk CORRECTNESS round, so fold it into a
        # copy of the history before drawing the window (ADVICE r9, low).
        n = max(hist) + 1
        pending = REPO / f"CORRECTNESS_r{n:02d}.json"
        if pending.exists():
            hist = dict(hist)
            hist[n] = gdc._disk_verdicts(pending)
    window = next_window(hist)
    pool_size = len(
        [n for n in registry.all_oracles()
         if n not in {op for v in hist.values() for op in v}]
    )
    if args.dry_run:
        print(f"next window ({len(window)} of pool {pool_size}):")
        for n in window:
            print(" ", n)
        return
    rewrite_window(window, max(hist) + 1, pool_size)
    if pool_size == 0:
        print("pool drained — window is a steady-state re-proof rotation")
    # regenerate in a SUBPROCESS: this process's operator modules registered
    # themselves into the pre-rewrite registry module object, so an in-process
    # reload would see an empty registry and render a bogus ledger
    import subprocess

    subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_driver_coverage.py")],
        check=True,
    )
    print("next: run `python -m pytest tests/test_registry.py -q` and commit")


if __name__ == "__main__":
    main()
