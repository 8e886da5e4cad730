"""Round-close checklist gate (VERDICT r7 item 8).

Round 7 shipped nothing: no commits, no rotation, no floor row, open
ADVICE items — and nothing refused to let that happen. This script is
the refusal: run it before declaring a round done; it exits non-zero
unless every gate the r7 post-mortem named is satisfied:

1. builder commits exist since the driver's last "round N:" commit;
2. the verification-window rotation advanced (registry.py changed);
3. a BASELINE.md floor row was appended;
4. open ADVICE.md items were triaged (a commit references ADVICE);
5. the full-registry parity sweep is green AND fresher than every
   tracked source file (run scripts/parity_sweep.py to refresh
   sweep_last.json);
6. (since r10 — VERDICT r9 item 4) the ZERO-tolerance exact sweep is
   green and fresh too (scripts/parity_sweep.py --exact →
   sweep_exact_last.json): it catches the -0.0 / Decimal / NaN cell
   classes the tolerant compare canonicalizes away, which is exactly
   how both r9 driver-hash failures shipped. An exact-diff key is
   only acceptable with a documented explanation in SCALE.md and an
   explicit --waive exact=... here.

Gates 2-4 accept an explicit documented waiver (--waive GATE=REASON,
repeatable) because a legitimate round can e.g. skip rotation when every
key's verdict is already fresh — but the waiver is printed, so skipping
is a visible decision instead of an omission. Gates 1 and 5 cannot be
waived.

Usage: python scripts/round_close.py [--waive rotation=...] [...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def _round_base() -> str:
    """The driver's latest 'round N: verdict/...' commit — everything
    after it is this round's builder work."""
    out = _git("log", "--grep=^round [0-9]", "--format=%H", "-1")
    if not out.strip():
        # No driver commit yet (round 1): gate against the root commit.
        return _git("rev-list", "--max-parents=0", "HEAD").strip()
    return out.strip()


def _newest_source_mtime() -> float:
    newest = 0.0
    tracked = _git("ls-files", "*.py").splitlines()
    for rel in tracked:
        path = os.path.join(REPO, rel)
        if os.path.exists(path):
            newest = max(newest, os.path.getmtime(path))
    return newest


def main(argv: list[str]) -> int:
    waivers: dict[str, str] = {}
    for arg in argv:
        if arg.startswith("--waive"):
            gate, _, reason = arg.split("=", 1)[-1].partition("=")
            if not reason:
                gate, reason = arg.split("=", 1)[-1], "(no reason given)"
            waivers[gate] = reason
    base = _round_base()
    failures: list[str] = []

    def gate(name: str, ok: bool, detail: str) -> None:
        if ok:
            print(f"  ok       {name}: {detail}")
        elif name in waivers:
            print(f"  WAIVED   {name}: {waivers[name]}")
        else:
            print(f"  MISSING  {name}: {detail}")
            failures.append(name)

    commits = _git("log", "--oneline", f"{base}..HEAD").splitlines()
    # Gate 1 — unwaivable: a round with zero commits shipped nothing.
    if commits:
        print(f"  ok       commits: {len(commits)} since round base {base[:8]}")
    else:
        print(f"  MISSING  commits: none since round base {base[:8]}")
        failures.append("commits")

    reg = "sparkstreamingtohdfsofsensorsdata_spark/registry.py"
    gate(
        "rotation",
        bool(_git("diff", f"{base}..HEAD", "--", reg).strip()),
        "registry.py (VERIFICATION_PRIORITY) changed this round",
    )
    # Rotation-freshness (VERDICT r15 item 2): the window must have been
    # recomputed AFTER the newest committed driver artifact — i.e.
    # ROTATION_ROUND == max CORRECTNESS round + 1. This is the explicit
    # round-open forcing function; the pytest rotation-policy test pins
    # to ROTATION_ROUND so the suite itself stays green when the NEXT
    # artifact lands post-close.
    import glob
    import re as _re
    import sys as _sys

    _sys.path.insert(0, REPO)
    from sparkstreamingtohdfsofsensorsdata_spark.registry import ROTATION_ROUND

    art_rounds = [
        int(_re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    want = (max(art_rounds) + 1) if art_rounds else ROTATION_ROUND
    gate(
        "rotation_fresh",
        ROTATION_ROUND == want,
        f"ROTATION_ROUND={ROTATION_ROUND} == newest CORRECTNESS round + 1 "
        f"({want}) — re-rotate VERIFICATION_PRIORITY if a new artifact "
        "landed",
    )
    gate(
        "floor",
        bool(_git("diff", f"{base}..HEAD", "--", "BASELINE.md").strip()),
        "BASELINE.md floor table changed this round",
    )

    advice_path = os.path.join(REPO, "ADVICE.md")
    with open(advice_path) as fh:
        advice_has_items = "- **" in fh.read()
    if advice_has_items:
        log_blob = _git("log", f"{base}..HEAD", "--format=%s%n%b")
        diff_blob = _git("diff", f"{base}..HEAD", "--stat")
        triaged = "ADVICE" in log_blob or "ADVICE.md" in diff_blob
        gate("advice", triaged, "a commit since round base references ADVICE")
    else:
        print("  ok       advice: ADVICE.md has no open items")

    # Gate 5 — unwaivable: green + fresh full-registry sweep.
    sweep_path = os.path.join(REPO, "sweep_last.json")
    if not os.path.exists(sweep_path):
        print("  MISSING  sweep: sweep_last.json absent — run scripts/parity_sweep.py")
        failures.append("sweep")
    else:
        with open(sweep_path) as fh:
            sweep = json.load(fh)
        stale = os.path.getmtime(sweep_path) < _newest_source_mtime()
        if sweep.get("fail", 1) != 0:
            print(f"  MISSING  sweep: {sweep.get('fail')} failing keys {sweep.get('failed_keys')}")
            failures.append("sweep")
        elif stale:
            print("  MISSING  sweep: sweep_last.json older than a tracked .py — re-run scripts/parity_sweep.py")
            failures.append("sweep")
        else:
            print(
                f"  ok       sweep: {sweep.get('pass')} pass + "
                f"{sweep.get('rows_only')} rows-only / {sweep.get('total')} at {sweep.get('sf_dir')}"
            )

    # Gate 6 — exact sweep: green + fresh, waivable only with a reason
    # (which SCALE.md must then carry per exact-diff key).
    exact_path = os.path.join(REPO, "sweep_exact_last.json")
    if not os.path.exists(exact_path):
        gate(
            "exact",
            False,
            "sweep_exact_last.json absent — run scripts/parity_sweep.py --exact",
        )
    else:
        with open(exact_path) as fh:
            esweep = json.load(fh)
        stale = os.path.getmtime(exact_path) < _newest_source_mtime()
        bad = esweep.get("fail", 1) != 0 or esweep.get("exact_diff", 1) != 0
        detail = (
            f"{esweep.get('pass')} exact / {esweep.get('total')} at "
            f"{esweep.get('sf_dir')}"
            + (
                f"; diffs {esweep.get('exact_diff_keys')}"
                if esweep.get("exact_diff")
                else ""
            )
            + ("; STALE — re-run with --exact" if stale else "")
        )
        gate("exact", not (bad or stale), detail)

    if failures:
        print(f"round NOT closeable: {', '.join(failures)}")
        return 1
    print("round closeable")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
