#!/usr/bin/env python3
"""Re-seed BENCH_ref_<sf>.json from noop-era committed snapshots only.

The all-time reference ledger (the baseline for Bench's relative-inflation
check and the 2x snapshot commit gate) was seeded from EVERY historical
BENCH_local_<sf>.json. The oldest snapshots predate the round-6 switch of
the timed action from count() to the noop-format write (commit 56784d0 /
f122f38): count() let Catalyst prune columns and whole subtrees, so those
runs recorded per-query mins that are unreachable under the honest
methodology (e.g. q42 at 0.22 s vs ~0.6 s doing the full work). Carrying
them makes slow_relative flag healthy queries forever.

This tool rebuilds each ledger as the per-query MIN over committed
snapshots from the methodology boundary onward (plus the current working-
tree snapshot, if any). Run it once per sf dir after a methodology change;
the normal downward-only merge (Bench.mergeRefMins) resumes from the
result.
"""
import json
import subprocess
import sys

# First commit whose committed snapshot was measured through the noop sink.
BOUNDARY = "f122f38"

def snapshots(path):
    # BOUNDARY^..HEAD includes the boundary commit itself: the snapshot
    # committed AT f122f38 is the first noop-measured one and must
    # contribute to the re-seeded mins (rev-list's a..b excludes a).
    revs = subprocess.run(
        ["git", "rev-list", f"{BOUNDARY}^..HEAD", "--", path],
        capture_output=True, text=True, check=True).stdout.split()
    out = []
    for r in revs:
        try:
            blob = subprocess.run(["git", "show", f"{r}:{path}"],
                                  capture_output=True, text=True, check=True).stdout
            out.append(json.loads(blob))
        except Exception:
            pass
    try:
        out.append(json.load(open(path)))
    except Exception:
        pass
    return out

def main():
    for sf in sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1", "sf1"]:
        snap = f"BENCH_local_{sf}.json"
        mins = {}
        n = 0
        for s in snapshots(snap):
            qs = s.get("queries") or {}
            if not qs:
                continue
            n += 1
            for k, v in qs.items():
                if isinstance(v, (int, float)) and v >= 0.005:
                    mins[k] = min(mins.get(k, v), v)
        if not mins:
            print(f"{sf}: no noop-era snapshots found, skipped")
            continue
        body = ",".join(f'"{k}":{v:.2f}' for k, v in sorted(mins.items()))
        note = ("all-time per-query committed mins, merged only DOWNWARD "
                "across runs - the reference for the relative-inflation check and "
                "the 2x snapshot commit gate (Bench.mergeRefMins); re-seeded from "
                "noop-era snapshots only (tools/reseed_ref_ledger.py) because "
                "count()-era mins measured less work than the queries do")
        with open(f"BENCH_ref_{sf}.json", "w") as f:
            f.write('{"note":"' + note + '","queries":{' + body + "}}\n")
        print(f"{sf}: {len(mins)} queries from {n} snapshots")

if __name__ == "__main__":
    main()
