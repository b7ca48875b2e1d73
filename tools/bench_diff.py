# Round-over-round bench drift, explained in-artifact (VERDICT r14 #6):
# parse two BENCH_r*.json files (either the driver's wrapper with a `tail`
# string holding the one-line bench JSON, or that JSON line itself), print
# every common query whose wall moved more than THRESHOLD in either
# direction, and annotate each with whether git history in the given range
# touches that query name — so "untouched code, box variance" vs "real
# regression" is a printed fact, not a judge's probe.
#
#   python3 tools/bench_diff.py BENCH_r14.json BENCH_r15.json [--git-range A..B]
#   python3 tools/bench_diff.py old.json new.json --threshold 1.5
import argparse
import json
import re
import subprocess
import sys

THRESHOLD = 1.3


def load_queries(path):
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return d["queries"]
    # driver wrapper: the bench line lives (possibly truncated) in `tail`
    text = d["tail"] if isinstance(d, dict) and isinstance(d.get("tail"), str) else raw
    m = re.search(r'"queries"\s*:\s*\{', text)
    if m:
        frag = text[m.end():]
        end = frag.find("}")
        if end >= 0:
            frag = frag[:end]
        return {
            k: float(v)
            for k, v in re.findall(r'"(q[^"]+)"\s*:\s*([0-9.eE+-]+)', frag)
        }
    # last resort: any "qNN_name": seconds pairs anywhere in the file
    pairs = re.findall(r'"(q\d+_[^"]+)"\s*:\s*([0-9.eE+-]+)', text)
    if not pairs:
        sys.exit(f"{path}: no per-query timings found")
    return {k: float(v) for k, v in pairs}


def touched(query, git_range):
    # a query is "touched" if any commit in the range mentions its name in
    # a SOURCE diff (registration, implementation, oracle) — `git log -S`
    # pickaxe restricted to src/, so the driver's round artifacts (VERDICT/
    # CORRECTNESS name every query) don't flag everything
    try:
        out = subprocess.run(
            ["git", "log", "--oneline", "-S", query, git_range, "--", "src/"],
            capture_output=True, text=True, check=True).stdout.strip()
    except subprocess.CalledProcessError as e:
        sys.exit(f"git log failed for range {git_range}: {e.stderr.strip()}")
    return out.splitlines()


def main():
    ap = argparse.ArgumentParser(description="bench drift between two rounds")
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--git-range", default=None,
                    help="commit range to test 'touched this round?' (e.g. r14tag..HEAD)")
    ap.add_argument("--threshold", type=float, default=THRESHOLD)
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    print(f"common queries: {len(common)}  (old-only {len(set(old)-set(new))}, "
          f"new-only {len(set(new)-set(old))})")
    print(f"total old {sum(old[q] for q in common):.1f}s -> "
          f"new {sum(new[q] for q in common):.1f}s over the common set")
    drifted = [(q, old[q], new[q],
                (new[q] / old[q]) if old[q] > 0 else float("inf"))
               for q in common]
    flagged = [d for d in drifted
               if d[3] >= args.threshold or d[3] <= 1 / args.threshold]
    if not flagged:
        print(f"no common-query drift beyond {args.threshold}x")
        return
    if args.git_range:
        print("\nNOTE: touched? pickaxes the query NAME through src/ diffs — a "
              "change inside an operator file the query calls (no name "
              "mention) still reads 'no'; adjudicate those against the "
              "round's operator-file diffs.")
    print(f"\n{'query':40s} {'old_s':>8s} {'new_s':>8s} {'ratio':>7s}  touched?")
    for q, o, n, r in sorted(flagged, key=lambda d: -d[3]):
        mark = ""
        if args.git_range:
            hits = touched(q, args.git_range)
            mark = f"YES ({hits[0][:50]})" if hits else "no (untouched -> adjudicate as load/variance)"
        print(f"{q:40s} {o:8.2f} {n:8.2f} {r:6.2f}x  {mark}")


if __name__ == "__main__":
    main()
