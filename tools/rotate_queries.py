"""Deterministic queries() rotation (r03 VERDICT #1 follow-through).

The driver hard-verifies only the FIRST 50 entries of
``__ray_entry__.queries()``. This tool rewrites the dict literal so the
rows least-recently driver-checked come first: sort key =
(last round checked — never-checked rows sort as round -1 —, current
position). Run it at the START of a round, after the driver has
written the previous round's CORRECTNESS_r{N}.json:

    python tools/rotate_queries.py          # rewrite in place
    python tools/rotate_queries.py --dry    # just print the window

Every row therefore lands in the driver window at most ceil(total/50)
rounds apart, and newly added rows (never checked) jump the queue.
"""
import argparse
import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

ENTRY = "/root/repo/__ray_entry__.py"
WINDOW = 50


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    last_checked: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for k in json.load(open(path)):
            last_checked[k] = rnd

    src = open(ENTRY).read()
    m = re.search(r"(def queries\(\) -> dict\[str, Callable\[\[str\], "
                  r"Any\]\]:\n(?:    #[^\n]*\n)*    return \{\n)(.*?)"
                  r"(\n    \}\n)", src, re.S)
    entries = re.findall(r'        "([a-z0-9_]+)": (_q_[a-z0-9_]+),',
                         m.group(2))
    order = {k: i for i, (k, _) in enumerate(entries)}
    fns = dict(entries)
    ranked = sorted(fns, key=lambda k: (last_checked.get(k, -1), order[k]))

    print(f"{len(ranked)} rows; window of {WINDOW}:")
    for k in ranked[:WINDOW]:
        print(f"  {k}  (last checked: r{last_checked.get(k, '—')})")
    never_out = [k for k in ranked[WINDOW:] if k not in last_checked]
    if never_out:
        print(f"STILL never-checked outside the window ({len(never_out)}):"
              f" {never_out}")
    if args.dry:
        return

    body = "\n".join(f'        "{k}": {fns[k]},' for k in ranked)
    header = ("def queries() -> dict[str, Callable[[str], Any]]:\n"
              "    # Deterministic rotation (tools/rotate_queries.py): the"
              " driver\n"
              "    # hard-verifies only the FIRST 50 dict entries, so rows"
              " least\n"
              "    # recently checked (never-checked first) lead; re-run the"
              " tool\n"
              "    # each round after the driver writes"
              " CORRECTNESS_r{N}.json.\n"
              "    return {\n")
    new = src[:m.start()] + header + body + m.group(3) + src[m.end():]
    open(ENTRY, "w").write(new)
    print("rewritten")


if __name__ == "__main__":
    main()
