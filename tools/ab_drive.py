"""Interleaved A/B driver (r13 optimization instrument): alternates each query between an OLD-tree and a
NEW-tree worker, several reps, and reports per-query min times + ratio.

Usage: python tools/ab_drive.py OLD_TREE NEW_TREE [reps] [query ...]
Defaults: reps=3, queries = NEW tree's bench list.
"""
import json
import subprocess
import sys

old_tree, new_tree = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
names = sys.argv[4:]
if not names:
    sys.path.insert(0, new_tree)
    from bench import BENCH_QUERIES

    names = list(BENCH_QUERIES)


def start(tree):
    p = subprocess.Popen(
        [sys.executable, str(__import__("pathlib").Path(__file__).with_name("ab_worker.py")), tree],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
    )
    while True:
        line = p.stdout.readline()
        if line.strip() == "READY":
            return p
        if not line:
            raise RuntimeError(f"worker {tree} died")


def run(p, name):
    p.stdin.write(name + "\n")
    p.stdin.flush()
    out = p.stdout.readline().split()
    if len(out) >= 2 and out[1] != "ERR":
        return float(out[1])
    return float("nan")


pold = start(old_tree)
pnew = start(new_tree)
res = {n: {"old": [], "new": []} for n in names}
for r in range(reps):
    for n in names:
        # alternate which side goes first each rep to cancel ordering bias
        order = [("old", pold), ("new", pnew)]
        if r % 2:
            order.reverse()
        for side, p in order:
            res[n][side].append(run(p, n))
        print(
            f"rep{r} {n}: old={res[n]['old'][-1]:.2f} new={res[n]['new'][-1]:.2f}",
            file=sys.stderr,
        )
for p in (pold, pnew):
    p.stdin.write("QUIT\n")
    p.stdin.flush()

rows = []
for n in names:
    o = min(res[n]["old"])
    w = min(res[n]["new"])
    rows.append((n, o, w, w - o, (w / o if o else float("nan"))))
rows.sort(key=lambda x: x[3])
tot_o = sum(r[1] for r in rows)
tot_n = sum(r[2] for r in rows)
print(f"{'query':42s} {'old':>6} {'new':>6} {'delta':>7} {'ratio':>6}")
for n, o, w, d, rt in rows:
    print(f"{n:42s} {o:6.2f} {w:6.2f} {d:7.2f} {rt:6.2f}")
print(f"TOTAL old={tot_o:.2f} new={tot_n:.2f} ratio={tot_n / tot_o:.3f}")
json.dump(
    {n: {"old": min(v["old"]), "new": min(v["new"]), "old_all": v["old"], "new_all": v["new"]} for n, v in res.items()},
    open("/tmp/ab_result.json", "w"),
)
