"""Render the docs/benchmarks.md workload table from ONE capture run.

Reads a BENCH_SUITE_r*.json capture and prints markdown rows where every
(best, median) pair comes from the same run — the single-run discipline
the round-4 review asked for (docs previously paired the best of one
suite pass with the median of another).

Usage: python dev/docs_table_from_capture.py [BENCH_SUITE_r05.json]
Picks the LAST line per metric (the newest run appended to the file).
"""
import json
import sys

LABELS = {
    "d3_distillation": ("d=3 15-to-1 distillation (`distillation_d3`, p=0.05)", 35),
    "d5_distillation": ("d=5 distillation (`distillation_d5`, p=0.02)", 85),
    "d3_cultivation": ("d=3 cultivation, 1 check (`cultivation_d3`, p=0.001)", 8),
    "d3_cultivation2": ("d=3 cultivation, 2 checks (`cultivation_d3(checks=2)`)", 8),
    "d3_cultivation_full": (
        "full-protocol grown cultivation (`cultivation_d3_grown(checks=2)`)", 21),
    "d7_surface_code": ("d=7 rotated surface code memory (`models.surface_code`)", 97),
}


def fmt(v):
    if v >= 1e6:
        return f"{v / 1e6:.2f}M"
    return f"{v / 1e3:.0f}k"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SUITE_r05.json"
    rows = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") in LABELS:
                rows[d["metric"]] = d  # last wins
    for metric, (label, qubits) in LABELS.items():
        d = rows.get(metric)
        if d is None:
            print(f"| {label} | {qubits} | ? | (missing) | | `{path}` |")
            continue
        print(
            f"| {label} | {qubits} | ? | {fmt(d['value'])} | "
            f"{fmt(d['median'])} | `{path}` |"
        )


def _load_lines(path):
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield json.loads(line)


def main_sweep(path):
    """Markdown table of the error-rate sweep (one row per panel+p)."""
    rows = {}
    for d in _load_lines(path):
        if d.get("metric", "").endswith("_sweep"):
            rows[(d["metric"][: -len("_sweep")], d["p"])] = d  # last wins
    print("| workload | p | best shots/s | median |")
    print("|---|---|---|---|")
    for (name, p), d in sorted(rows.items()):
        print(f"| {name} | {p:g} | {fmt(d['value'])} | {fmt(d['median'])} |")


def main_scaling(path):
    """Markdown table of surface-code memory scaling (one row per d)."""
    rows = {}
    for d in _load_lines(path):
        if d.get("metric") == "surface_code_scaling":
            rows[d["d"]] = d  # last wins
    print("| distance | best shots/s | median |")
    print("|---|---|---|")
    for dist, d in sorted(rows.items()):
        print(f"| d={dist} | {fmt(d['value'])} | {fmt(d['median'])} |")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    mode = next((a for a in args if a in ("sweep", "scaling")), None)
    paths = [a for a in args if a not in ("sweep", "scaling")]
    path = paths[0] if paths else "BENCH_SUITE_r05.json"
    if mode == "sweep":
        main_sweep(path)
    elif mode == "scaling":
        main_scaling(path)
    else:
        main()
