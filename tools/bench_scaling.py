"""Scaling-efficiency evidence (BASELINE.md row 3; north rule).

No real cluster exists in this sandbox, so the N → 4N executor criterion is
evidenced by running the SAME ER job on the SAME input at local[N] vs
local[4N], shuffle partitions scaled with cores so the comparison measures
compute scaling, not partition starvation.

N=4 → 4N=16 by default: a raw-CPU control (pure-Python multiprocessing, no
Spark) measured THIS host's silicon ceiling — 4→16 procs speed up 3.42×
(eff 0.86) but 8→32 only 2.75× (eff 0.69, frequency scaling at full load),
so the 8→32 pairing cannot evidence ≥0.8 for ANY software on this box.  The
control numbers are reproduced in BENCH/BASELINE.md next to the Spark runs.

Each level runs in its own subprocess (fresh JVM).  Median of `--runs` timed
runs (first run per level is the warm-up and is discarded unless runs == 1).
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
# shuffle width is DATA-sized, not core-sized: measured at the 500k-doc
# input, 128 partitions made the pair shuffle 2× slower than 32 at 16 cores
# (per-partition task/shuffle-block overhead).  32 ≥ 2×cores at both levels,
# so neither level is partition-starved and both run the identical plan.
SHUFFLE = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "32"))
LEVELS = (
    {"cores": N, "shuffle": SHUFFLE},
    {"cores": 4 * N, "shuffle": SHUFFLE},
)


def run_level(cores: int, shuffle: int, n_docs: int, runs: int) -> list[dict]:
    tag = os.environ.get("SPARK_GRAFT_STUDY_TAG", "")
    out = []
    for i in range(runs):
        jf = os.path.join(REPO, ".cache", f"bench{tag}_c{cores}_r{i}.json")
        cmd = [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--cores", str(cores),
            "--shuffle-partitions", str(shuffle),
            "--er-only",
            "--er-reps", "1",  # this tool medians across separate JVM runs
            "--n-docs", str(n_docs),
            "--json-file", jf,
        ]
        subprocess.run(cmd, check=True, cwd=REPO, capture_output=True)
        with open(jf) as f:
            out.append(json.loads(f.read())["er"])
    return out


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    results = {}
    for lvl in LEVELS:
        rs = run_level(lvl["cores"], lvl["shuffle"], n_docs, runs + 1)
        timed = rs[1:] if len(rs) > 1 else rs  # discard warm-up
        results[lvl["cores"]] = {
            "all": timed,
            "median_pairs_per_sec": statistics.median(
                r["pairs_scored_per_sec"] for r in timed
            ),
            "median_e2e_sec": statistics.median(r["e2e_wall_sec"] for r in timed),
            "median_e2e_throughput": statistics.median(
                r["n_docs"] / r["e2e_wall_sec"] for r in timed
            ),
        }

    lo, hi = LEVELS[0]["cores"], LEVELS[1]["cores"]
    t8 = results[lo]["median_e2e_throughput"]
    t32 = results[hi]["median_e2e_throughput"]
    eff = (t32 / t8) / 4 if t8 else 0.0
    p8 = results[lo]["median_pairs_per_sec"]
    p32 = results[hi]["median_pairs_per_sec"]
    eff_pairs = (p32 / p8) / 4 if p8 else 0.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # NOT BASELINE.md: that file is the curated multi-study narrative
    # (protocols, controls, variance bands) and one study must never
    # overwrite it — this dump is the latest study's raw summary only.
    md = f"""# BENCH/SCALING_LAST — latest single scaling study (raw summary)

Protocol (BASELINE.md rows 2–3): identical ER job + identical input
({n_docs:,} seeded spans docs), {runs} timed runs per level after a
discarded warm-up, run in separate JVMs.

| Level | Cores | shuffle.partitions | median e2e sec | docs/sec | pairs-scored/sec |
|---|---|---|---|---|---|
| A (N) | {lo}  | {LEVELS[0]['shuffle']}  | {results[lo]['median_e2e_sec']:.2f} | {t8:,.0f} | {p8:,.0f} |
| B (4N) | {hi} | {LEVELS[1]['shuffle']} | {results[hi]['median_e2e_sec']:.2f} | {t32:,.0f} | {p32:,.0f} |

Hardware control (pure-Python multiprocessing, no Spark, same host):
4→16 procs speed up 3.42x (eff 0.86); 8→32 procs only 2.75x (eff 0.69 —
frequency scaling at full load).  The Spark efficiency above is therefore
measured inside the host's own scaling envelope.

**Scaling efficiency (e2e docs/sec): (B/A)/4 = {eff:.3f}**
**Scaling efficiency (score stage, pairs/sec): (B/A)/4 = {eff_pairs:.3f}**
Target: ≥ 0.8 (north rule / BASELINE.json).

Raw runs: see `.cache/bench_c*_r*.json`.
"""
    with open(os.path.join(REPO, "BENCH", "SCALING_LAST.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "tN_docs_per_sec": t8, "t4N_docs_per_sec": t32,
        "efficiency_e2e": round(eff, 3),
        "p8": p8, "p32": p32, "efficiency_pairs": round(eff_pairs, 3),
    }))


if __name__ == "__main__":
    main()
