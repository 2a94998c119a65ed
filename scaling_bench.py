#!/usr/bin/env python
"""Throughput-scaling evidence: same job + same input at two parallelism
levels (the sandbox stand-in for N vs 4N executors per BASELINE.md).

Runs the full extraction pipeline over a scaling corpus in which every
media ref is distinct (OCR work ∝ docs, not capped by dedup at the
fixture pool size), in a fresh JVM per parallelism level, and reports

    efficiency = (docs/sec @ 4N) / (4 × docs/sec @ N)

Usage:  python scaling_bench.py [--n 8] [--docs 20000] [--pages 4]
Writes: prints one JSON line; use --md to append a section to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from bench import build_spark, idle_gate, _steal_total, _steal_pct
# bounded idle gate per side: both halves of a pair should sample
# comparable windows (the 4N side is the one hypervisor steal hits —
# BENCH.md header: one-sided slowdowns up to 1.9x)
gate = idle_gate()
spark = build_spark({cpus})
spark.sparkContext.setLogLevel("ERROR")
from tesseract_glue_spark import ExtractionConfig, extract_documents
if {web}:
    from tesseract_glue_spark.operators.web import extract_web_documents as extract_documents
docs = spark.read.parquet({corpus_dir!r} + "/documents_spans")
pages = spark.read.parquet({corpus_dir!r} + "/pages")
cfg = ExtractionConfig()
# ONE FULL-SIZE untimed warmup — the same protocol as bench.py: first
# execution is dominated by Janino/JIT compilation and Python-worker
# spin-up, which long-lived cluster executors pay once per cluster, not
# per job. (A 10-25% slice under-warmed the web path: its first
# full-size timed run still carried ~10 s of JIT at local[16],
# observed as a bimodal 24 s / 40 s wall.)
extract_documents(docs, pages, cfg).count()
samples = []
def one_sample():
    s0 = _steal_total()
    t0 = time.perf_counter()
    n = extract_documents(docs, pages, cfg).count()
    dt = time.perf_counter() - t0
    samples.append({{"wall": round(dt, 3), "steal_pct": _steal_pct(s0, _steal_total())}})
    return n
for _ in range(2):
    n = one_sample()
# steal defense (same shape as bench.py's flagship retry): if EVERY
# sample of this side was steal-contaminated, sleep and take bounded
# extra samples — steal is one-sided noise, so the best clean sample is
# the honest wall; a side where all samples stayed dirty is self-
# labeling in the JSON
for _ in range(2):
    if min(s["steal_pct"] for s in samples) <= 2.0:
        break
    time.sleep(30)
    n = one_sample()
best = min(s["wall"] for s in samples)
load = open("/proc/loadavg").read().split()[0]
print("RESULT " + json.dumps({{"cpus": {cpus}, "wall_sec": best,
      "docs": n, "docs_per_sec": round(n / best, 1), "load_1m_after": float(load),
      "samples": samples, **gate}}))
spark.stop()
"""

PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from bench import build_spark
spark = build_spark(32)
spark.sparkContext.setLogLevel("ERROR")
from tesseract_glue_spark.fixtures import scaling_corpus, materialize_corpus
docs = scaling_corpus(spark, {n_docs}, {pages_per_doc})
if {web}:
    from tesseract_glue_spark.operators.web import wrap_text_spans_html
    docs = wrap_text_spans_html(docs)
materialize_corpus(spark, docs, {corpus_dir!r}, partitions=32)
spark.stop()
"""


def run_worker(code: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism (4N is derived)")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--md", action="store_true", help="append results to BENCH.md")
    ap.add_argument(
        "--web",
        action="store_true",
        help="web-mode pipeline (HTML text spans DOM-stripped + media OCR'd)",
    )
    ap.add_argument(
        "--pairs",
        type=int,
        default=1,
        help="number of (N, 4N) pairs to run; the headline is the MEDIAN "
        "pair efficiency (single pairs are hostage to one-sided "
        "hypervisor steal on the 4N half)",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.abspath(__file__))
    corpus_dir = os.path.join(
        tempfile.gettempdir(),
        f"tg_scaling_{'web_' if args.web else ''}{args.docs}x{args.pages}",
    )
    if not os.path.exists(os.path.join(corpus_dir, "pages", "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", PREP.format(
                repo=repo, n_docs=args.docs, pages_per_doc=args.pages,
                corpus_dir=corpus_dir, web=args.web,
            )],
            check=True, timeout=3000, capture_output=True, text=True,
        )

    pairs = []
    for _ in range(max(args.pairs, 1)):
        pair = {}
        for cpus in (args.n, args.n * 4):
            pair[cpus] = run_worker(
                WORKER.format(repo=repo, cpus=cpus, corpus_dir=corpus_dir, web=args.web)
            )
        small, big = pair[args.n], pair[args.n * 4]
        pairs.append(
            {
                "efficiency": round(
                    big["docs_per_sec"] / (4.0 * small["docs_per_sec"]), 3
                ),
                "n": small,
                "n4": big,
            }
        )

    effs = sorted(p["efficiency"] for p in pairs)
    median = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    out = {
        "metric": "scaling_efficiency_N_to_4N"
        + ("_web" if args.web else ""),
        "value": median,
        "unit": "ratio",
        "aggregation": f"median_of_{len(pairs)}_pairs",
        "best": effs[-1],
        "n_cpus": args.n,
        "n4_cpus": args.n * 4,
        "docs": args.docs,
        "pages_per_doc": args.pages,
        "pairs": pairs,
    }
    print(json.dumps(out))
    if args.md:
        with open(os.path.join(repo, "BENCH.md"), "a") as fh:
            for p in pairs:
                small, big = p["n"], p["n4"]
                fh.write(
                    f"\n| local[{args.n}] → local[{args.n*4}] | {args.docs} docs × "
                    f"{args.pages} pages | {small['docs_per_sec']} docs/s @ N | "
                    f"{big['docs_per_sec']} docs/s @ 4N | **{p['efficiency']}** |"
                )
            fh.write(
                f"\n\nMedian of {len(pairs)} pairs: **{median}** (best {effs[-1]}); "
                f"every side carries its own load/steal metadata in the JSON.\n"
            )


if __name__ == "__main__":
    main()
