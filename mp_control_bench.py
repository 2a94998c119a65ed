#!/usr/bin/env python
"""Hardware-ceiling control for the scaling measurement (BENCH.md §2).

Runs the IDENTICAL per-page kernel chain the OCR stage executes inside
Spark Python workers (decode → Otsu → shear estimate → deskew → XY-cut
→ stub recognize) under bare ``multiprocessing`` — no JVM, no Arrow, no
shuffle — at two process counts. The resulting pages/s/proc ratio is
the ceiling THIS BOX imposes on any N→4N thread-scaling measurement
(memory bandwidth, turbo, hypervisor steal); Spark's own efficiency
should be judged relative to it, because on a real cluster 4N
executors are 4× machines with their own memory buses, not 4× threads
on one bus.

Usage:  python mp_control_bench.py [--n-lo 8] [--n-hi 32] [--pages 4000]
Prints one JSON line:
  {"lo": {...}, "hi": {...}, "hw_scaling_efficiency": r, ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CORPUS: list[bytes] = []  # populated pre-fork; shared copy-on-write


def _page_kernel(img_bytes: bytes) -> int:
    from tesseract_glue_spark.config import ExtractionConfig
    from tesseract_glue_spark.engine import get_engine
    from tesseract_glue_spark.imaging import kernels
    from tesseract_glue_spark.imaging.codecs import decode_image
    from tesseract_glue_spark.imaging.render import PAYLOAD_ROWS

    gray = kernels.to_grayscale(decode_image(img_bytes))
    n_zones = 0
    body = gray[PAYLOAD_ROWS:]
    ink, t = kernels.otsu_binarize_with_threshold(body)
    if ink.any():
        shear = kernels.estimate_shear(ink)
        if abs(shear) > 1e-3:
            ink = kernels.deskew(body, shear) <= t
        n_zones = len(kernels.xy_cut(ink))
    text = get_engine(ExtractionConfig()).recognize(gray)
    return n_zones + len(text)


def _worker(args: tuple[int, int, float]) -> tuple[int, float]:
    lo, hi, _ = args
    t0 = time.perf_counter()
    acc = 0
    for i in range(lo, hi):
        acc += _page_kernel(_CORPUS[i % len(_CORPUS)])
    return hi - lo, time.perf_counter() - t0


def _run(n_procs: int, total_pages: int) -> dict:
    per = total_pages // n_procs
    chunks = [(i * per, (i + 1) * per, 0.0) for i in range(n_procs)]
    t0 = time.perf_counter()
    with mp.Pool(n_procs) as pool:
        results = pool.map(_worker, chunks)
    wall = time.perf_counter() - t0
    pages = sum(r[0] for r in results)
    return {
        "procs": n_procs,
        "pages": pages,
        "wall_sec": round(wall, 3),
        "pages_per_sec": round(pages / wall, 1),
        "pages_per_sec_per_proc": round(pages / wall / n_procs, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-lo", type=int, default=8)
    ap.add_argument("--n-hi", type=int, default=32)
    ap.add_argument("--pages", type=int, default=4000, help="distinct rendered pages")
    ap.add_argument("--work", type=int, default=40000, help="kernel invocations per level")
    args = ap.parse_args()

    from tesseract_glue_spark.imaging.render import is_dangling, render_page

    n = 0
    while len(_CORPUS) < args.pages:
        if not is_dangling(n):
            _CORPUS.append(render_page(n)[0])
        n += 1

    # warm both pool sizes once (imports + allocator), then measure
    _run(args.n_lo, args.n_lo * 50)
    lo = _run(args.n_lo, args.work)
    _run(args.n_hi, args.n_hi * 50)
    hi = _run(args.n_hi, args.work)
    ratio = hi["pages_per_sec"] / (args.n_hi / args.n_lo * lo["pages_per_sec"])
    print(
        json.dumps(
            {
                "metric": "bare_mp_kernel_scaling",
                "lo": lo,
                "hi": hi,
                "hw_scaling_efficiency": round(ratio, 3),
                "load_1m_after": float(open("/proc/loadavg").read().split()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
