"""No-Spark control for the scaling evidence: the raw extraction kernel
in a multiprocessing pool on the same machine.

Separates the engine's scaling behavior from the single box's memory
wall (BENCH/BASELINE.md): a pure-Python parse loop with zero Spark in
the stack shows how much per-core throughput this machine itself loses
as process count grows. Spark's own overhead is then the gap between
this control and tools/bench_scaling.py at the same level.

Usage: python tools/control_scaling.py [sf_dir] [procs ...]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_corpus(sf_dir: str, limit: int = 2000) -> list:
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' LIMIT {limit}"
    ).fetchall()

    def mk(text):
        toks = text.split()
        spans = ''.join(
            f'<span class="ocr_word" title="bbox {10 + 100 * i} 10 '
            f'{100 + 100 * i} 60">{w}</span> '
            for i, w in enumerate(toks))
        w_ = len(toks) * 100 + 100
        return (
            '<html><head><meta name="ocr-capabilities" '
            'content="ocr_page ocr_line ocr_word"/></head><body>'
            f'<div class="ocr_page" title="bbox 0 0 {w_} 1000">'
            '<span class="ocr_line">' + spans + '</span></div>'
            '</body></html>')

    return [mk(t[0]) for t in rows]


def _work(chunk):
    from ocrodjvu_spark.functions.extract import extract_one
    n = 0
    for m in chunk:
        extract_one(m, emit_spans=True, emit_sexpr=True)
        n += 1
    return n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    levels = [int(a) for a in sys.argv[2:]] or [1, 4, 16, 32]
    corpus = _make_corpus(sf_dir)
    baseline = None  # per-process throughput at procs == 1
    header = ('vs 1-proc' if 1 in levels
              else f'vs {levels[0]}-proc (NOT a 1-proc baseline)')
    print(f'| processes | turns/sec | per process ({header}) |')
    print('|---|---|---|')
    for procs in levels:
        # same total work per level as the 1-proc case, scaled so each
        # level runs a few seconds
        reps = max(1, 4 * procs)
        work = corpus * reps
        chunks = [work[i::procs] for i in range(procs)]
        with mp.Pool(procs) as pool:
            pool.map(_work, [c[:50] for c in chunks])  # warmup imports
            t0 = time.perf_counter()
            done = sum(pool.map(_work, chunks))
            dt = time.perf_counter() - t0
        tps = done / dt
        if baseline is None:
            baseline = tps / procs
        print(f'| {procs} | {tps:.0f} | {tps / procs:.0f} '
              f'({tps / procs / baseline:.2f}) |')


if __name__ == '__main__':
    main()
