#!/usr/bin/env python
"""Signature-kernel contention microbenchmark (SCALING.md evidence).

Runs N identical worker PROCESSES (not threads — same isolation as
Spark's python workers), each looping the full per-doc signature
kernel (shingle → minhash → bands → sketch → simhash) over a
deterministic ~4 KB synthetic source-code doc mix, and reports the
median per-doc wall at each worker count.  The ratio between the
1-worker and 32-worker per-doc wall isolates shared-memory-system
contention from every Spark/JVM effect: these processes share nothing
but the memory hierarchy.

Usage: python tools/kernel_contention.py [counts ...]   (default 1 8 32)
Prints one JSON line per worker count.
"""
import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS_PER_LEVEL = 12.0


def _make_docs(n=64):
    import numpy as np

    rng = np.random.RandomState(7)
    words = [
        "def", "return", "import", "self", "value", "index", "state",
        "for", "class", "result", "buffer", "config", "assert", "yield",
    ]
    docs = []
    for _ in range(n):
        lines = rng.randint(60, 120)
        docs.append(
            "\n".join(" ".join(rng.choice(words, 8)) for _ in range(lines))
        )
    return docs


def _worker(barrier, out_q, seconds):
    import numpy as np

    from photo_dedup_spark.config import DEFAULT_CONFIG as cfg
    from photo_dedup_spark.functions import signatures as S

    docs = _make_docs()

    def one(t):
        sh = S.shingle_hashes(t, cfg.shingle_k)
        m = S._minhash_from_shingles(sh, cfg)
        S.band_hashes_py(m, cfg)
        b, kept = S.sketch_py(sh, cfg)
        S.sketch_to_bytes(kept)
        S._simhash_from_shingles(kept.view(np.uint64), cfg)

    for d in docs:  # warm buffers + caches
        one(d)
    barrier.wait()
    walls = []
    deadline = time.monotonic() + seconds
    i = 0
    while time.monotonic() < deadline:
        t0 = time.perf_counter()
        one(docs[i % len(docs)])
        walls.append(time.perf_counter() - t0)
        i += 1
    out_q.put(statistics.median(walls) * 1000)


def run(counts):
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    for n in counts:
        ctx = mp.get_context("spawn")
        barrier = ctx.Barrier(n)
        q = ctx.Queue()
        procs = [
            ctx.Process(target=_worker, args=(barrier, q, SECONDS_PER_LEVEL))
            for _ in range(n)
        ]
        for p in procs:
            p.start()
        meds = [q.get() for _ in procs]
        for p in procs:
            p.join()
        print(
            json.dumps(
                {
                    "workers": n,
                    "per_doc_ms_median_of_workers": round(
                        statistics.median(meds), 3
                    ),
                    "per_doc_ms_worst_worker": round(max(meds), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    run([int(a) for a in sys.argv[1:]] or [1, 8, 32])
