"""Quantify this sandbox VM's concurrency tax on the analyzer workload.

Runs the IDENTICAL analyzer task (2048 fixture docs, full tokenize +
normalize + group, no disk I/O) on pre-warmed Ray workers at concurrency
1, 2 and 8, and prints the per-task wall-time medians. The ratio
median(c=2)/median(c=8) is the MACHINE ceiling for 2→8-worker scaling of
the build's map phase — no pipeline, scheduler or I/O involved. Used by
BASELINE.md to separate VM contention from pipeline efficiency.

Usage: PYTHONPATH=. python scripts/vm_contention_probe.py
"""
from __future__ import annotations

import statistics as st

import ray


@ray.remote(num_cpus=1)
def _work(batch, schema_json: str) -> float:
    import time

    from hunt_ray.index.build import AnalyzerStage

    global _stage  # one stage per worker process, like the real build
    try:
        s = _stage  # noqa: F821
    except NameError:
        s = _stage = AnalyzerStage(schema_json, [], [], 1, 8, None)
    t0 = time.time()
    s(batch)
    return time.time() - t0


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from hunt_ray.analyze.schema import default_schema, schema_to_json
    from hunt_ray.fixtures.pages import generate_pages

    ref = ray.put(generate_pages(seed=42, n_rows=2048))
    sj = schema_to_json(default_schema())

    ray.get([_work.remote(ref, sj) for _ in range(16)])  # warm, untimed

    seq = [ray.get(_work.remote(ref, sj)) for _ in range(8)]
    twos: list[float] = []
    for _ in range(6):
        twos.extend(ray.get([_work.remote(ref, sj) for _ in range(2)]))
    par = ray.get([_work.remote(ref, sj) for _ in range(16)])

    m1, m2, m8 = st.median(seq), st.median(twos), st.median(par)
    print(f"per-task wall (same task, warm workers):")
    print(f"  concurrency 1: median {m1 * 1000:.0f} ms")
    print(f"  concurrency 2: median {m2 * 1000:.0f} ms")
    print(f"  concurrency 8: median {m8 * 1000:.0f} ms")
    print(f"machine ceiling for 2->8 scaling: {m2 / m8:.3f}")
    print(f"machine ceiling for 1->8 scaling: {m1 / m8:.3f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
