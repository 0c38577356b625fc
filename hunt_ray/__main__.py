"""CLI entry point — the `ray job submit` target for cluster runs.

    python -m hunt_ray build  --pages DIR --index DIR [--partitions N]
                              [--shuffle fs|ray] [--no-resume]
    python -m hunt_ray search --index DIR QUERY [--offset N] [--limit N]
    python -m hunt_ray bm25   --index DIR QUERY [--k N] [--mode MODE]
    python -m hunt_ray serve  --index DIR [--port P] [--actors N]
    python -m hunt_ray compact --root DIR

Owns the Ray session (the library itself never calls ray.init; see
__ray_entry__ driver contract). On a cluster: ``ray job submit --
python -m hunt_ray build --pages s3://… --index s3://…``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hunt_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index generation")
    b.add_argument("--pages", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--salt-buckets", type=int, default=4)
    b.add_argument("--shuffle", choices=("fs", "ray"), default="fs")
    b.add_argument("--batch-size", type=int, default=2048)
    b.add_argument("--no-resume", action="store_true")

    s = sub.add_parser("search", help="hunt-compat query")
    s.add_argument("--index", required=True)
    s.add_argument("query")
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--limit", type=int, default=20)

    bm = sub.add_parser("bm25", help="BM25 top-k query")
    bm.add_argument("--index", required=True)
    bm.add_argument("query")
    bm.add_argument("--k", type=int, default=10)
    bm.add_argument("--mode", choices=("maxscore", "wand", "exhaustive"),
                    default="maxscore")

    sv = sub.add_parser("serve", help="HTTP server over a segmented root")
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=3000)

    cp = sub.add_parser("compact", help="merge segments minus tombstones")
    cp.add_argument("--root", required=True)

    args = ap.parse_args(argv)
    ray = _init_ray()
    try:
        if args.cmd == "build":
            from .index.build import BuildConfig, build_index

            cfg = BuildConfig(num_partitions=args.partitions,
                              salt_buckets=args.salt_buckets,
                              shuffle_mode=args.shuffle,
                              batch_size=args.batch_size)
            info = build_index(args.pages, args.index, cfg,
                               resume=not args.no_resume)
            print(json.dumps({"generation": info["generation"],
                              "n_docs": info["stats"]["n_docs"],
                              "build_seconds": round(info["build_seconds"], 3),
                              "phases": info["phases"]}))
        elif args.cmd == "search":
            from .query.engine import SearchEngine

            res = SearchEngine(args.index).search(args.query, args.offset,
                                                  args.limit)
            print(json.dumps({"count": res.count, "result": [
                {"uri": h.url, "score": h.score} for h in res.result]}))
        elif args.cmd == "bm25":
            from .index.reader import IndexReader
            from .query.bm25 import BM25Engine

            hits = BM25Engine(IndexReader(args.index)).search(
                args.query, k=args.k, mode=args.mode)
            print(json.dumps({"result": [
                {"uri": h["url"], "score": round(h["score"], 6)}
                for h in hits]}))
        elif args.cmd == "serve":
            from .query.commands import CommandInterpreter
            from .server import HuntServer

            srv = HuntServer(CommandInterpreter(args.index), host=args.host,
                             port=args.port).start()
            print(json.dumps({"serving": f"http://{args.host}:{srv.port}"}),
                  flush=True)
            try:
                import time

                while True:
                    time.sleep(3600)
            except KeyboardInterrupt:
                srv.shutdown()
        elif args.cmd == "compact":
            from .index.segments import SegmentedIndex

            info = SegmentedIndex(args.root).compact()
            print(json.dumps({"compacted": True,
                              "n_docs": info["stats"]["n_docs"]}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
