"""CLI for the Ray-Data IR engine (the reference's script surface:
build_indexes.py / build_incremental_index.py / run_test_queries.py).

  python scripts/nirs_cli.py build  --input DIR --index DIR [--engine E] [--html]
  python scripts/nirs_cli.py append --input DIR --index DIR
  python scripts/nirs_cli.py search --index DIR --query "..." [--method auto] [-k 10]
  python scripts/nirs_cli.py bool   --index DIR --query "a AND (b OR c)"
  python scripts/nirs_cli.py verify --index DIR [--sample-frac F]
  python scripts/nirs_cli.py corpus --input RAW --out DIR [--max-docs N] [--cap-per-source N]

Owns its Ray session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _ray_init():
    import os

    import ray

    if not ray.is_initialized():
        # Honor RAY_ADDRESS so `ray job submit -- python scripts/nirs_cli.py
        # build ...` attaches to the submitting cluster (the job runner sets
        # RAY_ADDRESS); default to a local one-node session otherwise.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main() -> int:
    ap = argparse.ArgumentParser(prog="nirs")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--engine", default="cjk_bigram")
    b.add_argument("--html", action="store_true", help="extract text from the html column")
    b.add_argument("--id-col", default=None)
    b.add_argument("--shards", type=int, default=16)
    b.add_argument("--positions", action="store_true")
    b.add_argument("--no-resume", action="store_true")

    a = sub.add_parser("append")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--method", default="auto", choices=["auto", "naive", "wand", "maxscore"])
    s.add_argument("-k", type=int, default=10)

    q = sub.add_parser("bool")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)

    dl = sub.add_parser("delete", help="tombstone doc ids (no rewrite)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", required=True,
                    help="comma-separated doc ids and/or a:b ranges")

    cp = sub.add_parser("compact", help="rewrite the index without "
                                        "tombstoned docs (stats recomputed)")
    cp.add_argument("--index", required=True)

    v = sub.add_parser("verify", help="distributed index integrity audit")
    v.add_argument("--index", required=True)
    v.add_argument("--sample-frac", type=float, default=1.0)

    c = sub.add_parser("corpus", help="unified-corpus ETL (normalize, dedup, caps)")
    c.add_argument("--input", required=True, help="raw crawler records parquet (file or dir)")
    c.add_argument("--out", required=True)
    c.add_argument("--max-docs", type=int, default=None)
    c.add_argument("--cap-per-source", type=int, default=None)

    args = ap.parse_args()
    if args.cmd == "build":
        _ray_init()
        from news_information_retrieval_system_ray.pipelines.index_build import build_index

        r = build_index(args.input, args.index,
                        text_source="html" if args.html else "text",
                        id_col=args.id_col, engine=args.engine, n_shards=args.shards,
                        with_positions=args.positions, resume=not args.no_resume,
                        verbose=True)
        print(json.dumps({"n_docs": r.n_docs, "avg_doc_length": round(r.avg_doc_length, 4),
                          "posting_rows": r.n_posting_rows, "resumed_shards": r.resumed_shards}))
    elif args.cmd == "append":
        _ray_init()
        from news_information_retrieval_system_ray.pipelines.index_build import append_index

        r = append_index(args.index, args.input)
        print(json.dumps({"n_docs": r.n_docs, "avg_doc_length": round(r.avg_doc_length, 4),
                          "posting_rows": r.n_posting_rows}))
    elif args.cmd == "delete":
        from news_information_retrieval_system_ray.pipelines.index_build import delete_docs

        ids: list[int] = []
        for part in args.ids.split(","):
            if ":" in part:
                a_, b_ = part.split(":")
                ids.extend(range(int(a_), int(b_)))
            elif part.strip():
                ids.append(int(part))
        print(json.dumps({"tombstoned": delete_docs(args.index, ids)}))
    elif args.cmd == "compact":
        _ray_init()
        from news_information_retrieval_system_ray.pipelines.index_build import compact_index

        r = compact_index(args.index)
        print(json.dumps(r if r is not None else {"noop": True}))
    elif args.cmd == "verify":
        _ray_init()
        from news_information_retrieval_system_ray.pipelines.index_build import verify_index

        r = verify_index(args.index, sample_frac=args.sample_frac)
        print(json.dumps(r))
        return 0 if r["ok"] else 1
    elif args.cmd == "corpus":
        _ray_init()
        from news_information_retrieval_system_ray.pipelines.corpus_build import (
            build_corpus, read_raw_records, write_corpus)

        surv, stats, reasons = build_corpus(
            read_raw_records(args.input), max_docs=args.max_docs,
            max_docs_per_source=args.cap_per_source)
        write_corpus(surv, args.out, stats, reasons)
        print(json.dumps({"written": int(stats["written"].sum()),
                          "scanned": int(stats["scanned"].sum()),
                          "invalid": int(stats["invalid"].sum()),
                          "duplicates": int(stats["duplicates"].sum())}))
    elif args.cmd == "search":
        from news_information_retrieval_system_ray.pipelines.query import IndexSearcher

        srch = IndexSearcher(args.index)
        for rank, (doc, score) in enumerate(srch.search(args.query, k=args.k, method=args.method), 1):
            print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 4)}))
    elif args.cmd == "bool":
        from news_information_retrieval_system_ray.pipelines.query import IndexSearcher

        srch = IndexSearcher(args.index)
        ids = srch.boolean_query(args.query)
        print(json.dumps({"n": int(ids.size), "doc_ids": ids[:100].tolist()}))
    return 0


if __name__ == "__main__":
    import ray

    code = main()
    if ray.is_initialized():
        ray.shutdown()
    raise SystemExit(code)
