"""CLI entry points: ``python -m s2ray <command>``.

Owns the Ray session (guarded init — never called when a driver already
initialised Ray, per the repo contract).

Commands:
  tiles      pages -> S2 cell assignment -> level-K tile counts -> parquet
             (``--partitioned`` writes the resumable Hilbert-partitioned
             layout with per-partition manifests)
  cap-join   pages x city caps spatial join -> parquet
  media      synthetic media -> decode actor pool -> per-type stats
  sessions   events sessionization -> parquet
  corpus-keep  training-data cleaning capstone -> kept doc ids parquet
  asof       events as-of join (latest prior <right> per <left>) -> parquet
  pyramid    multi-level tile rollup (one scan) -> parquet
  quantiles  exact per-group quantiles of events.value -> json
  sample     deterministic stratified corpus sample -> parquet
  chunk-dedup  cross-document duplicated-chunk removal -> cleaned parquet
  thumbs     real PNG thumbnails (pure-python pixel codec) -> parquet
  split      deterministic train/val/test assignment -> parquet
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None):
    p = argparse.ArgumentParser(prog="s2ray")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tiles")
    t.add_argument("--out", required=True)
    t.add_argument("--level", type=int, default=8)
    t.add_argument("--repl", type=int, default=1)
    t.add_argument("--partitioned", action="store_true")

    c = sub.add_parser("cap-join")
    c.add_argument("--out", required=True)
    c.add_argument("--radius-m", type=float, default=150000.0)

    sub.add_parser("media")

    s = sub.add_parser("sessions")
    s.add_argument("--out", required=True)
    s.add_argument("--gap-s", type=int, default=1800)

    ck = sub.add_parser("corpus-keep")
    ck.add_argument("--out", required=True)
    ck.add_argument("--tau", type=float, default=0.5)
    ck.add_argument("--min-quality", type=float, default=0.5)
    ck.add_argument("--partitioned", action="store_true",
                    help="resumable doc-id-bucketed layout with manifests")
    ck.add_argument("--buckets", type=int, default=16)

    aj = sub.add_parser("asof")
    aj.add_argument("--out", required=True)
    aj.add_argument("--left", default="purchase")
    aj.add_argument("--right", default="click")

    py = sub.add_parser("pyramid")
    py.add_argument("--out", required=True)
    py.add_argument("--levels", default="8,6,4,2")

    qn = sub.add_parser("quantiles")
    qn.add_argument("--qs", default="0.5,0.9,0.99")

    sm = sub.add_parser("sample")
    sm.add_argument("--out", required=True)
    sm.add_argument("--rate-bp", type=int, default=5000,
                    help="uniform basis-point rate applied to every source")

    cd = sub.add_parser("chunk-dedup")
    cd.add_argument("--out", required=True)
    cd.add_argument("--chunk-tokens", type=int, default=50)
    cd.add_argument("--min-docs", type=int, default=2)

    th = sub.add_parser("thumbs")
    th.add_argument("--out", required=True)
    th.add_argument("--max-dim", type=int, default=64)

    sp = sub.add_parser("split")
    sp.add_argument("--out", required=True)
    sp.add_argument("--val-bp", type=int, default=500)
    sp.add_argument("--test-bp", type=int, default=500)

    args = p.parse_args(argv)
    ray = _ensure_ray(args.num_cpus)
    try:
        if args.cmd == "tiles":
            if args.partitioned:
                from .pipelines.tiles import write_tiles_partitioned

                res = write_tiles_partitioned(args.sf_dir, args.out,
                                              level=args.level, repl=args.repl)
                print(json.dumps({"cmd": "tiles", "partitioned": True, **res}))
            else:
                from .pipelines.tiles import tile_counts

                ds = tile_counts(args.sf_dir, level=args.level, repl=args.repl)
                ds.write_parquet(args.out)
                print(json.dumps({"cmd": "tiles", "out": args.out}))
        elif args.cmd == "cap-join":
            from .kernel.region import Cap
            from .pipelines.spatial_join import spatial_join_broadcast
            from .pipelines.tiles import pages_with_cells
            from .sources.pages import CITIES_E4

            regions = {
                f"cap{k}": Cap.from_latlng_radius(la / 1e4, ln / 1e4,
                                                  args.radius_m)
                for k, (la, ln) in enumerate(CITIES_E4)
            }
            ds = pages_with_cells(args.sf_dir, token_level=None)
            out = spatial_join_broadcast(ds, regions)
            out.write_parquet(args.out)
            print(json.dumps({"cmd": "cap-join", "out": args.out}))
        elif args.cmd == "chunk-dedup":
            from .pipelines.dedup import chunk_dedup

            chunk_dedup(args.sf_dir, chunk_tokens=args.chunk_tokens,
                        min_docs=args.min_docs).write_parquet(args.out)
            print(json.dumps({"cmd": "chunk-dedup", "out": args.out}))
        elif args.cmd == "thumbs":
            from .stages.multimodal import MediaThumbnailStage, read_media

            (read_media(args.sf_dir)
             .map_batches(MediaThumbnailStage, concurrency=(1, 4),
                          fn_constructor_kwargs={"max_dim": args.max_dim},
                          batch_size=128, batch_format="pyarrow")
             .write_parquet(args.out))
            print(json.dumps({"cmd": "thumbs", "out": args.out}))
        elif args.cmd == "split":
            from .pipelines.sampling import split_corpus

            split_corpus(args.sf_dir, val_bp=args.val_bp,
                         test_bp=args.test_bp).write_parquet(args.out)
            print(json.dumps({"cmd": "split", "out": args.out}))
        elif args.cmd == "media":
            from .stages.multimodal import media_stats

            df = media_stats(args.sf_dir).to_pandas()
            print(df.to_json(orient="records"))
        elif args.cmd == "sessions":
            from .pipelines.analytics import user_sessions

            user_sessions(args.sf_dir, gap_s=args.gap_s).write_parquet(args.out)
            print(json.dumps({"cmd": "sessions", "out": args.out}))
        elif args.cmd == "corpus-keep":
            from .pipelines.dedup import corpus_dedup_keep

            out = corpus_dedup_keep(args.sf_dir, tau=args.tau,
                                    min_quality=args.min_quality)
            if args.partitioned:
                import pyarrow as pa

                from .state.sink import write_partitioned

                def bucket(batch: pa.Table) -> pa.Table:
                    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                    return batch.append_column(
                        "bucket", pa.array(ids % args.buckets))

                res = write_partitioned(
                    out.map_batches(bucket, batch_format="pyarrow"),
                    args.out, part_col="bucket")
                print(json.dumps({"cmd": "corpus-keep",
                                  "partitioned": True, **res}))
            else:
                out.write_parquet(args.out)
                print(json.dumps({"cmd": "corpus-keep", "out": args.out}))
        elif args.cmd == "asof":
            from .pipelines.analytics import events_asof

            events_asof(args.sf_dir, left_type=args.left,
                        right_type=args.right).write_parquet(args.out)
            print(json.dumps({"cmd": "asof", "out": args.out}))
        elif args.cmd == "pyramid":
            from .pipelines.tiles import tile_pyramid

            levels = tuple(int(x) for x in args.levels.split(","))
            tile_pyramid(args.sf_dir, levels=levels).write_parquet(args.out)
            print(json.dumps({"cmd": "pyramid", "out": args.out,
                              "levels": list(levels)}))
        elif args.cmd == "quantiles":
            from .pipelines.analytics import group_quantiles

            qs = tuple(float(x) for x in args.qs.split(","))
            df = group_quantiles(args.sf_dir, qs=qs)
            print(df.to_json(orient="records"))
        elif args.cmd == "sample":
            import pyarrow.parquet as _pq

            from .pipelines.sampling import sample_corpus

            srcs = _pq.read_table(f"{args.sf_dir}/documents.parquet",
                                  columns=["source"])
            rates = {s_: args.rate_bp
                     for s_ in set(srcs["source"].to_pylist())}
            sample_corpus(args.sf_dir, rates).write_parquet(args.out)
            print(json.dumps({"cmd": "sample", "out": args.out}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
