"""``ray job submit`` entrypoint for the flagship pipelines (north_rule:
"run via ray job submit on a fixed-size multi-node Ray cluster").

On a cluster::

    ray job submit --working-dir . -- \
        python -m setsketch_ray.cli near-dup \
            --input  s3://bucket/images/   \
            --output s3://bucket/dedup_out \
            --num-partitions 1024 --decode --collapse-exact \
            --cluster-strategy labelprop --join-strategy hash

Single box (sandbox / smoke test)::

    python -m setsketch_ray.cli gen-images --n 2000 --out /tmp/imgs.parquet
    python -m setsketch_ray.cli near-dup --input /tmp/imgs.parquet \
        --output /tmp/dedup_out

The job driver connects to whatever cluster ``RAY_ADDRESS`` names (``ray job
submit`` sets it inside the job; the sandbox presets ``local``).  All stage
outputs are per-partition checkpoints (``pipelines/checkpointed.py``) so
re-submitting the identical job resumes instead of recomputing; `_METRICS.json`
in the output root records per-stage wall times and row counts alongside the
per-partition manifests the checkpoint stages already write.

This module is a CLI script and therefore MAY own the Ray session (repo
convention: library code never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray():
    import ray

    if not ray.is_initialized():
        # Under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # it starts a local instance (sandbox presets RAY_ADDRESS=local).
        ray.init(include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")


def _build_cfg(args) -> "DedupConfig":
    from .pipelines.dedup import DedupConfig
    from .stages.sketch_stage import SketchConfig

    m = args.registers if args.registers > 0 else 256
    sketch = SketchConfig(family=args.family, m=m,
                          compute_registers=args.verify_ml or args.registers > 0)
    return DedupConfig(
        sketch=sketch,
        num_partitions=args.num_partitions,
        decode=args.decode,
        verify_ml=args.verify_ml,
        ml_threshold=args.ml_threshold,
        collapse_exact=args.collapse_exact,
        cluster_strategy=args.cluster_strategy,
        join_strategy=args.join_strategy,
        multimodal_support=args.multimodal_support,
    )


def cmd_near_dup(args) -> int:
    _init_ray()
    from .pipelines.checkpointed import run_checkpointed

    cfg = _build_cfg(args)
    t0 = time.time()
    clusters, edges, mapping = run_checkpointed(
        args.input, args.output, cfg,
        id_col=args.id_col, num_partitions=args.num_partitions)
    n_clusters_rows = clusters.count()
    wall = time.time() - t0
    metrics = {
        "input": args.input,
        "output": args.output,
        "wall_sec": round(wall, 3),
        "n_rows_clustered": n_clusters_rows,
        "n_dup_edges": edges.num_rows,
        "n_merged_ids": len(mapping),
        "num_partitions": args.num_partitions,
        "cluster_strategy": args.cluster_strategy,
        "resumable": True,
    }
    with open(os.path.join(args.output, "_METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))
    return 0


def cmd_gen_images(args) -> int:
    _init_ray()
    from .sources.images import images_dataset

    tmp = args.out + ".tmpdir"
    images_dataset(args.n, seed=args.seed, size=args.size,
                   parallelism=args.parallelism).write_parquet(tmp)
    os.replace(tmp, args.out)
    print(json.dumps({"out": args.out, "n": args.n, "size": args.size}))
    return 0


def cmd_validate(args) -> int:
    """Constraint report over any read_corpus-able table.  Rules arrive
    as a JSON list of rule arrays (the validate_table tuple forms), e.g.
    ``[["not_null","id"], ["range","qty",1,45], ["unique",["a","b"]],
    ["fk","id","orders","o_orderkey"]]``; ``--ref name=path`` supplies FK
    reference tables."""
    _init_ray()
    from .functions.validate import validate_table
    from .sources.readers import read_corpus

    rules = [tuple(r) for r in json.loads(
        open(args.rules).read() if os.path.exists(args.rules)
        else args.rules)]
    refs = {}
    for spec in args.ref or []:
        name, path = spec.split("=", 1)
        refs[name] = read_corpus(path)
    report = validate_table(read_corpus(args.input), rules, refs=refs)
    print(json.dumps(report.to_pylist()))
    if args.output:
        import pyarrow.parquet as pq

        pq.write_table(report, args.output)
    return 0 if min(report["ok"].to_pylist(), default=1) == 1 \
        else args.exit_code


def cmd_diff(args) -> int:
    """Keyed snapshot diff between two read_corpus-able tables; prints
    per-class counts, optionally writes the per-key (key, status) rows."""
    _init_ray()
    from .functions.diff import diff_tables
    from .sources.readers import read_corpus

    cols = args.columns.split(",")
    d = diff_tables(read_corpus(args.a), read_corpus(args.b),
                    args.key, cols, num_partitions=args.num_partitions)
    if args.output:
        d.write_parquet(args.output)
        d = __import__("ray").data.read_parquet(args.output)
    counts: dict[str, int] = {}
    for row in d.groupby("status").count().take_all():
        counts[row["status"]] = row["count()"]
    print(json.dumps(counts))
    return 0


def cmd_convert(args) -> int:
    """Corpus format conversion: any read_corpus-able source -> one of the
    shard sinks.  The shard sinks are deterministic (counter-mode key-hash
    assignment, in-shard key sort, atomic renames), so a re-run of the same
    conversion is idempotent and a crashed run leaves no torn shard."""
    _init_ray()
    from .sources.readers import read_corpus

    cols = args.columns.split(",") if args.columns else None
    ds = read_corpus(args.input, columns=cols)
    fmt = args.format
    if fmt == "parquet":
        ds.write_parquet(args.output)
        manifest = [{"shard": "parquet", "n_rows": "see files"}]
    elif fmt == "sqlite":
        from .sources.sqlite import write_sqlite_shards

        manifest = write_sqlite_shards(ds, args.output, args.key_col,
                                       num_shards=args.num_shards)
    elif fmt == "avro":
        from .sources.avro import write_avro_shards

        manifest = write_avro_shards(ds, args.output, args.key_col,
                                     num_shards=args.num_shards)
    elif fmt == "tfrecord":
        from .sources.tfrecord import write_tfrecord_shards

        manifest = write_tfrecord_shards(ds, args.output, args.key_col,
                                         num_shards=args.num_shards)
    elif fmt == "arrow":
        from .sources.arrow_ipc import write_arrow_shards

        manifest = write_arrow_shards(ds, args.output, args.key_col,
                                      num_shards=args.num_shards)
    elif fmt == "wds":
        from .sources.webdataset import write_wds_shards

        comps = {c: c for c in ds.schema().names if c != args.key_col}
        manifest = write_wds_shards(ds, args.output, args.key_col, comps,
                                    num_shards=args.num_shards)
    elif fmt == "jsonl":
        from .sources.jsonl import write_jsonl_shards

        manifest = write_jsonl_shards(ds, args.output, args.key_col,
                                      num_shards=args.num_shards)
    else:  # pragma: no cover — argparse choices guard
        raise ValueError(fmt)
    print(json.dumps(manifest, default=str))
    return 0


def cmd_stats(args) -> int:
    """Column profile (data card) over any read_corpus-able table: per
    column — rows, nulls, min/max, exact distinct + GHLL approximate
    (``functions.relational.profile_columns``)."""
    _init_ray()
    from .functions.relational import profile_columns
    from .sources.readers import read_corpus

    cols = args.columns.split(",") if args.columns else None
    ds = read_corpus(args.input, columns=cols)
    if cols is None:
        sch = ds.schema()
        import pyarrow as pa_

        cols = [n for n, t in zip(sch.names, sch.types)
                if pa_.types.is_integer(t) or pa_.types.is_string(t)]
    report = profile_columns(ds, cols)
    print(json.dumps(report.to_pylist(), default=str))
    if args.output:
        import pyarrow.parquet as pq

        pq.write_table(report, args.output)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="setsketch-ray",
        description="Ray-Data near-duplicate detection / clustering jobs")
    sub = p.add_subparsers(dest="cmd", required=True)

    nd = sub.add_parser("near-dup", help="checkpointed near-dup + clustering")
    nd.add_argument("--input", required=True,
                    help="parquet or Lance path/dir of (image_id, bytes, w, "
                         "h, fmt, caption, phash) rows")
    nd.add_argument("--output", required=True,
                    help="checkpoint + result root (clusters/, edges/, ...)")
    nd.add_argument("--id-col", default="image_id")
    nd.add_argument("--num-partitions", type=int, default=256,
                    help="checkpoint/shuffle partitions (rule: ~4x total cores)")
    nd.add_argument("--decode", action="store_true",
                    help="decode bytes + recompute phash (actor pool)")
    nd.add_argument("--collapse-exact", action="store_true",
                    help="collapse identical shingle content before LSH")
    nd.add_argument("--verify-ml", action="store_true",
                    help="SetSketch joint-ML precision gate on candidate pairs")
    nd.add_argument("--ml-threshold", type=float, default=0.5)
    nd.add_argument("--multimodal-support", type=float, default=0.05,
                    help="visual Jaccard support required for caption-driven "
                         "pairs (<=0 disables)")
    nd.add_argument("--family", default="ghll",
                    choices=["ghll", "setsketch1", "setsketch2"])
    nd.add_argument("--registers", type=int, default=256,
                    help="register count m for the cardinality sketch")
    nd.add_argument("--cluster-strategy", default="unionfind",
                    choices=["unionfind", "labelprop"])
    nd.add_argument("--join-strategy", default="broadcast",
                    choices=["broadcast", "hash"])
    nd.set_defaults(fn=cmd_near_dup)

    gi = sub.add_parser("gen-images",
                        help="deterministic synthetic image+caption table")
    gi.add_argument("--out", required=True)
    gi.add_argument("--n", type=int, default=2000)
    gi.add_argument("--seed", type=int, default=42)
    gi.add_argument("--size", type=int, default=32)
    gi.add_argument("--parallelism", type=int, default=32)
    gi.set_defaults(fn=cmd_gen_images)

    va = sub.add_parser("validate",
                        help="data-quality constraint report (exit 1 on "
                             "violations with --exit-code 1)")
    va.add_argument("--input", required=True,
                    help="table path (parquet/orc/avro/tfrecord/csv/...)")
    va.add_argument("--rules", required=True,
                    help="JSON list of rule arrays, inline or a file path")
    va.add_argument("--ref", action="append", metavar="NAME=PATH",
                    help="FK reference table (repeatable)")
    va.add_argument("--output", help="also write the report as parquet")
    va.add_argument("--exit-code", type=int, default=0,
                    help="process exit code when any rule fails")
    va.set_defaults(fn=cmd_validate)

    df = sub.add_parser("diff", help="keyed snapshot diff (added/removed/"
                                     "changed/unchanged)")
    df.add_argument("--a", required=True, help="old snapshot path")
    df.add_argument("--b", required=True, help="new snapshot path")
    df.add_argument("--key", required=True)
    df.add_argument("--columns", required=True,
                    help="comma-separated content columns to compare")
    df.add_argument("--num-partitions", type=int, default=32)
    df.add_argument("--output", help="write per-key (key, status) parquet")
    df.set_defaults(fn=cmd_diff)

    cv = sub.add_parser("convert", help="corpus format conversion "
                                        "(any source -> shard sink)")
    cv.add_argument("--input", required=True,
                    help="source path (parquet/orc/avro/tfrecord/csv/"
                         "jsonl[.gz]/tar/warc/sqlite/arrow)")
    cv.add_argument("--output", required=True, help="sink directory")
    cv.add_argument("--format", required=True,
                    choices=["parquet", "sqlite", "avro", "tfrecord",
                             "arrow", "wds", "jsonl"])
    cv.add_argument("--key-col", default="doc_id",
                    help="shard-assignment key column")
    cv.add_argument("--columns", help="comma-separated column pruning")
    cv.add_argument("--num-shards", type=int, default=16)
    cv.set_defaults(fn=cmd_convert)

    st = sub.add_parser("stats", help="column profile / data card over "
                                      "any corpus source")
    st.add_argument("--input", required=True)
    st.add_argument("--columns",
                    help="comma-separated (default: all int/string cols)")
    st.add_argument("--output", help="also write the profile as parquet")
    st.set_defaults(fn=cmd_stats)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "near-dup" and args.multimodal_support is not None \
            and args.multimodal_support <= 0:
        args.multimodal_support = None
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
