"""spark-submit entry point (north rule: ships as ``spark-submit
--py-files`` modules).

    spark-submit --py-files b2t_spark.zip -m ... OR
    spark-submit cli.py synth   --out /data/transcripts --n-conv 100000
    spark-submit cli.py encode  --input /data/transcripts --out /data/encoded
    spark-submit cli.py decode  --input /data/encoded --out /data/roundtrip
    spark-submit cli.py verify  --input /data/transcripts --encoded /data/encoded

Mirrors the reference CLI shape (``bids2table -c mriqc ...``,
``bids2table/__main__.py:34-96``): compose a plan, optionally print it
(--print-only = EXPLAIN), execute.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    # allow_abbrev=False: explicit-flag detection below re-tokenizes argv, so
    # an abbreviated flag (--group for --group-rows) would parse but register
    # under the wrong name and let the config file override the user's value
    p = argparse.ArgumentParser(prog="bids2table_spark", allow_abbrev=False)
    p.add_argument(
        "command",
        choices=["synth", "encode", "decode", "verify", "vacuum", "compact",
                 "snapshots"],
    )
    p.add_argument("--input", help="input table: parquet path or iceberg name")
    p.add_argument("--out", default=None)
    p.add_argument("--encoded", help="encoded dir (verify)")
    p.add_argument("--n-conv", type=int, default=10_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--block-rows", type=int, default=65_536)
    p.add_argument("--group-rows", type=int, default=262_144)
    p.add_argument(
        "--group-bytes", default=None,
        help="byte bound on encode group size ('64 MiB', '1GB', or bytes); "
        "fat-row partitions get more, smaller groups (reference writer "
        "parity: byte-sized flush partitions)",
    )
    p.add_argument("--sample-fraction", type=float, default=0.05)
    p.add_argument("--run-id", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--on-new-columns", choices=["error", "allow", "backfill"], default="error",
        help="resume behavior when the input grew columns vs the committed "
        "ledger: error (default), allow (new groups wide, old null-filled "
        "at decode), backfill (re-encode stale groups under this run_id)",
    )
    p.add_argument(
        "--as-of", default=None,
        help="decode: read the table as of this run_id or commit timestamp "
        "(see the snapshots command); expired snapshots fail loudly",
    )
    p.add_argument(
        "--min-fill", type=float, default=0.5,
        help="compact: groups under min_fill*group_rows rows are victims",
    )
    p.add_argument("--print-only", action="store_true", help="print the plan and exit")
    p.add_argument(
        "--config",
        help="JSON config file composing the job (reference parity: "
        "bids2table -c <cfg> ... composes the whole plan from config, "
        "bids2table/__main__.py:34-96). Keys mirror the CLI flags "
        "(input, out, block_rows, group_rows, group_bytes, "
        "sample_fraction, run_id, resume) plus 'codecs': "
        "{column-or-pt/column: codec} overriding "
        "the auto-selector per column.",
    )
    args = p.parse_args(argv)

    cfg: dict = {}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
        for key in ("input", "out", "run_id"):
            if getattr(args, key, None) in (None, "") and key in cfg:
                setattr(args, key, cfg[key])
        # config fills only flags the user did NOT set explicitly (same
        # precedence as input/out/run_id above) — an explicit --group-rows
        # must win over the config file, not the other way round
        explicit = set()
        for tok in argv if argv is not None else sys.argv[1:]:
            if tok.startswith("--"):
                explicit.add(tok[2:].split("=", 1)[0].replace("-", "_"))
        for key, conv in (("block_rows", int), ("group_rows", int),
                          ("group_bytes", str), ("sample_fraction", float)):
            if key in cfg and key not in explicit:
                setattr(args, key, conv(cfg[key]))
        if cfg.get("resume") is False:
            args.no_resume = True
    if not args.out and not (
        args.command == "verify" and args.encoded
    ) and not (args.command in ("vacuum", "compact", "snapshots") and args.input):
        p.error("--out is required (flag or config file)")

    from bids2table_spark import (
        decode_job,
        encode_job,
        get_spark,
        plan_from_stats,
        synth_transcripts,
    )
    from bids2table_spark.plans import codec_plan_str
    from bids2table_spark.sources import read_table

    spark = get_spark(app=f"b2t-{args.command}")

    if args.command == "synth":
        df = synth_transcripts(spark, n_conv=args.n_conv, seed=args.seed)
        if args.print_only:
            df.explain("formatted")
            return 0
        df.write.mode("overwrite").partitionBy("pt").parquet(args.out)
        print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
        return 0

    if args.command == "encode":
        df = read_table(spark, args.input)
        plan = plan_from_stats(df, fraction=args.sample_fraction)
        # config pins win over the selector; a bare-column pin must also
        # evict the selector's pt-scoped entries (those win at lookup time)
        for col, codec in (cfg.get("codecs") or {}).items():
            if "/" not in col:
                for pk in [k for k in plan if k.endswith(f"/{col}")]:
                    del plan[pk]
            plan[col] = codec
        if args.print_only:
            print(codec_plan_str(plan))
            df.explain("formatted")
            return 0
        summary = encode_job(
            spark, df, args.out,
            run_id=args.run_id, plan=plan,
            block_rows=args.block_rows, target_group_rows=args.group_rows,
            target_group_bytes=args.group_bytes,
            resume=not args.no_resume,
            on_new_columns=args.on_new_columns,
        )
        print(json.dumps(summary))
        return 0

    if args.command == "vacuum":
        from bids2table_spark import vacuum_job

        target = args.input or args.out
        print(json.dumps(vacuum_job(spark, target)))
        return 0

    if args.command == "compact":
        from bids2table_spark import compact_job

        target = args.input or args.out
        print(json.dumps(compact_job(
            spark, target, target_group_rows=args.group_rows,
            min_fill=args.min_fill, block_rows=args.block_rows,
            run_id=args.run_id,
        )))
        return 0

    if args.command == "snapshots":
        from bids2table_spark import snapshots

        target = args.input or args.out
        for r in snapshots(spark, target).collect():
            print(json.dumps({
                "run_id": r["run_id"],
                "committed_at": str(r["committed_at"]),
                "groups_committed": r["groups_committed"],
                "groups_failed": r["groups_failed"],
                "n_rows": r["n_rows"],
                "enc_bytes": r["enc_bytes"],
            }))
        return 0

    if args.command == "decode":
        out = decode_job(spark, args.input, as_of=args.as_of)
        if args.print_only:
            out.explain("formatted")
            return 0
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
        return 0

    # verify: decoded(encoded) must equal input exactly under the key sort
    df = read_table(spark, args.input).drop("grp")
    dec = decode_job(spark, args.encoded or args.out)
    cols = df.columns
    a = df.select(cols).exceptAll(dec.select(cols))
    b = dec.select(cols).exceptAll(df.select(cols))
    bad = a.count() + b.count()
    print(json.dumps({"mismatched_rows": bad, "ok": bad == 0}))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
