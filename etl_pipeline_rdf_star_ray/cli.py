"""Command-line interface — the reference's ``batch_cli.py`` verb set
(``batch_cli.py:328-437``: run/list/diff/query/export/archive/delete/status/
provenance) re-expressed for the lake engine.

Verbs:
  ingest    apply a change-log parquet to a lake table (one micro-batch)
  status    lake status report (commits, watermarks, partitions)
  list      commit records (manifest), newest first
  diff      snapshot diff between two lsn watermarks
  history   per-key value history of a change-log parquet
  snapshot  export a (point-in-time) snapshot to parquet
  export    lift a snapshot through the transcripts mapping → N-Triples/Quads
  query     run DuckDB SQL against a snapshot (view name: state)
  compact   rewrite each partition's active version
  vacuum    expire conversations whose latest surviving lsn < --min-lsn
  resalt    migrate late-appearing hot conversations into salted partitions
  import    parse RDF text files (nt/nq/ttl/trig) into a triples parquet
  provenance  facts + RDF-star annotations for one subject (reference
              ``batch_cli.py:290-325``)
  sparql    run a SPARQL-star subset query over a quads parquet or a lake
            snapshot (reference serving layer ``fastapi_sparql_server.py``)
  serve     HTTP SPARQL endpoint over a quads parquet or lake snapshot
            (stdlib re-expression of ``fastapi_sparql_server.py``)

Owns its Ray session (guarded ``ray.init``) — the driver-facing library
entry points never init Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_pipeline_rdf_star_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="verb", required=True)

    sp = sub.add_parser("ingest")
    sp.add_argument("changelog", help="parquet path/dir of change events")
    sp.add_argument("lake")
    sp.add_argument("--batch-id", default=None)
    sp.add_argument("--num-partitions", type=int, default=64)

    sp = sub.add_parser("status")
    sp.add_argument("lake")

    sp = sub.add_parser("list")
    sp.add_argument("lake")
    sp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser("diff")
    sp.add_argument("lake")
    sp.add_argument("lsn_a", type=int)
    sp.add_argument("lsn_b", type=int)
    sp.add_argument("--summary", action="store_true")

    sp = sub.add_parser("history")
    sp.add_argument("changelog")

    sp = sub.add_parser("snapshot")
    sp.add_argument("lake")
    sp.add_argument("out")
    sp.add_argument("--at-lsn", type=int, default=None)

    sp = sub.add_parser("export")
    sp.add_argument("lake")
    sp.add_argument("out")
    sp.add_argument("--fmt", choices=["nt", "nq", "trig"], default="nt")
    sp.add_argument("--at-lsn", type=int, default=None)

    sp = sub.add_parser("query")
    sp.add_argument("lake")
    sp.add_argument("sql", help="DuckDB SQL; snapshot registered as view 'state'")
    sp.add_argument("--at-lsn", type=int, default=None)

    sp = sub.add_parser("compact")
    sp.add_argument("lake")

    sp = sub.add_parser("vacuum")
    sp.add_argument("lake")
    sp.add_argument("--min-lsn", type=int, required=True,
                    help="retention watermark: conversations whose latest "
                         "surviving turn lsn is below this are dropped")

    sp = sub.add_parser("resalt")
    sp.add_argument("lake")
    sp.add_argument("hot_convs", nargs="+", help="conversation ids to salt")

    sp = sub.add_parser("import")
    sp.add_argument("rdf_path", help="file or dir of .nt/.nq/.ttl/.trig")
    sp.add_argument("out", help="output parquet dir of triple records")

    sp = sub.add_parser("provenance")
    sp.add_argument("lake")
    sp.add_argument("subject", help="fact subject IRI")
    sp.add_argument("--at-lsn", type=int, default=None)

    sp = sub.add_parser("sparql")
    sp.add_argument(
        "source",
        help="quads parquet file/dir, or a lake dir (snapshot is lifted "
        "through the transcripts mapping first)",
    )
    sp.add_argument("query", help="SPARQL text, or @file to read from a file")
    sp.add_argument("--json", action="store_true", dest="as_json",
                    help="print SPARQL JSON results instead of a table")
    sp.add_argument("--at-lsn", type=int, default=None)

    sp = sub.add_parser("serve")
    sp.add_argument(
        "source",
        help="quads parquet file/dir, or a lake dir (snapshot lifted first)",
    )
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=7878)
    sp.add_argument("--at-lsn", type=int, default=None)

    sp = sub.add_parser("archive")
    sp.add_argument("lake")
    sp.add_argument("batch_id")

    sp = sub.add_parser("delete")
    sp.add_argument("lake")
    sp.add_argument("batch_id")
    sp.add_argument("--hard", action="store_true")

    args = p.parse_args(argv)

    if args.verb in ("archive", "delete"):
        from .state import manifest as mf

        try:
            if args.verb == "archive":
                n = mf.archive_batch(args.lake, args.batch_id)
            else:
                n = mf.delete_batch(args.lake, args.batch_id, hard=args.hard)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(f"{args.verb}d {n} partition versions of batch {args.batch_id}")
        return 0

    if args.verb in ("status", "list"):
        # manifest-only verbs need no Ray session
        from .state import manifest as mf

        if args.verb == "status":
            from .pipelines.ops import status

            print(json.dumps(status(args.lake), indent=1))
        else:
            recs = sorted(
                mf.load_records(args.lake), key=lambda r: (r.lsn_hi, r.partition_id),
                reverse=True,
            )[: args.limit]
            for r in recs:
                print(json.dumps(r.__dict__))
        return 0

    if args.verb == "query":
        import duckdb

        from .state.lake import snapshot_files

        con = duckdb.connect()
        files = snapshot_files(args.lake, at_lsn=args.at_lsn)
        con.sql(
            "CREATE VIEW state AS SELECT * FROM read_parquet("
            + json.dumps(files)
            + ", union_by_name=true)"
        )
        print(con.sql(args.sql).df().to_string())
        return 0

    if args.verb in ("sparql", "serve"):
        import os

        if os.path.exists(os.path.join(args.source, "_meta.json")):
            _ray_up(args.num_cpus)
            from .stages.lift import lift_dataset, transcripts_spec
            from .state.lake import read_state

            quads = lift_dataset(
                read_state(args.source, at_lsn=args.at_lsn), transcripts_spec()
            )
        else:
            quads = args.source  # parquet path — DuckDB reads with pushdown

        if args.verb == "sparql":
            from .sparql import sparql_query, sparql_query_json

            qtext = args.query
            if qtext.startswith("@"):
                with open(qtext[1:]) as fh:
                    qtext = fh.read()
            if args.as_json:
                print(json.dumps(sparql_query_json(qtext, quads), indent=1))
            else:
                out = sparql_query(qtext, quads)
                if isinstance(out, bool):
                    print("true" if out else "false")
                else:
                    print(out.to_pandas().to_string())
            return 0

        # serve: parquet paths are served lazily via DuckDB pushdown; a
        # lake snapshot (Dataset) is lifted and held resident
        from .server import make_server
        from .sparql import load_quads_table

        source = quads if isinstance(quads, str) else load_quads_table(quads)
        srv = make_server(source, args.host, args.port)
        print(
            f"serving {srv.stats['total_quads']} quads on "
            f"http://{args.host}:{srv.server_address[1]}/sparql"
        )
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    _ray_up(args.num_cpus)
    import ray.data as rd

    if args.verb == "ingest":
        from .pipelines.cdc import ingest

        res = ingest(
            rd.read_parquet(args.changelog),
            args.lake,
            batch_id=args.batch_id,
            num_partitions=args.num_partitions,
        )
        print(f"committed {res.num_rows} partition versions")
    elif args.verb == "diff":
        from .pipelines.ops import diff, diff_summary

        if args.summary:
            print(json.dumps(diff_summary(args.lake, args.lsn_a, args.lsn_b)))
        else:
            for row in diff(args.lake, args.lsn_a, args.lsn_b).iter_rows():
                print(json.dumps(row))
    elif args.verb == "history":
        from .pipelines.ops import value_history

        for row in value_history(rd.read_parquet(args.changelog)).iter_rows():
            print(json.dumps(row))
    elif args.verb == "snapshot":
        from .state.lake import read_state

        read_state(args.lake, at_lsn=args.at_lsn).write_parquet(args.out)
        print(f"snapshot written to {args.out}")
    elif args.verb == "export":
        from .pipelines.export import export_to_path
        from .stages.lift import lift_dataset, transcripts_spec
        from .state.lake import read_state

        triples = lift_dataset(
            read_state(args.lake, at_lsn=args.at_lsn), transcripts_spec()
        )
        if args.fmt == "trig":
            from .pipelines.export import export_trig

            export_trig(triples, args.out)
        else:
            export_to_path(triples, args.out, fmt=args.fmt)
        print(f"exported to {args.out}")
    elif args.verb == "compact":
        from .pipelines.ops import compact

        print(f"compacted {compact(args.lake)} partitions")
    elif args.verb == "vacuum":
        from .pipelines.ops import retention

        print(json.dumps(retention(args.lake, args.min_lsn)))
    elif args.verb == "resalt":
        from .pipelines.ops import resalt

        print(json.dumps(resalt(args.lake, args.hot_convs)))
    elif args.verb == "import":
        from .sources.rdf_text import read_rdf

        ds = read_rdf(args.rdf_path)
        ds.write_parquet(args.out)
        print(f"imported RDF triples to {args.out}")
    elif args.verb == "provenance":
        from .pipelines.ops import provenance_for_subject
        from .stages.annotate import attach_static_annotations
        from .stages.lift import lift_dataset, transcripts_spec
        from .state import manifest as mf
        from .state.lake import read_state

        recs = mf.active_versions(args.lake)
        latest = max(recs.values(), key=lambda r: r.lsn_hi, default=None)
        anns = [
            {"predicate": "http://www.w3.org/ns/prov#wasDerivedFrom",
             "value": args.lake},
            {"predicate": "http://www.w3.org/ns/prov#generatedAtTime",
             "value": latest.committed_at if latest else "",
             "datatype": "http://www.w3.org/2001/XMLSchema#dateTime"},
            {"predicate": "http://example.org/batch",
             "value": latest.batch_id if latest else ""},
        ]
        triples = attach_static_annotations(
            lift_dataset(read_state(args.lake, at_lsn=args.at_lsn), transcripts_spec()),
            anns,
        )
        df = provenance_for_subject(triples, args.subject)
        print(df.to_string())

    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
