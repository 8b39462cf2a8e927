"""CLI entry points: ``python -m database_delta_plugins_ray <cmd>``.

Commands
--------
replicate  --log DIR --lake DIR [--partitions N] [--mode key_hash|repo|repo_salted]
           [--follow [--poll-interval S] [--max-polls N] [--idle-stop N]]
stop       --lake DIR        (graceful stop of a follow loop; it flushes)
gen        --out DIR [--keys N] [--events N] [--seed S] ...
vacuum     --lake DIR [--prune-below LSN] [--history-keep-from LSN]
lookup     --lake DIR --key TABLE,REPO,PATH [--key ...]
read       --lake DIR [--as-of-lsn LSN] [--limit N]   (time travel)
diff       --lake DIR --from-lsn LSN [--to-lsn LSN]   (change feed)
stats      --lake DIR
catalog    --lake DIR [--table NAME]
query      [--name QUERY] [--sf-dir DIR] [--limit N]   (omit name to list)

Owns its Ray session (scripts may init; the driver-facing module
``__ray_entry__`` never does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        # honor the environment under `ray job submit` (RAY_ADDRESS points
        # at the cluster); default to a local session otherwise.
        addr = os.environ.get("RAY_ADDRESS", "local")
        kw = dict(address=addr, include_dashboard=False,
                  ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus and addr == "local":
            kw["num_cpus"] = num_cpus  # only a local session takes a budget
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="database_delta_plugins_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("replicate")
    pr.add_argument("--log", required=True)
    pr.add_argument("--lake", required=True)
    pr.add_argument("--partitions", type=int, default=32)
    pr.add_argument("--mode", default="key_hash",
                    choices=["key_hash", "repo", "repo_salted"])
    pr.add_argument("--upto-lsn", type=int, default=None)
    pr.add_argument("--exchange", default="sort",
                    choices=["sort", "fragment"],
                    help="sort = Ray Data groupby shuffle; fragment = "
                         "hash-partitioned fragment write (no sort barrier)")
    pr.add_argument("--primary-key", default="repo,path",
                    help="comma-separated PK columns")
    pr.add_argument("--snapshot-restart", default="continue",
                    choices=["continue", "wipe"],
                    help="mid-snapshot resume policy: continue off the "
                         "partition fences (native) or wipe-and-restart "
                         "the snapshot like the reference")
    pr.add_argument("--toast-columns", default=None,
                    help="comma-separated payload columns that may carry "
                         "Debezium's TOAST placeholder "
                         "(__debezium_unavailable_value); enables "
                         "postgres carry-forward semantics")
    pr.add_argument("--source-arg", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="pass-through connector property (Debezium "
                         "convention), repeatable: e.g. "
                         "binary.handling.mode=hex, "
                         "decimal.handling.mode=double, "
                         "time.precision.mode=connect; unknown keys "
                         "forward silently like the reference")
    pr.add_argument("--transform", action="append", default=[],
                    metavar="COL=OP",
                    help="apply-time column transform (Debezium-SMT "
                         "analog), repeatable: OP is upper, lower, mask, "
                         "mask_email, sha256 or truncate:N; applied to "
                         "after-images before content_sha derives")
    pr.add_argument("--history", action="store_true",
                    help="retain superseded versions + delete tombstones "
                         "(the change-data-feed prerequisite for "
                         "--refresh-index / --refresh-vecindex, time "
                         "travel and lake_diff)")
    pr.add_argument("--follow", action="store_true",
                    help="continuous tail: poll the log dir until stopped "
                         "(SIGINT/SIGTERM or the `stop` command); each "
                         "stop flushes pending events before exit")
    pr.add_argument("--jsonl", default=None,
                    help="(follow) tail a growing Debezium JSONL feed dir: "
                         "each poll first converts new/grown .jsonl files "
                         "into --log (which tail mode owns) before "
                         "draining it into the lake")
    pr.add_argument("--poll-interval", type=float, default=1.0)
    pr.add_argument("--max-polls", type=int, default=None)
    pr.add_argument("--idle-stop", type=int, default=None,
                    help="stop after N consecutive caught-up polls")
    pr.add_argument("--refresh-vecindex", default=None,
                    help="(follow) vector-index dir to refresh after every "
                         "committing poll (built with 'vecindex build')")
    pr.add_argument("--refresh-index", default=None,
                    help="(follow) text-index dir to refresh after every "
                         "applying poll — derived search stays current "
                         "with the lake")
    pr.add_argument("--index-compact-overlay", type=int, default=100_000,
                    help="(follow, with --refresh-index) auto-compact the "
                         "text index once its live-docs overlay exceeds "
                         "this many changed docs (the segment-merge "
                         "trigger); 0 disables")
    pr.add_argument("--maintain-view", default=None,
                    help="(follow) IVM view dir to increment after every "
                         "applying poll (requires --maintain-view-log "
                         "defaulting to --log)")
    pr.add_argument("--refresh-tokens", default=None,
                    help="(follow) keep a packed-token export current: "
                         "refresh_packed_tokens(LAKE, DIR) after each "
                         "poll that applied events — only buckets the "
                         "change feed touched re-encode, with the "
                         "pack's own frozen tokenizer (requires "
                         "--history; build the pack first with "
                         "`export --mode tokens`)")
    pr.add_argument("--export-incremental", default=None,
                    help="(follow) materialized-export dir kept current "
                         "after every applying poll: only the shards the "
                         "change feed touched rewrite (requires "
                         "--history)")
    pr.add_argument("--export-shards", type=int, default=16,
                    help="shard count for --export-incremental "
                         "(first call fixes it; later calls must match)")
    pr.add_argument("--relay-out", default=None,
                    help="(follow) Debezium JSONL feed dir kept current "
                         "after every applying poll: first poll publishes "
                         "a snapshot, later polls relay the change feed "
                         "(requires --history)")

    pstop = sub.add_parser(
        "stop", help="gracefully stop a follow loop on this lake")
    pstop.add_argument("--lake", required=True)

    pboot = sub.add_parser(
        "bootstrap", help="snapshot an EXISTING parquet table of the "
                          "governed shape (repo,path,commit,lang,content"
                          "[,stars]) into log segments — the "
                          "replicateExistingData path; replicate them, "
                          "then tail the live feed into the same lake")
    pboot.add_argument("--table-parquet", required=True,
                       help="parquet file or directory to snapshot")
    pboot.add_argument("--segments", required=True,
                       help="fresh directory for the snapshot segments")
    pboot.add_argument("--table", default=None,
                       help="qualified target table name "
                            "(default inventory.code_files)")

    pg = sub.add_parser("gen")
    pg.add_argument("--out", required=True)
    pg.add_argument("--keys", type=int, default=2000)
    pg.add_argument("--events", type=int, default=10000)
    pg.add_argument("--repos", type=int, default=24)
    pg.add_argument("--tables", type=int, default=1)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--segments", type=int, default=8)
    pg.add_argument("--no-snapshot", action="store_true")
    pg.add_argument("--no-ddl", action="store_true")

    po = sub.add_parser(
        "optimize", help="clustered rewrite: fold each partition's "
                         "base+delta files into one file sorted by "
                         "--cluster-by for footer-stat pruning")
    po.add_argument("--lake", required=True)
    po.add_argument("--cluster-by", default=None,
                    help="comma-separated sort columns (default: the "
                         "lake's key columns)")
    po.add_argument("--row-group-size", type=int, default=None)
    po.add_argument("--zorder", action="store_true",
                    help="bit-interleaved multi-dim clustering instead of "
                         "lexicographic sort (prunes on every cluster-by "
                         "column, not just the leading one)")

    prs = sub.add_parser(
        "reshard", help="re-partition a committed lake P -> P' into a new "
                        "directory (cluster resize); replication continues "
                        "on the new layout from the carried watermark")
    prs.add_argument("--lake", required=True)
    prs.add_argument("--dest", required=True)
    prs.add_argument("--partitions", type=int, required=True)

    pv = sub.add_parser("vacuum")
    pv.add_argument("--lake", required=True)
    pv.add_argument("--prune-below", type=int, default=None)
    pv.add_argument("--history-keep-from", type=int, default=None,
                    help="also prune retained time-travel versions with "
                         "last_lsn below this horizon (history lakes)")

    plk = sub.add_parser(
        "lookup", help="point lookup of live rows by primary key "
                       "(reads only the routed partitions)")
    plk.add_argument("--lake", required=True)
    plk.add_argument("--key", action="append", required=True,
                     help="comma-separated key tuple in the lake's "
                          "key-column order, e.g. "
                          "inventory.code_files,repo-0001,src/a.rs "
                          "(repeatable)")

    prd = sub.add_parser(
        "read", help="read the live lake state, optionally AS OF an "
                     "earlier commit boundary (history lakes)")
    prd.add_argument("--lake", required=True)
    prd.add_argument("--as-of-lsn", type=int, default=None)
    prd.add_argument("--limit", type=int, default=20)

    pdf = sub.add_parser(
        "diff", help="change data feed between two retained versions "
                     "(c/u/d rows; history lakes)")
    pdf.add_argument("--lake", required=True)
    pdf.add_argument("--from-lsn", type=int, required=True)
    pdf.add_argument("--to-lsn", type=int, default=None)
    pdf.add_argument("--limit", type=int, default=20)

    pvw = sub.add_parser(
        "view", help="incrementally maintain the per-repo aggregate view "
                     "from the change log (pipelines/ivm.py)")
    pvw.add_argument("--log", required=True)
    pvw.add_argument("--view", required=True)
    pvw.add_argument("--partitions", type=int, default=16)
    pvw.add_argument("--upto-lsn", type=int, default=None)

    pix = sub.add_parser(
        "index", help="full-text index over the lake's content: build at "
                      "the current watermark, refresh from the change "
                      "feed (history lakes), compact refresh generations "
                      "into a fresh base, or search terms")
    pix.add_argument("action",
                     choices=["build", "refresh", "compact", "search"])
    pix.add_argument("--lake", required=True)
    pix.add_argument("--index", required=True, help="index directory")
    pix.add_argument("--terms", default=None,
                     help="comma-separated terms (search)")
    pix.add_argument("--mode", choices=["and", "or"], default="and")
    pix.add_argument("--bm25", action="store_true",
                     help="BM25 ranking instead of tf sums")
    pix.add_argument("--limit", type=int, default=20)

    prl = sub.add_parser(
        "relay", help="publish the lake as a Debezium JSONL feed (the "
                      "CDC outbox): 'snapshot' emits DDL prefix + op='r' "
                      "row envelopes at a watermark; 'changes' emits the "
                      "c/u/d change feed between two retained versions")
    prl.add_argument("action", choices=["snapshot", "changes", "continue"])
    prl.add_argument("--lake", required=True)
    prl.add_argument("--out", required=True, help="feed directory")
    prl.add_argument("--as-of", type=int, default=None,
                     help="snapshot watermark (default: current)")
    prl.add_argument("--positions", choices=["preserve", "shared"],
                     default="preserve",
                     help="snapshot positions: true per-row winning "
                          "positions, or the ONE shared snapshot offset "
                          "(reference semantics)")
    prl.add_argument("--tombstones", action="store_true",
                     help="tombstones.on.delete: follow each delete "
                          "envelope with a null-payload record (log-"
                          "compaction convention; consumers discard them)")
    prl.add_argument("--dialect", default=None,
                     choices=["native", "mysql", "sqlserver", "postgres",
                              "mongo", "oracle"],
                     help="source-position shape on the wire (the five "
                          "public Debezium families, through the same "
                          "offset bridges the reader uses); 'continue' "
                          "inherits the feed's established dialect when "
                          "omitted")
    prl.add_argument("--from-lsn", type=int, default=None,
                     help="change feed start version (changes)")
    prl.add_argument("--to-lsn", type=int, default=None,
                     help="change feed end version (default: current)")

    pvx = sub.add_parser(
        "vecindex", help="vector index over the lake's content "
                         "embeddings: build at the current watermark, "
                         "refresh from the change feed (history lakes), "
                         "compact delta generations, or cosine-search")
    pvx.add_argument("action",
                     choices=["build", "refresh", "compact", "search"])
    pvx.add_argument("--lake", required=True)
    pvx.add_argument("--index", required=True, help="index directory")
    pvx.add_argument("--clusters", type=int, default=16)
    pvx.add_argument("--nprobe", type=int, default=8)
    pvx.add_argument("--text", default=None,
                     help="probe text to embed (search)")
    pvx.add_argument("--limit", type=int, default=10)

    pex = sub.add_parser(
        "export", help="materialize the lake's live rows: incremental "
                       "hash-sharded parquet (maintained by the change "
                       "feed) or a globally-sorted range layout")
    pex.add_argument("--lake", required=True)
    pex.add_argument("--out", required=True)
    pex.add_argument("--mode", choices=["incremental", "sorted", "tokens"],
                     default="incremental")
    pex.add_argument("--shards", type=int, default=16)
    pex.add_argument("--order-by", default="_sequence_num",
                     help="(sorted) order column — numeric/timestamp "
                          "(string keys have no range layout)")
    pex.add_argument("--seq-tokens", type=int, default=2048,
                     help="(tokens) training sequence length")
    pex.add_argument("--bpe-merges", type=int, default=200,
                     help="(tokens) BPE merges to train on the lake")
    pex.add_argument("--tokenizer", choices=["bpe", "unigram"],
                     default="bpe",
                     help="(tokens) subword family: greedy-merge BPE or "
                          "the unigram-LM (SentencePiece-style) trainer")
    pex.add_argument("--unigram-vocab", type=int, default=256,
                     help="(tokens) unigram piece-vocabulary size")

    pan = sub.add_parser(
        "analyze", help="collect per-column table statistics (rows, "
                        "nulls, min/max, HLL ndv) into "
                        "_checkpoints/table_stats.json")
    pan.add_argument("--lake", required=True)
    pan.add_argument("--columns", required=True,
                     help="comma-separated column list")

    pck = sub.add_parser(
        "check", help="fsck the lake: manifests/files/watermark/routing "
                      "integrity (read-only)")
    pck.add_argument("--lake", required=True)
    pck.add_argument("--signature", action="store_true",
                     help="also compute the layout-independent content "
                          "signature (anti-entropy replica comparison)")

    ps = sub.add_parser("stats")
    ps.add_argument("--lake", required=True)

    pc = sub.add_parser("catalog")
    pc.add_argument("--lake", required=True)
    pc.add_argument("--table", default=None)

    pq_ = sub.add_parser(
        "query", help="run a named pipeline from the query catalog")
    pq_.add_argument("--name", default=None,
                     help="query name (omit to list all)")
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq_.add_argument("--limit", type=int, default=20,
                     help="rows to print (full result is still computed)")
    pq_.add_argument("--stats", action="store_true",
                     help="also print ray.data execution stats (per-stage "
                          "wall/cpu times, block sizes) for tuning")

    a = p.parse_args(argv)

    if a.cmd == "replicate" and a.follow:
        # these hooks walk lake_diff over RETAINED versions; on a
        # non-history lake deletes leave no old-version trace, so the
        # export/index would silently diverge — fail before ray.init
        # (the help text already says "requires --history")
        for flag, val in (("--refresh-index", a.refresh_index),
                          ("--refresh-vecindex", a.refresh_vecindex),
                          ("--export-incremental", a.export_incremental),
                          ("--refresh-tokens", a.refresh_tokens),
                          ("--relay-out", a.relay_out)):
            if val and not a.history:
                p.error(f"{flag} requires --history (the change feed "
                        "needs retained versions to surface deletes)")
        if a.refresh_tokens:
            # the hook refreshes an EXISTING pack; with no pack yet the
            # first post-commit firing would FileNotFoundError on
            # manifest.json and kill the follow loop mid-stream — fail
            # at argument time instead (run `export --mode tokens`
            # first to create the pack)
            man_p = os.path.join(a.refresh_tokens, "manifest.json")
            if not os.path.exists(man_p):
                p.error(f"--refresh-tokens {a.refresh_tokens}: no "
                        "manifest.json — export a token pack first "
                        "(export --mode tokens)")
            try:
                with open(man_p) as fh:
                    tag = json.load(fh).get("source_tag", "")
            except (OSError, ValueError):
                tag = ""
            if not tag.startswith("lake@"):
                p.error(f"--refresh-tokens {a.refresh_tokens}: pack is "
                        f"not lake-tagged (source_tag={tag!r}); only "
                        "packs exported from a lake can refresh")

    if a.cmd == "gen":
        from .sources.gen import GenConfig, generate_log

        meta = generate_log(a.out, GenConfig(
            n_keys=a.keys, n_events=a.events, n_repos=a.repos,
            n_tables=a.tables, seed=a.seed, n_segments=a.segments,
            snapshot=not a.no_snapshot, ddl_plan=not a.no_ddl,
        ))
        print(json.dumps({k: v for k, v in meta.items() if k != "config"}))
        return 0

    if a.cmd == "replicate":
        _ray_init(a.num_cpus)
        kw = dict(num_partitions=a.partitions, partition_mode=a.mode,
                  upto_lsn=a.upto_lsn, exchange=a.exchange,
                  primary_key=tuple(a.primary_key.split(",")),
                  snapshot_restart=a.snapshot_restart,
                  history=a.history)
        if a.toast_columns:
            kw["toast_columns"] = tuple(a.toast_columns.split(","))
        if a.transform:
            tf = {}
            for spec in a.transform:
                col, _, op = spec.partition("=")
                if not op:
                    raise SystemExit(f"--transform wants COL=OP: {spec!r}")
                tf[col] = op
            kw["transforms"] = tf
        if a.source_arg:
            ca = {}
            for spec in a.source_arg:
                k, _, v = spec.partition("=")
                if not v:
                    raise SystemExit(
                        f"--source-arg wants KEY=VALUE: {spec!r}")
                ca[k] = v
            # fail fast on known-key bogus values before ray starts
            from .sources.source import apply_connector_args
            from .state.ddl import Registry

            try:
                apply_connector_args(Registry(), ca)
            except ValueError as e:
                raise SystemExit(f"--source-arg: {e}")
            kw["connector_args"] = ca
        if a.follow:
            import signal
            import threading

            from .pipelines.replicate import follow_replication

            ev = threading.Event()

            def _graceful(_sig, _frm):
                ev.set()  # loop flushes pending events, then exits

            signal.signal(signal.SIGINT, _graceful)
            signal.signal(signal.SIGTERM, _graceful)
            hooks = []
            if a.refresh_index:
                from .stages.invindex import refresh_lake_index

                limit = a.index_compact_overlay or None
                hooks.append(
                    lambda lk: refresh_lake_index(
                        a.refresh_index, lk,
                        compact_overlay_limit=limit))
            if a.refresh_vecindex:
                from .pipelines.queries import lake_vector_index_refresh

                hooks.append(
                    lambda lk: lake_vector_index_refresh(
                        lk, a.refresh_vecindex))
            if a.maintain_view:
                from .pipelines.ivm import maintain_view

                hooks.append(
                    lambda _lk: maintain_view(a.log, a.maintain_view))
            if a.export_incremental:
                from .stages.export import export_lake_incremental

                hooks.append(
                    lambda lk: export_lake_incremental(
                        lk, a.export_incremental,
                        nshards=a.export_shards))
            if a.refresh_tokens:
                from .stages.tokexport import refresh_packed_tokens

                hooks.append(
                    lambda lk: refresh_packed_tokens(
                        lk, a.refresh_tokens,
                        key_cols=("repo", "path"), text_col="content"))
            if a.relay_out:
                from .stages.relay import relay_continue

                hooks.append(lambda lk: relay_continue(lk, a.relay_out))
            pre = None
            if a.jsonl:
                from .sources.debezium_json import tail_jsonl_segments

                pre = lambda: tail_jsonl_segments(a.jsonl, a.log)  # noqa: E731
            s = follow_replication(
                a.log, a.lake, poll_interval_s=a.poll_interval,
                max_polls=a.max_polls, idle_polls_to_stop=a.idle_stop,
                stop_event=ev, pre_poll=pre,
                post_commit=hooks or None, **kw)
        else:
            from .pipelines.replicate import run_replication

            s = run_replication(a.log, a.lake, **kw)
        print(json.dumps(s))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "stop":
        from .pipelines.replicate import request_stop

        request_stop(a.lake)
        print(json.dumps({"stop_requested": a.lake}))
        return 0

    if a.cmd == "bootstrap":
        _ray_init(a.num_cpus)
        from .sources.bootstrap import bootstrap_snapshot_segments

        kw = {"table": a.table} if a.table else {}
        print(json.dumps(bootstrap_snapshot_segments(
            a.table_parquet, a.segments, **kw), default=str))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "view":
        _ray_init(a.num_cpus)
        from .pipelines.ivm import maintain_view

        print(json.dumps(maintain_view(
            a.log, a.view, num_partitions=a.partitions,
            upto_lsn=a.upto_lsn)))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "optimize":
        _ray_init(a.num_cpus)
        from .pipelines.maintenance import optimize_lake

        cols = a.cluster_by.split(",") if a.cluster_by else None
        print(json.dumps(optimize_lake(
            a.lake, cluster_by=cols, row_group_size=a.row_group_size,
            zorder=a.zorder)))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "reshard":
        _ray_init(a.num_cpus)
        from .pipelines.maintenance import reshard_lake

        print(json.dumps(reshard_lake(a.lake, a.dest, a.partitions)))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "vacuum":
        _ray_init(a.num_cpus)
        from .pipelines.maintenance import vacuum_history, vacuum_lake

        out = vacuum_lake(a.lake, a.prune_below)
        if a.history_keep_from is not None:
            out["history"] = vacuum_history(a.lake, a.history_keep_from)
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "lookup":
        _ray_init(a.num_cpus)
        from .pipelines.replicate import lookup_keys

        keys = [tuple(k.split(",")) for k in a.key]
        t = lookup_keys(a.lake, keys)
        print(json.dumps({"rows": t.num_rows,
                          "result": t.to_pylist()}, default=str))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "diff":
        _ray_init(a.num_cpus)
        from .pipelines.replicate import lake_diff

        ds = lake_diff(a.lake, a.from_lsn, a.to_lsn)
        n = ds.count()
        head = ds.limit(a.limit).take_all()
        print(json.dumps({"rows": n, "from_lsn": a.from_lsn,
                          "to_lsn": a.to_lsn, "head": head}, default=str))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "read":
        _ray_init(a.num_cpus)
        from .pipelines.replicate import final_state

        ds = final_state(a.lake, as_of_lsn=a.as_of_lsn)
        n = ds.count()
        head = ds.limit(a.limit).take_all()
        print(json.dumps({"rows": n, "as_of_lsn": a.as_of_lsn,
                          "head": head}, default=str))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "index":
        _ray_init(a.num_cpus)
        from .stages.invindex import LakeTextIndex

        if a.action == "build":
            idx = LakeTextIndex.build(a.lake, a.index)
            print(json.dumps(idx.meta))
        elif a.action == "refresh":
            print(json.dumps(LakeTextIndex(a.index).refresh(a.lake)))
        elif a.action == "compact":
            print(json.dumps(LakeTextIndex(a.index).compact()))
        else:
            if not a.terms:
                raise SystemExit("search needs --terms")
            idx = LakeTextIndex(a.index)
            terms = a.terms.split(",")
            ds = (idx.lookup_bm25(terms, mode=a.mode, k=a.limit) if a.bm25
                  else idx.lookup(terms, mode=a.mode, k=a.limit))
            for r in ds.take(a.limit):
                print(json.dumps(r))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "relay":
        _ray_init(a.num_cpus)
        from .stages.relay import relay_changes_jsonl, relay_snapshot_jsonl

        if a.action == "snapshot":
            print(json.dumps(relay_snapshot_jsonl(
                a.lake, a.out, as_of_lsn=a.as_of, positions=a.positions,
                dialect=a.dialect or "native")))
        elif a.action == "continue":
            from .stages.relay import relay_continue

            print(json.dumps(relay_continue(
                a.lake, a.out, positions=a.positions, dialect=a.dialect)))
        else:
            if a.from_lsn is None:
                raise SystemExit("changes needs --from-lsn")
            print(json.dumps(relay_changes_jsonl(
                a.lake, a.out, a.from_lsn, to_lsn=a.to_lsn,
                dialect=a.dialect or "native",
                tombstones=a.tombstones)))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "vecindex":
        _ray_init(a.num_cpus)
        from .pipelines.queries import (
            _content_vecs,
            lake_vector_index_build,
            lake_vector_index_refresh,
        )
        from .stages.similarity import IVFDiskIndex

        if a.action == "build":
            print(json.dumps(lake_vector_index_build(
                a.lake, a.index, n_clusters=a.clusters)))
        elif a.action == "refresh":
            print(json.dumps(lake_vector_index_refresh(a.lake, a.index)))
        elif a.action == "compact":
            print(json.dumps(IVFDiskIndex(a.index).compact()))
        else:
            if not a.text:
                raise SystemExit("search needs --text")
            q = _content_vecs([a.text])[0]
            df = IVFDiskIndex(a.index).search(q, k=a.limit,
                                              nprobe=a.nprobe)
            for r in df.to_dict("records"):
                print(json.dumps(r))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "export":
        _ray_init(a.num_cpus)
        if a.mode == "incremental":
            from .stages.export import export_lake_incremental

            print(json.dumps(export_lake_incremental(
                a.lake, a.out, nshards=a.shards), default=str))
        elif a.mode == "tokens":
            # lake live rows -> trained BPE -> packed uint32 token shards
            # (training-ready binary corpus; stages/tokexport.py layout)
            from .pipelines.replicate import final_state
            from .stages.bpe import train_bpe, word_histogram
            from .stages.tokexport import (
                build_token_vocab,
                export_packed_tokens,
            )
            from .state import checkpoint as ckpt

            # three consumers follow (histogram, count pass, write pass) —
            # pay the lake replay/scan ONCE and serve them from blocks
            ds = final_state(
                a.lake, columns=["repo", "path", "content"]).materialize()
            hist = word_histogram(ds, text_col="content")
            if a.tokenizer == "unigram":
                from .stages.tokexport import build_token_vocab_spec
                from .stages.unigram import train_unigram

                uni = train_unigram(ds, text_col="content",
                                    vocab_size=a.unigram_vocab)
                spec = ("unigram", uni)
                merges, vocab = None, build_token_vocab_spec(hist, spec)
            else:
                spec = None
                merges = train_bpe(hist, num_merges=a.bpe_merges)
                vocab = build_token_vocab(hist, merges)
            tag = f"lake@{ckpt.read_global_watermark(a.lake)}"
            m = export_packed_tokens(
                ds, a.out, merges, vocab, seq_tokens=a.seq_tokens,
                nbuckets=a.shards, key_cols=("repo", "path"),
                text_col="content", source_tag=tag, tokenizer=spec)
            print(json.dumps(m, default=str))
        else:
            from .pipelines.replicate import final_state
            from .stages.export import export_sorted

            print(json.dumps(export_sorted(
                final_state(a.lake), a.out, order_col=a.order_by,
                nbuckets=a.shards), default=str))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "analyze":
        _ray_init(a.num_cpus)
        from .pipelines.maintenance import analyze_lake

        print(json.dumps(analyze_lake(a.lake, a.columns.split(",")),
                         default=str))
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "check":
        from .pipelines.maintenance import check_lake

        out = check_lake(a.lake)
        if a.signature:
            _ray_init(a.num_cpus)
            from .pipelines.maintenance import lake_signature

            out["signature"] = lake_signature(a.lake)
            import ray

            ray.shutdown()
        print(json.dumps(out))
        return 0 if out["ok"] else 1

    if a.cmd == "stats":
        from .pipelines.maintenance import lake_stats

        print(json.dumps(lake_stats(a.lake)))
        return 0

    if a.cmd == "query":
        from .pipelines.queries import CDC_QUERIES

        qs = dict(CDC_QUERIES)
        try:
            from .pipelines.analytics import ANALYTICS_QUERIES

            qs.update(ANALYTICS_QUERIES)
        except ImportError:
            pass
        if not a.name:
            print(json.dumps({"queries": sorted(qs)}))
            return 0
        if a.name not in qs:
            print(json.dumps({"error": f"unknown query {a.name!r}",
                              "queries": sorted(qs)}))
            return 1
        _ray_init(a.num_cpus)
        res = qs[a.name](a.sf_dir)
        stats = None
        if hasattr(res, "to_pandas"):
            if a.stats:
                res = res.materialize()
                stats = res.stats()
            res = res.to_pandas()
        elif a.stats:
            stats = (f"(no per-stage stats: {a.name} folds its result on "
                     "the driver and returns a materialized DataFrame)")
        print(json.dumps({
            "query": a.name,
            "rows": len(res),
            "columns": list(res.columns),
            "head": json.loads(
                res.head(a.limit).to_json(orient="records",
                                          date_format="iso")),
        }))
        if stats:
            print(stats)
        import ray

        ray.shutdown()
        return 0

    if a.cmd == "catalog":
        from .sources.registry import LakeCatalog

        cat = LakeCatalog(a.lake)
        if a.table:
            d = cat.describe_table(a.table)
            print(json.dumps({
                "table": d.table, "primary_key": d.primary_key,
                "schema_version": d.schema_version,
                "columns": [[c.name, c.type_name, c.nullable] for c in d.columns],
                "live_rows": d.live_rows, "total_rows": d.total_rows,
                "partitions": d.partitions,
            }))
        else:
            print(json.dumps({"tables": cat.list_tables()}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
