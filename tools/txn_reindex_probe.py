"""E2E file-skipping evidence for the CLI txn pipeline (VERDICT r6
tasks 3+4): bootstrap a many-file clustered records table through
``cli ingest --fmt txn``, seed sinks with a full reindex, then apply
narrow incremental batches and run the cron-tick reindex — recording,
from the CLI's own output JSON, the three probes:

- ``ingest.probe``          — records MERGE during incremental ingest
- ``probes.watermark_scan`` — the ``updated >= since`` read
- ``probes.writeback_merge``— the mark_processed writeback MERGE
- ``probes.metrics_merge``  — the metrics-table upsert MERGE
- ``feed``                  — the CHANGE-DATA-FEED consumers
  (``outbox --fmt txn --incremental``, round 8; ``sitemap --action
  auto --fmt txn --incremental``, round 9; ``sitemap --action
  cleanup --fmt txn --incremental``, round 10 — the last rescanning
  consumer now feed-driven): files_read is the union of just the
  delta commits' touched files, never the table

Done-criterion: candidate_files << live_files on every probe (the
reference's hottest query, run.py:147-151, and its metrics upsert,
adsmp/app.py:45-77, both file-skipped), and files_read << live_files
on every incremental feed step (the reference's change_log audit
table, adsmp/models.py:127-141, served from the txn log instead).

Usage: python tools/txn_reindex_probe.py [--json OUT.json]
         [--rows N] [--batches K] [--batch B]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def _write_events(d: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "b.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _full_record_events(bibs: list[str], day: int) -> list[dict]:
    rows = []
    for i, b in enumerate(bibs):
        ts = f"2024-01-{day:02d}T00:00:{i % 60:02d}.000Z"
        for t, p in (
                ("bib_data", {"bibcode": b, "title": [f"T {b}"]}),
                ("orcid_claims", {"verified": ["0000-1"]}),
                ("nonbib_data", {"boost": 0.2}),
                ("metrics", {"citation_num": i % 7,
                             "citations": [f"C{b}"]})):
            rows.append({"bibcode": b, "type": t, "status": "active",
                         "payload": json.dumps(p), "event_ts": ts})
    return rows


def _touch_events(bibs: list[str], day: int, tag: str) -> list[dict]:
    return [{"bibcode": b, "type": "metrics", "status": "active",
             "payload": json.dumps({"citation_num": 99,
                                    "citations": [f"C{tag}-{b}"]}),
             "event_ts": f"2024-02-{day:02d}T00:00:00.000Z"}
            for b in bibs]


def _cli(argv: list[str]) -> dict:
    from adsmasterpipeline_spark.cli import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    assert rc == 0, (argv, buf.getvalue())
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    opts = {"rows": 16384, "batches": 4, "batch": 256}
    while argv:
        if argv[0] == "--json":
            json_out = argv[1]; argv = argv[2:]
        elif argv[0] in ("--rows", "--batches", "--batch"):
            opts[argv[0][2:]] = int(argv[1]); argv = argv[2:]
        else:
            raise SystemExit(f"unknown arg {argv[0]}")
    rpf = str(max(512, opts["rows"] // 24))

    from adsmasterpipeline_spark.session import get_spark
    get_spark("txn_reindex_probe").sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="txnprobe_")
    data = os.path.join(workdir, "data")
    out = {"config": {**opts, "rows_per_file": int(rpf)}, "steps": []}
    try:
        bibs = [f"K{i:06d}" for i in range(opts["rows"])]
        _write_events(os.path.join(workdir, "ev_boot"),
                      _full_record_events(bibs, 1))
        r = _cli(["ingest", "--events",
                  os.path.join(workdir, "ev_boot"), "--data", data,
                  "--fmt", "txn", "--rows-per-file", rpf])
        out["steps"].append({"step": "bootstrap_ingest", **r})
        r = _cli(["reindex", "--data", data, "--fmt", "txn",
                  "--rows-per-file", rpf])
        out["steps"].append({"step": "seed_reindex", **r})
        # baseline-consume the bootstrap through the change feed so
        # the per-batch outbox runs below are pure deltas
        r = _cli(["outbox", "--data", data, "--kind", "boost",
                  "--fmt", "txn", "--incremental"])
        out["steps"].append({"step": "outbox_feed_bootstrap", **r})
        # second CDF consumer (round 9): sitemap auto-update — same
        # bootstrap-baseline-then-delta cadence
        sm_out = os.path.join(workdir, "sitemap_files")
        r = _cli(["sitemap", "--data", data, "--action", "bootstrap",
                  "--fmt", "txn", "--out", sm_out])
        out["steps"].append({"step": "sitemap_bootstrap", **r})
        r = _cli(["sitemap", "--data", data, "--action", "auto",
                  "--fmt", "txn", "--incremental", "--out", sm_out])
        out["steps"].append({"step": "sitemap_auto_bootstrap", **r})
        # third CDF consumer (round 10): sitemap cleanup — baseline
        # covers the bootstrap window (nothing invalid yet)
        r = _cli(["sitemap", "--data", data, "--action", "cleanup",
                  "--fmt", "txn", "--incremental", "--out", sm_out])
        out["steps"].append({"step": "sitemap_cleanup_bootstrap", **r})

        # reserve a tail slice for per-batch tombstones so cleanup has
        # real invalidations; touch batches stay off it. Small --rows
        # configs that can't spare the tail skip the tombstone steps
        # instead of going modulo-by-zero.
        reserve = 512 if opts["rows"] > opts["batch"] + 1024 else 0
        del_pool = bibs[opts["rows"] - reserve:] if reserve else []
        for k in range(opts["batches"]):
            start = (k * 7919) % (opts["rows"] - opts["batch"] - reserve)
            touched = bibs[start:start + opts["batch"]]
            ev = os.path.join(workdir, f"ev_{k}")
            _write_events(ev, _touch_events(touched, k + 1, f"b{k}"))
            r = _cli(["ingest", "--events", ev, "--data", data,
                      "--fmt", "txn", "--rows-per-file", rpf])
            out["steps"].append({"step": f"incremental_ingest_{k}",
                                 **r})
            # NO --since: the cron tick uses the KV watermark the
            # previous run advanced (run.py:110-137's cadence) —
            # `updated` is PROCESSING time, so files written before
            # the last run's watermark are exactly the prunable ones
            r = _cli(["reindex", "--data", data, "--fmt", "txn",
                      "--rows-per-file", rpf])
            out["steps"].append({"step": f"cron_reindex_{k}", **r})
            # incremental outbox: requests derive from changes() over
            # the versions this batch's ingest + writeback committed
            r = _cli(["outbox", "--data", data, "--kind", "boost",
                      "--fmt", "txn", "--incremental"])
            out["steps"].append({"step": f"outbox_feed_{k}", **r})
            # sitemap auto from the same feed: this batch touched only
            # metrics + solr_processed, so the selection is exactly
            # the keys whose solr_processed moved in the writeback
            r = _cli(["sitemap", "--data", data, "--action", "auto",
                      "--fmt", "txn", "--incremental", "--out", sm_out])
            out["steps"].append({"step": f"sitemap_auto_{k}", **r})
            # tombstone a small reserved slice, then feed-driven
            # cleanup drops exactly those keys from the sitemap at
            # O(changed files) (the reference rescans the table,
            # adsmp/tasks.py:482-583)
            dels = del_pool[k * 8:(k + 1) * 8]
            if not dels:
                continue           # --rows too small for a tail pool
            ev_d = os.path.join(workdir, f"ev_del_{k}")
            _write_events(ev_d, [
                {"bibcode": b, "type": "bib_data", "status": "deleted",
                 "payload": "{}",
                 "event_ts": f"2024-03-{k + 1:02d}T00:00:00.000Z"}
                for b in dels])
            r = _cli(["ingest", "--events", ev_d, "--data", data,
                      "--fmt", "txn", "--rows-per-file", rpf])
            out["steps"].append({"step": f"tombstone_ingest_{k}", **r})
            r = _cli(["sitemap", "--data", data, "--action", "cleanup",
                      "--fmt", "txn", "--incremental", "--out", sm_out])
            assert r.get("removed") == len(dels), r
            out["steps"].append({"step": f"sitemap_cleanup_{k}", **r})

        # round-11 probe (VERDICT r10 task 4): stat-pruned predicate
        # DELETE — a selective key-range tombstone via `lake delete
        # --expr` must open only the files whose [min, max] range can
        # hold a matching key (the table is key-clustered, so the
        # range lands in a handful of files); before round 11 a
        # where= delete scanned every live file by construction
        mid = opts["rows"] // 2
        lo_b, hi_b = bibs[mid], bibs[mid + 32]
        r = _cli(["lake", "delete", "--path",
                  os.path.join(data, "records"),
                  "--expr",
                  f"bibcode >= '{lo_b}' AND bibcode <= '{hi_b}'"])
        assert r.get("deleted_rows") == 33, r
        out["steps"].append({"step": "delete_where_pruned",
                             "probes": {"delete_where": r["probe"]},
                             **{k: v for k, v in r.items()
                                if k != "probe"}})

        # summary: every probe must show candidates << live
        ratios = []
        for s in out["steps"]:
            probes = dict(s.get("probes") or {})
            if "probe" in s:
                probes["ingest_merge"] = s["probe"]
            if s.get("feed") and s["feed"].get("live_files"):
                probes["change_feed"] = {
                    "candidate_files": s["feed"]["files_read"],
                    "live_files": s["feed"]["live_files"]}
            for name, p in probes.items():
                if p and p.get("live_files"):
                    ratios.append(
                        (s["step"], name,
                         p["candidate_files"] / p["live_files"],
                         p["candidate_files"], p["live_files"]))
        out["probe_ratios"] = [
            {"step": st, "probe": nm,
             "candidate_over_live": round(ra, 3),
             "candidates": c, "live": lv}
            for st, nm, ra, c, lv in ratios]
        for row in out["probe_ratios"]:
            print(f"{row['step']}/{row['probe']}: "
                  f"{row['candidates']}/{row['live']} files "
                  f"({row['candidate_over_live']:.0%})")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
