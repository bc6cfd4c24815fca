#!/usr/bin/env python3
"""Merge per-query bench run files into one certified artifact.

VERDICT r15 #6: certification must consume the CPU probe instead of
relitigating host drift with narrative. Each run file (written by
graft.Bench) carries "cpu_probe_sec":[pre, post] — seconds for a fixed
512 MiB sha256 chain, lower = faster host.

Rules enforced here:
  * every run must cover the same query set (a partial run is a
    different experiment — refuse);
  * probe spread across merged runs must be <= 5% (max/min of each
    run's min(pre, post)); a run outside the band is REFUSED from the
    merge unless --force, in which case it is kept but flagged;
  * a run whose own pre/post disagree > 5% is flagged (the host moved
    DURING that run — its minimums are still valid, its totals not);
  * output: per-query MIN (cs), raw totals per run, and totals
    normalized to the FASTEST probe seen (t_norm = t_raw * p_ref/p_run).

Usage: certify.py out.json run1.json run2.json [...]
"""
import json
import sys


def main() -> int:
    force = "--force" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--force"]
    out_path, run_paths = args[0], args[1:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            d = json.load(f)
        # gate on the MULTI-thread probe when present: the r16 finding is
        # that host elevation under full-core load is invisible to the
        # single-thread probe (both at parity while the registry median
        # ran +12%) — the mt probe measures the throughput the bench
        # actually gets
        raw = d.get("cpu_probe_mt_sec") or d.get("cpu_probe_sec")
        probe = min(raw or [float("nan")])
        runs.append({"path": p, "probe": probe,
                     "probe_raw": {"st": d.get("cpu_probe_sec"),
                                   "mt": d.get("cpu_probe_mt_sec")},
                     "queries": d["queries"], "sf": d.get("sf")})

    keysets = {frozenset(r["queries"]) for r in runs}
    if len(keysets) != 1:
        sys.exit("refuse: runs cover different query sets: "
                 + ", ".join(f"{r['path']}:{len(r['queries'])}q" for r in runs))

    probes = [r["probe"] for r in runs if r["probe"] == r["probe"]]
    if not probes:
        sys.exit("refuse: no run carries cpu_probe_sec (re-run graft.Bench)")
    p_ref = min(probes)
    flagged = []
    kept = []
    for r in runs:
        bad = r["probe"] != r["probe"] or r["probe"] / p_ref > 1.05
        gate = r["probe_raw"]["mt"] or r["probe_raw"]["st"]
        intra = gate and len(gate) == 2 and max(gate) / min(gate) > 1.05
        if intra:
            flagged.append({"path": r["path"], "why": "pre/post probe disagree >5%",
                            "probe": r["probe_raw"]})
        if bad and not force:
            flagged.append({"path": r["path"], "why": "probe >5% off the fastest run",
                            "probe": r["probe_raw"]})
        else:
            kept.append(r)
    if not kept:
        sys.exit("refuse: every run was outside the probe band; --force to override")

    names = sorted(kept[0]["queries"])
    merged = {q: min(r["queries"][q] for r in kept
                     if r["queries"][q] >= 0) if any(r["queries"][q] >= 0 for r in kept)
              else -1 for q in names}
    run_rows = [{"path": r["path"], "probe_sec": r["probe_raw"],
                 "raw_total_sec": round(sum(v for v in r["queries"].values() if v >= 0) / 100, 2),
                 "norm_total_sec": round(sum(v for v in r["queries"].values() if v >= 0)
                                         / 100 * p_ref / r["probe"], 2)}
                for r in kept]
    out = {"method": f"per-query MIN over {len(kept)} probe-gated runs; "
                     "norm_total = raw * p_ref/p_run (p = min cpu_probe_sec)",
           "qunit": "cs", "sf": kept[0]["sf"], "nq": len(names),
           "probe_ref_sec": p_ref, "runs": run_rows,
           "refused_or_flagged": flagged,
           "merged_total_sec": round(sum(v for v in merged.values() if v >= 0) / 100, 2),
           "queries": merged}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {len(kept)} runs kept, {len(flagged)} flagged, "
          f"merged {out['merged_total_sec']} s over {len(names)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
