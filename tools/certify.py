#!/usr/bin/env python3
"""Merge per-query bench run files into one certified artifact.

VERDICT r15 #6: certification must consume host probes instead of
relitigating drift with narrative. graft.Bench stamps three probes into
every run artifact (all [pre, post] around the measured loop):

  cpu_probe_sec     — single-thread sha256 over 512 MiB. STABLE (±2%
                      run-to-run) → this is the merge GATE: silicon
                      parity between runs.
  cpu_probe_mt_sec  — 8-thread sha256, 2 GiB total. Catches full-load
                      elevation the single-thread probe misses (r16:
                      +12% registry median at single-thread parity).
                      Noisy (±15%) → reported + flagged, never a gate.
  io_probe_sec      — 256 MiB write+fsync+read in the scratch dir.
                      Catches storage/writeback pressure (r16: the
                      shuffle-heavy family's 10x times moved 3-4x on
                      identical code with both CPU probes at parity).

Rules:
  * every run must cover the same query set (a partial run is a
    different experiment — refuse);
  * a run whose single-thread probe is >5% off the fastest run is
    refused from the merge unless --force (kept but flagged);
  * mt/io probes that disagree >15% pre-vs-post inside one run flag it
    (the host moved DURING the run — its MINs are valid, totals not);
  * output: per-query MIN (cs), raw totals per run, totals normalized
    to the fastest st probe (t_norm = t_raw * p_ref/p_run), all probes.

  * with --io-gate (VERDICT r16 #7, for 10x merges): a run whose io
    probe (min of pre/post) is >25% off the fastest run's is refused —
    the banded family's 3-4x swing on identical code was an io-band
    artifact, so sfx10 ratios are only round-comparable at io parity.
    The st gate stays the 1x gate; io is opt-in because io probes are
    noisier (the 25% band is wider than st's 5% for that reason).

Usage: certify.py [--force] [--io-gate] out.json run1.json run2.json [...]
"""
import json
import sys


def main() -> int:
    force = "--force" in sys.argv
    io_gate = "--io-gate" in sys.argv
    args = [a for a in sys.argv[1:] if a not in ("--force", "--io-gate")]
    out_path, run_paths = args[0], args[1:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            d = json.load(f)
        st = d.get("cpu_probe_sec")
        runs.append({"path": p, "probe": min(st) if st else float("nan"),
                     "probes": {"st": st, "mt": d.get("cpu_probe_mt_sec"),
                                "io": d.get("io_probe_sec")},
                     "queries": d["queries"], "sf": d.get("sf")})

    keysets = {frozenset(r["queries"]) for r in runs}
    if len(keysets) != 1:
        sys.exit("refuse: runs cover different query sets: "
                 + ", ".join(f"{r['path']}:{len(r['queries'])}q" for r in runs))

    probes = [r["probe"] for r in runs if r["probe"] == r["probe"]]
    if not probes:
        sys.exit("refuse: no run carries cpu_probe_sec (re-run graft.Bench)")
    p_ref = min(probes)
    io_mins = [min(r["probes"]["io"]) for r in runs
               if r["probes"]["io"] and min(r["probes"]["io"]) > 0]
    if io_gate and not io_mins:
        sys.exit("refuse: --io-gate but no run carries io_probe_sec")
    io_ref = min(io_mins) if io_mins else None
    flagged = []
    kept = []
    for r in runs:
        for name in ("mt", "io"):
            v = r["probes"][name]
            if v and len(v) == 2 and min(v) > 0 and max(v) / min(v) > 1.15:
                flagged.append({"path": r["path"], "keep": True,
                                "why": f"{name} probe pre/post disagree >15% "
                                       "(host moved during the run)",
                                name: v})
        bad = r["probe"] != r["probe"] or r["probe"] / p_ref > 1.05
        why = "st probe >5% off the fastest run"
        if io_gate and not bad:
            io = r["probes"]["io"]
            bad = not io or min(io) <= 0 or min(io) / io_ref > 1.25
            why = "io probe >25% off the fastest run (or missing)"
        if bad and not force:
            flagged.append({"path": r["path"], "keep": False, "why": why,
                            "st": r["probes"]["st"], "io": r["probes"]["io"]})
        else:
            kept.append(r)
    if not kept:
        sys.exit("refuse: every run was outside the probe band; --force to override")

    names = sorted(kept[0]["queries"])
    merged = {q: min((r["queries"][q] for r in kept if r["queries"][q] >= 0),
                     default=-1) for q in names}
    # ADVICE r16: a probe-less run kept under --force has probe=NaN;
    # NaN * anything is NaN and json.dump would emit a bare NaN token
    # (non-standard JSON). Emit null for its normalized total instead.
    run_rows = [{"path": r["path"], "probes": r["probes"],
                 "raw_total_sec": round(sum(v for v in r["queries"].values() if v >= 0) / 100, 2),
                 "norm_total_sec": (None if r["probe"] != r["probe"] else
                                    round(sum(v for v in r["queries"].values() if v >= 0)
                                          / 100 * p_ref / r["probe"], 2))}
                for r in kept]
    gate_desc = "st+io-probe-gated" if io_gate else "st-probe-gated"
    out = {"method": f"per-query MIN over {len(kept)} {gate_desc} runs; "
                     "norm_total = raw * p_ref/p_run (p = min cpu_probe_sec)",
           "qunit": "cs", "sf": kept[0]["sf"], "nq": len(names),
           "probe_ref_sec": p_ref,
           **({"io_probe_ref_sec": io_ref} if io_gate else {}),
           "runs": run_rows,
           "refused_or_flagged": flagged,
           "merged_total_sec": round(sum(v for v in merged.values() if v >= 0) / 100, 2),
           "queries": merged}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {len(kept)} runs kept, {len(flagged)} flags, "
          f"merged {out['merged_total_sec']} s over {len(names)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
