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
  io_rand_probe_sec — random-offset 4 KiB write/fsync/read over a
                      64 MiB scratch file (round 19). Catches the
                      state-store / small-file pressure the sequential
                      probe cannot see (r19: q187/q146/q155 at 1.2-1.5x
                      normalized with st+mt+io ALL at parity). Reported
                      per run ("ior"); not yet a gate — no cross-round
                      baseline exists before r19.

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

  * a DRIVER artifact (BENCH_r{N}.json, the {"tail": ...} shape) is
    accepted as an input since round 18: graft.Bench emits the probe
    pairs on its parsed final line, so the artifact is self-adjudicating.
    Its per-query map may be front-truncated by the 2000-char tail
    window, so it participates in the probe gates and the totals table
    as PROBE+TOTAL evidence only — per-query MINs come from full run
    files (at least one required).

  * with --movers prev_certified.json (VERDICT r18 wrong #1: a movers
    disposition that says "everything else" must enumerate everything
    else): the output carries a "movers" table listing EVERY query whose
    silicon-normalized ratio vs the previous certified artifact exceeds
    1.2x — ratio_norm = (new/prev) * (p_prev_ref/p_new_ref) — with both
    absolute cs values, so smallness argues for itself instead of being
    summarized away.

  * with --note "...": the sentence is appended to the generated method
    string. Round-18 lesson (ADVICE r18 #1): hand-editing the narrative
    after adding runs desynced the run count from the prose; the note
    flag keeps commentary inside the generator so counts can't drift.

Usage: certify.py [--force] [--io-gate] [--movers prev.json]
       [--note "..."] out.json run1.json run2.json [...]
"""
import json
import sys


def load_run(p: str) -> dict:
    with open(p) as f:
        d = json.load(f)
    if "tail" in d and "queries" not in d:
        # driver BENCH_r{N}.json: gate on the final parsed line's probes
        lines = [l for l in d["tail"].splitlines()
                 if l.startswith('{"metric"')]
        if not lines:
            sys.exit(f"refuse: {p} is a driver artifact without a parsable "
                     "final bench line (pre-r18 Bench? no probe evidence)")
        try:
            t = json.loads(lines[-1])
        except json.JSONDecodeError as e:
            # ADVICE r18 #2: a corrupt / window-truncated metric line must
            # produce the same clean diagnostic as every other refusal
            sys.exit(f"refuse: {p}'s final bench line is unparsable "
                     f"({e}) — corrupt or truncated driver artifact")
        if not t.get("st"):
            sys.exit(f"refuse: {p}'s final line carries no st probe "
                     "(pre-r18 Bench)")
        return {"path": p, "probe": min(t["st"]),
                "probes": {"st": t.get("st"), "mt": t.get("mt"),
                           "io": t.get("io"), "ior": t.get("ior")},
                "queries": None, "total_sec": t.get("value"),
                "sf": t.get("sf")}
    st = d.get("cpu_probe_sec")
    return {"path": p, "probe": min(st) if st else float("nan"),
            "probes": {"st": st, "mt": d.get("cpu_probe_mt_sec"),
                       "io": d.get("io_probe_sec"),
                       # round 19: random-4KiB scratch probe (reported,
                       # never a gate yet — no cross-round baseline)
                       "ior": d.get("io_rand_probe_sec")},
            "queries": d["queries"], "total_sec": None, "sf": d.get("sf")}


def movers_table(prev_path: str, merged: dict, p_ref: float) -> dict:
    """EVERY shared query whose silicon-normalized ratio vs the previous
    certified artifact exceeds 1.2x, with absolute cs on both sides —
    the complete enumeration VERDICT r18 wrong #1 requires. Normalization:
    ratio_norm = (new/prev) * (p_prev_ref/p_new_ref), i.e. both rounds
    restated on the previous round's silicon.
    """
    with open(prev_path) as f:
        prev = json.load(f)
    p_prev = prev.get("probe_ref_sec")
    if not p_prev:
        sys.exit(f"refuse: --movers {prev_path} carries no probe_ref_sec "
                 "(pre-r15 certified artifact — no silicon evidence)")
    pq = prev["queries"]
    shared = [q for q in merged if q in pq and merged[q] > 0 and pq[q] > 0]
    rows = []
    for q in shared:
        ratio_raw = merged[q] / pq[q]
        ratio_norm = ratio_raw * p_prev / p_ref
        if ratio_norm > 1.2:
            rows.append({"q": q, "prev_cs": pq[q], "new_cs": merged[q],
                         "ratio_raw": round(ratio_raw, 2),
                         "ratio_norm": round(ratio_norm, 2)})
    rows.sort(key=lambda r: -r["ratio_norm"])
    tot_new = sum(merged[q] for q in shared)
    tot_prev = sum(pq[q] for q in shared)
    return {"prev": prev_path, "prev_probe_ref_sec": p_prev,
            "n_shared": len(shared),
            "shared_total_ratio_raw": round(tot_new / tot_prev, 3),
            "shared_total_ratio_norm": round(tot_new / tot_prev * p_prev / p_ref, 3),
            "threshold_norm": 1.2,
            "over_threshold": rows}


def main() -> int:
    force = "--force" in sys.argv
    io_gate = "--io-gate" in sys.argv
    args = [a for a in sys.argv[1:] if a not in ("--force", "--io-gate")]
    movers_prev = note = None
    if "--movers" in args:
        i = args.index("--movers")
        movers_prev = args[i + 1]
        del args[i:i + 2]
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        del args[i:i + 2]
    out_path, run_paths = args[0], args[1:]
    runs = [load_run(p) for p in run_paths]

    full = [r for r in runs if r["queries"] is not None]
    if not full:
        sys.exit("refuse: no full per-query run file among the inputs "
                 "(driver artifacts carry probes+total only)")
    keysets = {frozenset(r["queries"]) for r in full}
    if len(keysets) != 1:
        sys.exit("refuse: runs cover different query sets: "
                 + ", ".join(f"{r['path']}:{len(r['queries'])}q" for r in full))

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
    kept_full = [r for r in kept if r["queries"] is not None]
    if not kept_full:
        sys.exit("refuse: every full run was outside the probe band; "
                 "--force to override")

    names = sorted(kept_full[0]["queries"])
    merged = {q: min((r["queries"][q] for r in kept_full if r["queries"][q] >= 0),
                     default=-1) for q in names}
    # ADVICE r16: a probe-less run kept under --force has probe=NaN;
    # NaN * anything is NaN and json.dump would emit a bare NaN token
    # (non-standard JSON). Emit null for its normalized total instead.
    def raw_total(r):
        if r["queries"] is None:
            return r["total_sec"]
        return round(sum(v for v in r["queries"].values() if v >= 0) / 100, 2)
    run_rows = [{"path": r["path"], "probes": r["probes"],
                 **({"probe_and_total_only": True} if r["queries"] is None else {}),
                 "raw_total_sec": raw_total(r),
                 "norm_total_sec": (None if r["probe"] != r["probe"]
                                    or raw_total(r) is None else
                                    round(raw_total(r) * p_ref / r["probe"], 2))}
                for r in kept]
    gate_desc = "st+io-probe-gated" if io_gate else "st-probe-gated"
    method = (f"per-query MIN over {len(kept)} {gate_desc} runs; "
              "norm_total = raw * p_ref/p_run (p = min cpu_probe_sec)")
    if note:
        method += " — " + note
    out = {"method": method,
           "qunit": "cs", "sf": kept_full[0]["sf"], "nq": len(names),
           "probe_ref_sec": p_ref,
           **({"io_probe_ref_sec": io_ref} if io_gate else {}),
           "runs": run_rows,
           "refused_or_flagged": flagged,
           "merged_total_sec": round(sum(v for v in merged.values() if v >= 0) / 100, 2),
           **({"movers_vs_prev": movers_table(movers_prev, merged, p_ref)}
              if movers_prev else {}),
           "queries": merged}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {len(kept)} runs kept, {len(flagged)} flags, "
          f"merged {out['merged_total_sec']} s over {len(names)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
