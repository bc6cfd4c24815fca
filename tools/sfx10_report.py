#!/usr/bin/env python3
"""Assemble BENCH_sfx10_r{N}.json from full 10x run files + the certified
1x artifact — the generator twin of certify.py for the scale axis
(ADVICE r18 #1: keep narrative/counts inside generators so they cannot
desync from the run evidence).

Usage: sfx10_report.py out.json certified_1x.json \
           --exact runB.json [runC.json ...] --novel runB.json [...]
           [--round N] [--note "..."]

Per-query values on each replica are the MIN across that replica's runs
(all runs must be the same code tree — certify.py's mixed-code caveat
applies here too). Ratios are per-query big/certified-1x; the aggregate
is sum(big)/sum(1x) over the shared non-negative set, reported raw and
st-normalized (x p_ref/p_run, p_run = min st across that replica's
runs). Named family tables (ladder-vs-fixed-b, round-19 serve tiers,
sample-trained) are emitted with both absolute cs sides so the growth
claims stay re-summable.
"""
import json
import sys


def load_queries(path):
    d = json.load(open(path))
    st = d.get("cpu_probe_sec") or []
    if "queries" not in d or not st:
        sys.exit(f"refuse: {path} is not a full bench run file "
                 "(no queries/probe evidence)")
    return d["queries"], min(st), {
        "st": st, "mt": d.get("cpu_probe_mt_sec"),
        "io": d.get("io_probe_sec"), "ior": d.get("io_rand_probe_sec")}


def merge_min(paths):
    runs = [load_queries(p) for p in paths]
    keys = set(runs[0][0])
    for q, _, _ in runs[1:]:
        if set(q) != keys:
            sys.exit("refuse: 10x runs cover different query sets")
    merged = {k: min(q[k] for q, _, _ in runs
                     if q[k] >= 0) if any(q[k] >= 0 for q, _, _ in runs)
              else -1 for k in keys}
    return merged, min(p for _, p, _ in runs), [
        {"path": path, "probes": pr} for path, (_, _, pr) in zip(paths, runs)]


def family(table, one_x, big):
    out = {}
    for q in table:
        c1, c10 = one_x.get(q), big.get(q)
        if c1 and c10 and c10 >= 0:
            out[f"q{q}"] = {"cs_1x": c1, "cs_10x": c10,
                            "ratio": round(c10 / c1, 2)}
    return out


def main():
    args = sys.argv[1:]
    note = ""
    rnd = 0
    if "--note" in args:
        i = args.index("--note"); note = args[i + 1]; del args[i:i + 2]
    if "--round" in args:
        i = args.index("--round"); rnd = int(args[i + 1]); del args[i:i + 2]
    out_path, cert_path = args[0], args[1]
    ex_paths = args[args.index("--exact") + 1:args.index("--novel")]
    nv_paths = args[args.index("--novel") + 1:]
    cert = json.load(open(cert_path))
    one_x, p_ref = cert["queries"], cert["probe_ref_sec"]

    def side(paths):
        big, p_run, runs = merge_min(paths)
        ks = [k for k in big if k in one_x and big[k] >= 0 and one_x[k] > 0]
        raw = sum(big[k] for k in ks) / sum(one_x[k] for k in ks)
        return big, {"runs": runs, "st_min_sec": p_run,
                     "aggregate_raw": round(raw, 2),
                     "aggregate_st_norm": round(raw * p_ref / p_run, 2),
                     "n_shared": len(ks)}
    ex, ex_meta = side(ex_paths)
    nv, nv_meta = side(nv_paths)
    art = {
        "round": rnd,
        "method": ("key-shifted 10x replicas of sf0.1 (ScaleUp; exact sfx10 "
                   "+ novel/organic sfx10n; q27 skipped by declaration). "
                   "Per-query cs = MIN across each replica's listed runs "
                   "(single code tree). RATIOS are per-query vs the "
                   f"certified 1x MINs ({cert_path}, probe_ref {p_ref}); "
                   "aggregates reported raw and st-normalized "
                   "(x p_ref/p_run)." + (" " + note if note else "")),
        "qunit": "cs",
        "one_x": {"path": cert_path, "probe_ref_sec": p_ref,
                  "merged_total_sec": cert.get("merged_total_sec")},
        "exact": ex_meta, "novel": nv_meta,
        "ladder_vs_fixed_b_exact": family(
            ["19", "20", "50", "230", "134"], one_x, ex),
        "ladder_vs_fixed_b_novel": family(
            ["19", "20", "50", "230", "134"], one_x, nv),
        "round19_queries_exact": family(
            ["229", "235", "236", "237", "213", "224"], one_x, ex),
        "round19_queries_novel": family(
            ["229", "235", "236", "237", "213", "224"], one_x, nv),
        "sample_trained_family_exact": family(
            ["54", "195", "140", "189", "148"], one_x, ex),
        "sample_trained_family_novel": family(
            ["54", "195", "140", "189", "148"], one_x, nv),
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out_path}: exact {ex_meta['aggregate_raw']}x raw / "
          f"{ex_meta['aggregate_st_norm']}x norm, novel "
          f"{nv_meta['aggregate_raw']}x / {nv_meta['aggregate_st_norm']}x "
          f"over {ex_meta['n_shared']} queries")


if __name__ == "__main__":
    main()
