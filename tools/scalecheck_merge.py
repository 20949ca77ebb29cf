#!/usr/bin/env python3
"""Merge N ScaleCheck passes into a committed SCALECHECK_*.json:
per-query min across passes, plus a ratio column against a reference
timing file.

Usage: tools/scalecheck_merge.py [--out=FILE] [--base=FILE] <pass1.log> [...]
  --out   output artifact (default SCALECHECK_sf1.json)
  --base  reference timings for the ratio column (default
          bench_last.json, the committed sf0.1 mins). For the 30x
          stretch artifact pass --base=SCALECHECK_sf1.json so the
          ratio reads "3x more data costs how much".
Each log's last scale_check JSON line is used.
"""
import sys, json


def last_json(path):
    lines = [l for l in open(path)
             if l.startswith('{"metric":"scale_check"')]
    return json.loads(lines[-1])


def main(argv):
    out_path = "SCALECHECK_sf1.json"
    base_path = "bench_last.json"
    paths = []
    for a in argv:
        if a.startswith("--out="):
            out_path = a[len("--out="):]
        elif a.startswith("--base="):
            base_path = a[len("--base="):]
        else:
            paths.append(a)
    passes = [last_json(p) for p in paths]
    base = passes[-1]
    mins = {q: min(p["queries"][q] for p in passes if q in p["queries"])
            for q in passes[0]["queries"]}
    ref = json.load(open(base_path))["queries"]
    ratio_key = ("ratio_vs_sf01" if base_path == "bench_last.json"
                 else "ratio_vs_" + base_path.replace("SCALECHECK_", "")
                 .replace(".json", ""))
    ratios = {q: round(mins[q] / ref[q], 2) if q in ref else None
              for q in mins}
    out = {
        "metric": "scale_check",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "queries": {q: round(v, 3) for q, v in mins.items()},
        "errors": {},
        "n_errors": sum(p["n_errors"] for p in passes),
        "replicas": base["replicas"],
        "base": base["base"],
        "build_sec": min(p["build_sec"] for p in passes),
        # build-inclusive first pass: max across logs that REPORT it (a
        # pre-pass1_sec log must not collapse the field to 0.0, and
        # different logs may cover different query subsets — max keeps
        # the most build-inclusive observation; r10 ADVICE)
        "pass1_sec": max(
            (p["pass1_sec"] for p in passes if "pass1_sec" in p),
            default=None),
        "d6_rounds_base": max(p["d6_rounds_base"] for p in passes),
        "d6_rounds_scaled": base["d6_rounds_scaled"],
        **({"streaming_soak": base["streaming_soak"]}
           if "streaming_soak" in base else {}),
        "commit": base["commit"],
        "scanned_at": base["scanned_at"],
        "passes": sum(p.get("passes", 1) for p in passes),
        ratio_key: ratios,
        "note": ("min of %d passes (in-process: durable-index builds "
                 "land in pass 1 and are amortized, exactly like the "
                 "reference mins in %s; pass1_sec is the build-inclusive "
                 "first pass) on replicated %dx data. Linear ops sit "
                 "well below the replica factor while 32 threads have "
                 "headroom; ~factor means output bytes scale with the "
                 "data and threads were already saturated; sub-linear = "
                 "cost tracks a bounded set."
                 % (sum(p.get("passes", 1) for p in passes),
                    base_path, base["replicas"])),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    worst = sorted(((r or 0, q) for q, r in ratios.items()), reverse=True)[:6]
    print("wrote %s;" % out_path, len(mins), "queries, worst ratios:", worst)


if __name__ == "__main__":
    main(sys.argv[1:])
