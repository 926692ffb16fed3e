#!/usr/bin/env python3
"""Merge per-run Bench logs into one scale-rehearsal artifact.

VERDICT r12 finding #3: the r12 sf100 artifact carried per-query
provenance (`source`) but dropped each run's CONFIG (heap, local dirs,
codec, parallelism), leaving decade reproduction to prose. This tool
lifts each run's machine-readable `run_meta` line (emitted by
graft.Bench since r13) into a `runs` block alongside the best-of merge,
so the merged artifact alone reproduces every run.

Usage: merge_bench.py OUT.json NAME=BENCH_LOG [NAME=BENCH_LOG ...]

Each BENCH_LOG is a Bench stdout capture containing (in order) the
run_meta line, the detail line, and the contract line. Merge rule
matches Bench.mergeSweeps: per-query MIN over error-free runs; a query
that errored in every run keeps its first error; `source` records which
run supplied each chosen number.
"""
import json, re, sys


def extract(path):
    meta, detail, contract = None, None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"run_meta"'):
                meta = json.loads(line)["run_meta"]
            elif line.startswith('{"detail"'):
                detail = json.loads(line)
            elif line.startswith('{"metric"'):
                contract = json.loads(line)
    if detail is None:
        sys.exit(f"{path}: no detail line found")
    # VERDICT r14 #8: a merge must never produce a `runs` entry without
    # its config — a merged artifact whose run lacks heap/dirs/codec is
    # irreproducible, which defeats the block's purpose. Reject at
    # extract time (the earliest the gap is knowable) instead of writing
    # a half-provenanced artifact.
    if meta is None:
        sys.exit(f"{path}: no run_meta line found — a merged run without its "
                 "config block is irreproducible; re-capture the full Bench stdout")
    return meta, detail, contract


def selftest():
    """Schema-gate self-test: a log missing run_meta must be rejected."""
    import subprocess, tempfile, os
    detail = '{"detail":"d","queries":{"q":1.0},"errors":{},"cache_build_ms":{},"sf":"/x"}'
    contract = '{"metric":"total","value":1.0,"unit":"sec","queries":{"q":1.0},"errors":{},"sweeps":1,"sf":"/x"}'
    meta = ('{"run_meta":{"loadavg_1m":2.41,"mem_available_mb":"98304",'
            '"heap_mb":"1","cpus":"1","master":"local","sweeps":"1"}}')
    with tempfile.TemporaryDirectory() as d:
        good, bad, out = os.path.join(d, "good"), os.path.join(d, "bad"), os.path.join(d, "out.json")
        with open(good, "w") as f:
            f.write("\n".join([meta, detail, contract]) + "\n")
        with open(bad, "w") as f:
            f.write("\n".join([detail, contract]) + "\n")
        me = os.path.abspath(__file__)
        r = subprocess.run([sys.executable, me, out, f"a={good}"], capture_output=True, text=True)
        assert r.returncode == 0, f"good log rejected: {r.stderr or r.stdout}"
        merged = json.load(open(out))
        assert merged["runs"]["a"]["config"], "merged run lost its config"
        # VERDICT r15 #8: the host-context fields (loadavg at sweep
        # start, MemAvailable) must survive into the merged config so
        # a drift adjudication is a field read, not prose.
        assert merged["runs"]["a"]["config"]["loadavg_1m"] == 2.41, \
            "merged run lost loadavg_1m"
        assert merged["runs"]["a"]["config"]["mem_available_mb"] == "98304", \
            "merged run lost mem_available_mb"
        r = subprocess.run([sys.executable, me, out, f"a={good}", f"b={bad}"],
                           capture_output=True, text=True)
        assert r.returncode != 0, "merge with a config-less log must fail"
        assert "run_meta" in (r.stderr + r.stdout), "rejection must name the missing block"
    print("merge_bench selftest: OK")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path = sys.argv[1]
    runs = {}
    for arg in sys.argv[2:]:
        if "=" not in arg:
            sys.exit(f"expected NAME=LOG, got {arg}")
        name, path = arg.split("=", 1)
        runs[name] = extract(path)

    best, source, errors, cache_build = {}, {}, {}, {}
    skipped = set()
    for name, (meta, detail, contract) in runs.items():
        if contract and contract.get("skipped"):
            skipped.update(contract["skipped"])
        errs = detail.get("errors", {})
        for q, sec in detail["queries"].items():
            if q in errs:
                errors.setdefault(q, f"{name}: {errs[q]}")
                continue
            if q not in best or sec < best[q]:
                best[q], source[q] = sec, name
                cb = detail.get("cache_build_ms", {}).get(q)
                if cb is not None:
                    cache_build[q] = cb
                elif q in cache_build:
                    del cache_build[q]
    # A query that failed everywhere still reports (with its error), so
    # the merged total never silently shrinks coverage.
    merged_errors = {q: e for q, e in errors.items() if q not in best}

    artifact = {
        "metric": "total",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "sf": next((c.get("sf") for _, _, c in runs.values() if c), None),
        "queries": dict(sorted(best.items())),
        "errors": merged_errors,
        "source": dict(sorted(source.items())),
        "cache_build_ms": dict(sorted(cache_build.items())),
        # Only queries with NO measurement in any merged run (ADVICE r13
        # #3): a query another run actually measured must not also appear
        # skipped — an ambiguous artifact would weaken the
        # "whitelisted sweep can never masquerade as full" invariant.
        "skipped": sorted(skipped - set(best) - set(errors)),
        # The r12 gap, closed: one config block per run, machine-readable.
        # sweep_stats rides per-run when the contract line carried it.
        "runs": {name: {"config": meta,
                        **{k: contract[k] for k in ("sweep_stats", "recall")
                           if contract and k in contract},
                        "queries": sorted(q for q, s in source.items() if s == name)}
                 for name, (meta, _, contract) in runs.items()},
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{out_path}: {len(best)} queries, {len(merged_errors)} hard errors, "
          f"{len(runs)} runs, total {artifact['value']}s")


if __name__ == "__main__":
    main()
