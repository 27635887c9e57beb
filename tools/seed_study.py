"""Multi-seed convergence study: exact vs --stage1_cached schedules.

The --stage1_cached perf rung changes stage-1 semantics (critics train
on the epoch-stale feature bank instead of fresh forwards,
ref schedule: Solver.py:194-248). Round 3 defended it with ONE seed;
this tool runs the full matrix

    seeds x {exact, cached} x 70 epochs at MOSI scale
    (+ optionally MOSEI scale, --mosei)

on identical data (data_seed pinned) and reports, per schedule, the
mean +/- spread of best-valid MAE and whether the cached schedule lands
inside the exact schedule's seed envelope.

Each run is a full `python -m mimrl_tpu.tools.parity --synthetic
--allow_hermetic --full_scale` invocation in a subprocess (fresh
process = honest compile-cache behavior, no cross-run state).
Resumable: runs whose report JSON already exists are skipped.

Usage:
    python tools/seed_study.py --seeds 0 1 2 --out docs/SEED_STUDY.json
    python tools/seed_study.py --mosei --seeds 0 --epochs 70 ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


# schedule/variant name -> extra parity flags. `exact` is the envelope
# anchor (the reference-exact --epoch_scan schedule); every other
# variant is judged against exact's seed envelope.
SCHEDULES = {
    # the anchor schedules pin f32 moments/banks explicitly: they are
    # the SEMANTIC baseline pair and must stay numerically identical
    # across rounds even as the solver's perf defaults move (round 5
    # flipped --moment_dtype to bfloat16 after the cached_mom study
    # legitimized it; the round-4 exact/cached runs predate the flip)
    "exact": ["--moment_dtype", "float32", "--bank_dtype", "float32"],
    "cached": ["--stage1_cached", "--moment_dtype", "float32",
               "--bank_dtype", "float32"],
    # the candidate low-precision default bundle: bf16 optimizer
    # moments + bf16 feature banks on top of the cached headline rung
    "cached_lowp": ["--stage1_cached", "--moment_dtype", "bfloat16",
                    "--bank_dtype", "bfloat16"],
    # same bundle at the reference-exact schedule (no stage1 caching)
    "exact_lowp": ["--moment_dtype", "bfloat16",
                   "--bank_dtype", "bfloat16"],
    # moment_bf16 alone (optimizer-side only; banks stay f32) — the
    # +2.6% bench knob isolated from the bank-dtype semantics change
    "cached_mom": ["--stage1_cached", "--moment_dtype", "bfloat16"],
}


def run_one(outdir, scale, schedule, seed, epochs, data_seed):
    name = f"{scale}_{schedule}_s{seed}"
    out = os.path.join(outdir, f"{name}.json")
    if os.path.exists(out):
        print(f"[seed_study] {name}: exists, skipping", flush=True)
        return out
    cmd = [sys.executable, "-m", "mimrl_tpu.tools.parity", "--synthetic",
           "--allow_hermetic", "--full_scale", "--light_artifacts",
           "--scale", scale,
           "--seed", str(seed), "--data_seed", str(data_seed),
           "--epochs_num", str(epochs), "--task_name", f"seed_{name}",
           "--out", out]
    cmd += SCHEDULES[schedule]
    t0 = time.time()
    print(f"[seed_study] {name}: running...", flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-4000:], flush=True)
        raise SystemExit(f"{name} failed rc={r.returncode}")
    print(f"[seed_study] {name}: done in {time.time() - t0:.0f}s", flush=True)
    return out


def summarize(reports):
    """Per (scale, schedule): best-valid/test MAE list over seeds +
    envelope verdict (is every cached MAE within the exact schedule's
    min..max seed envelope, widened by the exact spread itself?)."""
    import numpy as np

    table = {}
    for meta, path in reports:
        with open(path) as f:
            rep = json.load(f)
        scale, schedule, seed = meta
        key = f"{scale}/{schedule}"
        row = table.setdefault(key, {"seeds": [], "best_valid_mae": [],
                                     "test_mae_at_best_valid": [],
                                     "samples_per_sec": []})
        row["seeds"].append(seed)
        row["best_valid_mae"].append(rep["best_valid_score"]["mae"])
        row["test_mae_at_best_valid"].append(
            rep["test_score_at_best_valid"]["mae"])
        row["samples_per_sec"].append(rep["samples_per_sec"])
    for key, row in table.items():
        v = np.asarray(row["best_valid_mae"])
        row["mean"] = float(v.mean())
        row["std"] = float(v.std())
        row["min"] = float(v.min())
        row["max"] = float(v.max())
    # seed-noise scale: the largest exact-seed population's std (a
    # single-seed scale, e.g. the one MOSEI pair, borrows the MOSI
    # exact std — a zero-width envelope from one sample is meaningless)
    stds = [t["std"] for k, t in table.items()
            if k.endswith("/exact") and len(t["seeds"]) >= 2]
    noise = max(stds) if stds else 0.005
    verdicts = {}
    for scale in {k.split("/")[0] for k in table}:
        ex = table.get(f"{scale}/exact")
        if not ex:
            continue
        # envelope: exact's observed seed range, widened by one exact-
        # schedule std on each side (3 seeds undersample the true range)
        sigma = ex["std"] if len(ex["seeds"]) >= 2 else noise
        lo = ex["min"] - sigma
        hi = ex["max"] + sigma
        for key, row in table.items():
            s, schedule = key.split("/")
            if s != scale or schedule == "exact":
                continue
            inside = [lo <= m <= hi for m in row["best_valid_mae"]]
            # two criteria, both shipped:
            # (a) every variant seed inside exact's widened envelope —
            #     strict, but mis-calibrated when the variant's seed
            #     variance exceeds the anchor's (a variant whose MEAN
            #     is better can still "fail" per-seed: MOSEI exact's
            #     3-seed std is 2e-4 while cached's is 1.3e-3);
            # (b) mean non-inferiority: variant mean <= exact mean +
            #     pooled seed std (the symmetric noise scale of the
            #     comparison itself).
            pooled = float(np.sqrt((ex["std"] ** 2 + row["std"] ** 2)
                                   / 2.0)) if len(row["seeds"]) >= 2 \
                else max(sigma, 1e-9)
            mean_ok = row["mean"] <= ex["mean"] + max(pooled, 1e-9)
            # legacy key (scale only) for the cached rung, new keys
            # (scale/variant) for everything else
            vkey = scale if schedule == "cached" else key
            verdicts[vkey] = {
                "schedule": schedule,
                "exact_envelope": [round(lo, 4), round(hi, 4)],
                "inside_envelope": inside,
                "pass_each_seed_in_envelope": all(inside),
                "pass_mean_noninferior": bool(mean_ok),
                "pooled_seed_std": round(pooled, 5),
                "pass": all(inside) or bool(mean_ok),
                "mean_delta": round(row["mean"] - ex["mean"], 4),
                # the envelope verdict is scale-free (a tight exact seed
                # spread makes tiny absolute deltas "fail"); the relative
                # delta carries the magnitude for interpretation
                "mean_delta_pct": round(
                    100.0 * (row["mean"] - ex["mean"]) / ex["mean"], 2),
                "mean_delta_vs_exact_spread": (
                    round((row["mean"] - ex["mean"]) / max(sigma, 1e-9),
                          2)),
                "envelope_basis": ("own_seeds" if len(ex["seeds"]) >= 2
                                   else "borrowed_noise_scale"),
            }
    return {"runs": table, "envelope_verdict": verdicts}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=70)
    ap.add_argument("--data_seed", type=int, default=0)
    ap.add_argument("--mosei", action="store_true",
                    help="also run the MOSEI-scale shape (16326-row "
                         "fixture, dims 74/35)")
    ap.add_argument("--mosei_seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--schedules", nargs="+",
                    default=["exact", "cached"],
                    choices=sorted(SCHEDULES),
                    help="variants to run; 'exact' is always the "
                         "envelope anchor")
    ap.add_argument("--mosei_schedules", nargs="+", default=None,
                    choices=sorted(SCHEDULES),
                    help="variants for the MOSEI leg (default: same "
                         "as --schedules)")
    ap.add_argument("--runs_dir", default="docs/seed_runs")
    ap.add_argument("--out", default="docs/SEED_STUDY.json")
    args = ap.parse_args()

    schedules = list(dict.fromkeys(["exact"] + args.schedules))
    os.makedirs(args.runs_dir, exist_ok=True)
    reports = []
    for schedule in schedules:
        for seed in args.seeds:
            path = run_one(args.runs_dir, "mosi", schedule, seed,
                           args.epochs, args.data_seed)
            reports.append((("mosi", schedule, seed), path))
    if args.mosei:
        mosei_schedules = (schedules if args.mosei_schedules is None
                           else list(dict.fromkeys(
                               ["exact"] + args.mosei_schedules)))
        for schedule in mosei_schedules:
            for seed in args.mosei_seeds:
                path = run_one(args.runs_dir, "mosei", schedule, seed,
                               args.epochs, args.data_seed)
                reports.append((("mosei", schedule, seed), path))

    summary = summarize(reports)
    summary["protocol"] = {
        "epochs": args.epochs, "data_seed": args.data_seed,
        "note": "identical synthetic fixture per scale (data_seed pinned); "
                "only the training seed varies. exact = --epoch_scan "
                "reference-exact schedule; cached = --stage1_cached.",
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["envelope_verdict"], indent=2))


if __name__ == "__main__":
    main()
