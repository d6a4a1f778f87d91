#!/usr/bin/env python
"""Full-journey quality validation on planted-model synthetic data.

Drives the COMPLETE user journey through the real CLIs — synth → split →
train (SGD and/or ALS) → eval cadence → component export → predict — at
ML-20M / Netflix scale, and reports test-RMSE convergence against the
planted model's exact Bayes floor (see cu2rec_tpu/data/synth.py).  This is
the no-network stand-in for the reference benchmark protocol's real-data
axis (reference experiments/cu2rec.sh:8-19).

    python experiments/run_planted.py --preset ml20m --iterations 5000 \
        --factors 50 --algo sgd --collision twin

Appends one JSON line per eval point + a summary line to
results/planted-{preset}-{date}.jsonl.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, **kw)
    return time.perf_counter() - t0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="ml20m",
                   choices=["ml100k", "ml20m", "netflix"])
    p.add_argument("--workdir", default=None)
    p.add_argument("--iterations", type=int, default=5000)
    p.add_argument("--factors", type=int, default=50)
    p.add_argument("--check-error", type=int, default=500)
    p.add_argument("--noise", type=float, default=0.30)
    p.add_argument("--planted-factors", type=int, default=20)
    p.add_argument("--algo", default="sgd",
                   choices=["sgd", "als", "ials", "bpr"])
    p.add_argument("--collision", default="twin")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--reg", type=float, default=0.02)
    p.add_argument("--alpha", type=float, default=None,
                   help="iALS confidence slope; default 40.0 (the CLI "
                        "default) — the r3 measured sweep on planted "
                        "implicit ML-20M rises monotonically 0.3→40: "
                        "AUC 0.869→0.882, recall@10 0.032→0.050 "
                        "(results/planted-ml20m-*-ials-a*.jsonl)")
    p.add_argument("--train-eval-sample", type=int, default=2_000_000)
    p.add_argument("--test-eval-sample", type=int, default=0)
    p.add_argument("--implicit", action="store_true",
                   help="implicit-feedback planted data (softmax-affinity "
                        "observations; ranking signal + oracle-AUC ceiling "
                        "for BPR cells)")
    p.add_argument("--skip-gen", action="store_true",
                   help="reuse existing files in workdir")
    p.add_argument("--tag", default="")
    args = p.parse_args()

    workdir = args.workdir or os.path.join(
        "/tmp", f"planted_{args.preset}" + ("_imp" if args.implicit else ""))
    os.makedirs(workdir, exist_ok=True)
    raw = os.path.join(workdir, "ratings.csv")
    train_csv = os.path.join(workdir, "ratings_train.csv")
    test_csv = os.path.join(workdir, "ratings_test.csv")
    py = [sys.executable, "-m"]

    if not (args.skip_gen and os.path.exists(test_csv)):
        gen_cmd = py + ["cu2rec_tpu.cli.synth", raw,
                        "--preset", args.preset,
                        "--noise", str(args.noise),
                        "--factors", str(args.planted_factors)]
        if args.implicit:
            gen_cmd.append("--implicit")
        t_gen = run(gen_cmd)
        t_split = run(py + ["cu2rec_tpu.cli.split", raw, "0.1"])
    else:
        t_gen = t_split = 0.0
    floor = json.load(open(raw + ".meta.json"))["noise_floor"]

    cfg_path = os.path.join(workdir, "train.cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(dict(cur_iterations=0, total_iterations=args.iterations,
                       n_factors=args.factors, learning_rate=args.lr,
                       seed=42, P_reg=args.reg, Q_reg=args.reg,
                       user_bias_reg=args.reg, item_bias_reg=args.reg,
                       check_error=args.check_error,
                       train_eval_sample=args.train_eval_sample,
                       test_eval_sample=args.test_eval_sample), f)

    date = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    jsonl = os.path.join(ROOT, "results",
                         f"planted-{args.preset}-{date}{args.tag}.jsonl")
    os.makedirs(os.path.dirname(jsonl), exist_ok=True)

    cmd = py + ["cu2rec_tpu.cli.mf", "-c", cfg_path, train_csv, test_csv,
                "--jsonl", jsonl, "--outdir", workdir,
                "--algo", args.algo]
    if args.algo == "sgd":
        cmd += ["--collision", args.collision]
    if args.algo == "ials":
        alpha = args.alpha if args.alpha is not None else 40.0
        cmd += ["--alpha", str(alpha)]
    env = dict(os.environ)
    t_train = run(cmd, env=env)

    # Pull the last eval + timing rows back out of the metrics stream.
    rows = [json.loads(line) for line in open(jsonl)]
    evals = [r for r in rows if r.get("event") == "eval"]
    last = evals[-1] if evals else {}
    meta = json.load(open(raw + ".meta.json"))
    n_users, n_ratings = meta["users"], meta["ratings"]
    epoch_iters = n_ratings / n_users
    upd = [r.get("updates_per_s") for r in evals if r.get("updates_per_s")]
    upd_s = max(upd) if upd else None
    summary = dict(event="summary", preset=args.preset, algo=args.algo,
                   collision=args.collision, factors=args.factors,
                   iterations=args.iterations, noise_floor=floor,
                   reg=args.reg,
                   alpha=(args.alpha if args.algo == "ials" else None),
                   final_test_rmse=last.get("test_rmse"),
                   final_test_mae=last.get("test_mae"),
                   gap_to_floor=(last.get("test_rmse", 0) - floor
                                 if last.get("test_rmse") else None),
                   updates_per_s=upd_s,
                   epoch_equiv_s=(n_users * epoch_iters / upd_s)
                   if upd_s else None,
                   gen_s=round(t_gen, 1), split_s=round(t_split, 1),
                   train_wall_s=round(t_train, 1))
    if args.algo in ("bpr", "ials") and last:
        # Implicit trainers emit first-class auc/recall_at_k/ndcg_at_k/
        # objective columns (docs/API.md §metrics) — no mae/rmse aliasing.
        summary["final_auc"] = last["auc"]
        summary["final_recall_at_k"] = last["recall_at_k"]
        summary["final_ndcg_at_k"] = last["ndcg_at_k"]
        summary["final_objective"] = last["objective"]
        summary["oracle_auc"] = meta.get("oracle_auc")
    with open(jsonl, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary, indent=2))

    # Serve smoke: fold in a user from the test split via the predict CLI.
    base = os.path.splitext(os.path.basename(train_csv))[0]
    comp = os.path.join(workdir, f"{base}_f{args.factors}_")
    user_file = os.path.join(workdir, "user0.csv")
    with open(test_csv) as f, open(user_file, "w") as out:
        out.write("userId,itemId,rating\n")
        next(f)
        wrote = 0
        for line in f:
            u = line.split(",")[0]
            if wrote and u != first_u:
                break
            if not wrote:
                first_u = u
            out.write(line)
            wrote += 1
    run(py + ["cu2rec_tpu.cli.predict", "-c", cfg_path,
              "-i", comp + "item_bias.csv", "-g", comp + "global_bias.csv",
              "-q", comp + "q.csv", user_file, "-k", "5"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
