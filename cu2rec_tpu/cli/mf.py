"""``mf`` — train a matrix-factorization model (reference mf.cu parity).

Usage matches the reference binary (README.md:31):

    python -m cu2rec_tpu.cli.mf -c path/to/config train.csv test.csv

plus TPU-native extensions: ``--jsonl`` metrics stream, ``--checkpoint`` /
``--resume`` (real mid-run resume, unlike the reference's vestigial
``cur_iterations``), ``--devices N`` for a sharded mesh run, ``--collision``
policy, ``--dtype``.

Output contract preserved: the five component CSVs are written next to the
train file as ``{base}_f{factors}_{p,q,user_bias,item_bias,global_bias}.csv``
(mf.cu:63-87).
"""

from __future__ import annotations

import argparse
import os

from cu2rec_tpu.data import build_csr, read_ratings_csv
from cu2rec_tpu.train.trainer import train
from cu2rec_tpu.utils.checkpoint import export_components, load_checkpoint, \
    save_checkpoint
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.device import print_free_memory
from cu2rec_tpu.utils.metrics import MetricsLogger


def build_parser():
    p = argparse.ArgumentParser(prog="mf", description=__doc__)
    p.add_argument("-c", "--config", default=None, help="config file "
                   "(legacy 9-field, extended 13-field, or JSON)")
    p.add_argument("train_csv")
    p.add_argument("test_csv")
    p.add_argument("--jsonl", default=None, help="append metrics JSONL here")
    p.add_argument("--checkpoint", default=None,
                   help="write a resumable .npz checkpoint here at the end")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="also checkpoint every N eval points")
    p.add_argument("--resume", default=None,
                   help="resume from a .npz checkpoint")
    p.add_argument("--devices", type=int, default=0,
                   help="shard over this many devices (0 = single device)")
    p.add_argument("--collision", choices=["first_wins", "mean", "twin"],
                   default=None,
                   help="item-update policy: first_wins = deterministic "
                        "Hogwild parity; mean = average colliding updates; "
                        "twin = per-item sampling, scatter-free (fastest)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--algo", choices=["sgd", "als", "ials", "bpr"],
                   default=None,
                   help="training algorithm (als/ials: total_iterations = "
                        "number of sweeps; ials = implicit-feedback "
                        "weighted MF and bpr = pairwise ranking, both "
                        "evaluated by recall@10)")
    p.add_argument("--solver",
                   choices=["auto", "blocked", "pallas", "xla"],
                   default="auto",
                   help="batched ridge solver for als/ials sweeps")
    p.add_argument("--alpha", type=float, default=40.0,
                   help="iALS confidence slope (c = 1 + alpha*r)")
    p.add_argument("--outdir", default=None,
                   help="component output dir (default: next to train csv)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    # Free-memory probe at startup (mf.cu:33-37).
    print_free_memory()

    # Build both CSRs with shared dimensions (max over the two files):
    # evaluation indexes the model tables by user/item id, so the splits
    # must agree on the id space.  (The reference sizes each matrix from
    # its own file's max ids — mf.cu:43-51 — and relies on preprocessing
    # to keep test ⊆ train; sharded eval additionally requires equal
    # padded dims, see parallel/sharded.py.)
    train_rd = read_ratings_csv(args.train_csv)
    test_rd = read_ratings_csv(args.test_csv)
    n_users = max(train_rd.n_users, test_rd.n_users)
    n_items = max(train_rd.n_items, test_rd.n_items)
    train_csr = build_csr(train_rd, n_users=n_users, n_items=n_items)
    test_csr = build_csr(test_rd, n_users=n_users, n_items=n_items)

    model = None
    if args.resume:
        model, cfg, _extra = load_checkpoint(args.resume)
        print(f"Resuming from {args.resume} at iteration {cfg.cur_iterations}")
    else:
        cfg = Config()
    if args.config:
        # Config file overrides checkpoint hyperparams but a resumed
        # cur_iterations survives unless the file sets it.
        cur = cfg.cur_iterations
        cfg.read_config(args.config)
        if args.resume and cfg.cur_iterations == 0:
            cfg.cur_iterations = cur
    if args.collision:
        cfg.collision_policy = args.collision
    if args.dtype:
        cfg.dtype = args.dtype
    if args.algo:
        cfg.algo = args.algo
    cfg.print_config()

    logger = MetricsLogger(jsonl_path=args.jsonl)

    if cfg.algo == "bpr":
        from cu2rec_tpu.train.bpr import train_bpr
        model, _losses = train_bpr(train_csr, test_csr, cfg, model=model,
                                   logger=logger,
                                   n_devices=args.devices or 0)
    elif cfg.algo == "ials":
        mesh = None
        if args.devices and args.devices > 1:
            from cu2rec_tpu.parallel.sharded import make_mesh
            mesh = make_mesh(args.devices)
        from cu2rec_tpu.train.ials import train_ials
        model, _losses = train_ials(train_csr, test_csr, cfg,
                                    alpha=args.alpha, model=model,
                                    logger=logger, mesh=mesh,
                                    solver=args.solver)
    elif cfg.algo == "als":
        # ALS shards its batched ridge solves over a mesh directly — no
        # ShardedEngine needed (each row's solve is independent).
        mesh = None
        if args.devices and args.devices > 1:
            from cu2rec_tpu.parallel.sharded import make_mesh
            mesh = make_mesh(args.devices)
        from cu2rec_tpu.train.als import train_als
        model, _losses = train_als(train_csr, test_csr, cfg,
                                   train_rd.global_bias, model=model,
                                   logger=logger, mesh=mesh,
                                   solver=args.solver)
    else:
        engine = None
        if args.devices and args.devices > 1:
            from cu2rec_tpu.parallel.sharded import ShardedEngine
            engine = ShardedEngine(train_csr, test_csr, cfg,
                                   n_devices=args.devices)
        model, _losses = train(train_csr, test_csr, cfg,
                               train_rd.global_bias,
                               model=model, logger=logger, engine=engine,
                               checkpoint_path=args.checkpoint,
                               checkpoint_every=args.checkpoint_every)

    # Component export next to the train file (mf.cu:63-87).
    outdir = args.outdir or (os.path.dirname(args.train_csv) or ".")
    os.makedirs(outdir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.train_csv))[0]
    paths = export_components(model, outdir, base, cfg.n_factors)
    for p in paths:
        print(f"Wrote {p}")
    if args.checkpoint:
        save_checkpoint(args.checkpoint, model, cfg)
        print(f"Wrote checkpoint {args.checkpoint}")
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
