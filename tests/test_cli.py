"""End-to-end CLI tests (CPU backend): the mf → export → predict round
trip of reference mf.cu + predict.cu, plus the preprocessing CLIs."""

import numpy as np


def test_mf_train_export_predict_roundtrip(tmp_path, data_dir, capsys):
    from cu2rec_tpu.cli import mf, predict

    train = str(data_dir / "test_ratings.csv")
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("0 60 4 0.05 42 0.02 0.02 0.02 0.02\n")

    rc = mf.main(["-c", str(cfg_path), train, train,
                  "--outdir", str(tmp_path),
                  "--checkpoint", str(tmp_path / "ckpt.npz"),
                  "--jsonl", str(tmp_path / "m.jsonl")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "TRAIN: Iteration 1 " in out
    assert "TRAIN: Iteration 60 " in out
    for comp in ("p", "q", "user_bias", "item_bias", "global_bias"):
        assert (tmp_path / f"test_ratings_f4_{comp}.csv").exists()
    assert (tmp_path / "ckpt.npz").exists()
    assert (tmp_path / "m.jsonl").read_text().count('"event": "eval"') >= 2

    # component shapes follow the contract
    from cu2rec_tpu.data import load_matrix
    q = load_matrix(str(tmp_path / "test_ratings_f4_q.csv"))
    assert q.shape == (5, 4)
    p = load_matrix(str(tmp_path / "test_ratings_f4_p.csv"))
    assert p.shape == (6, 4)

    rc = predict.main(["-c", str(cfg_path),
                       "-i", str(tmp_path / "test_ratings_f4_item_bias.csv"),
                       "-g", str(tmp_path / "test_ratings_f4_global_bias.csv"),
                       "-q", str(tmp_path / "test_ratings_f4_q.csv"),
                       str(data_dir / "test_user_ratings.csv")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Predictions:" in out
    assert "Rank: 1" in out
    # rated items (0-based 0,1,3) are filtered from recommendations
    for line in out.splitlines():
        if line.startswith("Rank:"):
            item = int(line.split("Item:")[1].split()[0])
            assert item in (2, 4)


def test_mf_resume(tmp_path, data_dir, capsys):
    from cu2rec_tpu.cli import mf

    train = str(data_dir / "test_ratings.csv")
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("0 10 2 0.05 42 0.02 0.02 0.02 0.02\n")
    ck = str(tmp_path / "ck.npz")
    assert mf.main(["-c", str(cfg_path), train, train, "--outdir",
                    str(tmp_path), "--checkpoint", ck]) == 0
    capsys.readouterr()
    assert mf.main(["--resume", ck, train, train,
                    "--outdir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "Resuming from" in out


def test_mf_sharded_devices_flag(tmp_path, data_dir, capsys):
    from cu2rec_tpu.cli import mf

    train = str(data_dir / "test_ratings.csv")
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("0 10 2 0.05 42 0.02 0.02 0.02 0.02\n")
    assert mf.main(["-c", str(cfg_path), train, train,
                    "--outdir", str(tmp_path), "--devices", "4"]) == 0
    out = capsys.readouterr().out
    assert "TRAIN: Iteration 10 " in out


def test_mf_cpu_cli(tmp_path, data_dir, capsys):
    from cu2rec_tpu.cli import mf_cpu

    train = str(data_dir / "test_ratings.csv")
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("0 5 2 0.05 42 0.02 0.02 0.02 0.02\n")
    import shutil
    local = tmp_path / "r.csv"
    shutil.copy(train, local)
    assert mf_cpu.main(["-c", str(cfg_path), str(local), str(local)]) == 0
    out = capsys.readouterr().out
    assert "Time taken for 5 of iterations" in out
    assert (tmp_path / "r_f2_q.csv").exists()


def test_preprocessing_clis(tmp_path, capsys):
    from cu2rec_tpu.cli import (convert_to_np, create_config, map_items,
                                sort_ratings, split)

    raw = tmp_path / "raw.csv"
    raw.write_text("userId,itemId,rating\n"
                   "900,7,4.0\n900,9,3.0\n5,7,5.0\n5,2,1.0\n77,9,2.0\n")
    assert map_items.main([str(raw)]) == 0
    mapped = tmp_path / "raw_mapped.csv"
    assert mapped.exists()
    lines = mapped.read_text().strip().splitlines()
    assert lines[0] == "userId,itemId,rating"
    # ids remapped sequentially from 1, sorted by user
    users = [int(l.split(",")[0]) for l in lines[1:]]
    assert users == sorted(users)
    assert max(users) == 3

    assert split.main([str(mapped), "0.4", "-s", "1"]) == 0
    assert (tmp_path / "raw_mapped_train.csv").exists()
    assert (tmp_path / "raw_mapped_test.csv").exists()

    assert sort_ratings.main([str(mapped)]) == 0
    assert (tmp_path / "raw_mapped_sorted.csv").exists()

    cfgp = tmp_path / "c.cfg"
    assert create_config.main([str(cfgp), "--total_iterations", "42"]) == 0
    assert cfgp.read_text().split()[1] == "42"

    comp = tmp_path / "mat.csv"
    comp.write_text("1.0,2.0\n3.0,4.0\n")
    assert convert_to_np.main([str(comp)]) == 0
    arr = np.load(tmp_path / "mat.npy")
    np.testing.assert_allclose(arr, [[1, 2], [3, 4]])


def test_get_data_cli(tmp_path, capsys):
    """The one-command real-data path (cu2rec-get-data): dry-run plan,
    checksum rejection, and the full offline pipeline from a local
    archive fixture (download is the only step the fixture skips) —
    covers the reference benchmark grid's dataset axis prep
    (cu2rec.sh:8-10 + preprocessing/*.py) end to end."""
    import json
    import zipfile

    from cu2rec_tpu.cli.get_data import main as get_data

    # dry-run: plan only, no filesystem writes
    out = tmp_path / "ml20m"
    rc = get_data(["ml20m", "--outdir", str(out), "--dry-run"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["member"] == "ml-20m/ratings.csv"
    assert str(out) in plan["outputs"][0]
    assert not out.exists()

    # local archive fixture in MovieLens layout (4th timestamp column)
    archive = tmp_path / "ml-20m.zip"
    rows = ["userId,movieId,rating,timestamp",
            "7,10,4.0,111", "7,30,3.0,112", "3,10,5.0,113",
            "3,20,1.0,114", "9,20,2.0,115"]
    with zipfile.ZipFile(archive, "w") as z:
        z.writestr("ml-20m/ratings.csv", "\n".join(rows) + "\n")

    # checksum is enforced on local archives too
    rc = get_data(["ml20m", "--outdir", str(out), "--archive",
                   str(archive)])
    assert rc == 1
    capsys.readouterr()

    rc = get_data(["ml20m", "--outdir", str(out), "--archive",
                   str(archive), "--no-checksum", "--test-fraction",
                   "0.2"])
    assert rc == 0
    capsys.readouterr()
    mapped = out / "ratings_mapped.csv"
    train = out / "ratings_mapped_train.csv"
    test = out / "ratings_mapped_test.csv"
    assert mapped.exists() and train.exists() and test.exists()
    lines = mapped.read_text().strip().splitlines()
    assert lines[0] == "userId,itemId,rating"
    body = [l.split(",") for l in lines[1:]]
    assert len(body) == 5
    # ids remapped to sequential 1-based ints, sorted by user
    assert {r[0] for r in body} == {"1", "2", "3"}
    assert {r[1] for r in body} <= {"1", "2", "3"}
    n_train = len(train.read_text().strip().splitlines()) - 1
    n_test = len(test.read_text().strip().splitlines()) - 1
    assert n_train + n_test == 5
    # the produced files drive the real trainer
    from cu2rec_tpu.cli.mf import main as mf_main
    cfgp = tmp_path / "cfg.txt"
    cfgp.write_text("0 20 4 0.05 42 0.02 0.02 0.02 0.02\n")
    rc = mf_main(["-c", str(cfgp), str(train), str(train),
                  "--outdir", str(tmp_path / "outm")])
    assert rc == 0


def test_get_data_unpinned_checksum_requires_explicit_choice(tmp_path,
                                                             capsys):
    """Datasets without a pinned md5 (ml100k-classic) must not silently
    skip verification: the CLI errors unless the user passes --md5 or
    opts out loudly with --no-checksum (ADVICE r4)."""
    import hashlib
    import zipfile

    from cu2rec_tpu.cli.get_data import main as get_data

    archive = tmp_path / "ml-100k.zip"
    rows = ["7\t10\t4\t111", "3\t10\t5\t113", "3\t20\t1\t114"]
    with zipfile.ZipFile(archive, "w") as z:
        z.writestr("ml-100k/u.data", "\n".join(rows) + "\n")
    out = tmp_path / "classic"

    rc = get_data(["ml100k-classic", "--outdir", str(out),
                   "--archive", str(archive)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "no pinned checksum" in err and "--no-checksum" in err
    assert not (out / "ratings_mapped.csv").exists()

    # a user-provided md5 verifies and proceeds
    md5 = hashlib.md5(archive.read_bytes()).hexdigest()
    rc = get_data(["ml100k-classic", "--outdir", str(out),
                   "--archive", str(archive), "--md5", md5])
    assert rc == 0
    capsys.readouterr()
    assert (out / "ratings_mapped.csv").exists()


def test_predict_implicit_flag(tmp_path, data_dir, capsys):
    """ials train via mf CLI -> predict --implicit: the exact one-shot
    ridge fold-in scores the catalog (no iterations), rated items are
    filtered, and the x row matches ials_fold_in called directly."""
    import jax.numpy as jnp

    from cu2rec_tpu.cli import mf, predict
    from cu2rec_tpu.data import load_matrix, read_ratings_csv
    from cu2rec_tpu.ops.ials import ials_fold_in

    train = str(data_dir / "test_ratings.csv")
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("0 3 4 0.05 42 0.1 0.1 0.1 0.1\n")
    assert mf.main(["-c", str(cfg_path), train, train,
                    "--outdir", str(tmp_path), "--algo", "ials",
                    "--alpha", "5"]) == 0
    capsys.readouterr()

    rc = predict.main(["-c", str(cfg_path),
                       "-i", str(tmp_path / "test_ratings_f4_item_bias.csv"),
                       "-g", str(tmp_path /
                                 "test_ratings_f4_global_bias.csv"),
                       "-q", str(tmp_path / "test_ratings_f4_q.csv"),
                       str(data_dir / "test_user_ratings.csv"),
                       "--implicit", "--alpha", "5", "--reg", "0.1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Rank: 1" in out
    for line in out.splitlines():
        if line.startswith("Rank:"):
            assert int(line.split("Item:")[1].split()[0]) in (2, 4)

    # Oracle: same solve by hand.
    Q = load_matrix(str(tmp_path / "test_ratings_f4_q.csv"))
    rd = read_ratings_csv(str(data_dir / "test_user_ratings.csv"))
    x = np.asarray(ials_fold_in(
        jnp.asarray(Q, jnp.float32), rd.items[None, :],
        rd.ratings[None, :], np.ones((1, len(rd.items)), bool),
        5.0, 0.1))[0]
    scores = Q.astype(np.float32) @ x
    best = int(np.argmax(np.where(np.isin(np.arange(len(scores)),
                                          rd.items), -np.inf, scores)))
    first = [ln for ln in out.splitlines() if ln.startswith("Rank: 1")][0]
    assert int(first.split("Item:")[1].split()[0]) == best


def test_eval_cli(tmp_path, data_dir, capsys):
    """cu2rec-eval: standalone metrics for exported components — RMSE/MAE
    match the training run's final eval line; --ranking adds recall/ndcg."""
    import json as _json

    from cu2rec_tpu.cli import evaluate, mf

    train = str(data_dir / "test_ratings.csv")
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("0 60 4 0.05 42 0.02 0.02 0.02 0.02\n")
    assert mf.main(["-c", str(cfg_path), train, train,
                    "--outdir", str(tmp_path),
                    "--checkpoint", str(tmp_path / "ck.npz")]) == 0
    out = capsys.readouterr().out
    final = [ln for ln in out.splitlines()
             if ln.startswith("TEST: Iteration 60 ")][0]
    want_rmse = float(final.split("RMSE:")[1])

    # components form
    rc = evaluate.main(["-p", str(tmp_path / "test_ratings_f4_p.csv"),
                        "-q", str(tmp_path / "test_ratings_f4_q.csv"),
                        "-u", str(tmp_path / "test_ratings_f4_user_bias.csv"),
                        "-i", str(tmp_path / "test_ratings_f4_item_bias.csv"),
                        "-g", str(tmp_path /
                                  "test_ratings_f4_global_bias.csv"),
                        train, "--ranking", "--train", train])
    assert rc == 0
    out = capsys.readouterr().out
    summary = _json.loads(out.splitlines()[-1])
    # CSV export rounds to 6 decimals; tolerance reflects that.
    assert abs(summary["test_rmse"] - want_rmse) < 1e-3
    assert "RANKING: recall@5" in out
    # train==test with all items rated -> nothing unrated to recommend
    assert 0.0 <= summary["recall_at_k"] <= 1.0

    # checkpoint form agrees with the components form
    rc = evaluate.main(["--checkpoint", str(tmp_path / "ck.npz"), train])
    assert rc == 0
    out = capsys.readouterr().out
    s2 = _json.loads(out.splitlines()[-1])
    assert abs(s2["test_rmse"] - summary["test_rmse"]) < 1e-3
