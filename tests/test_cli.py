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
