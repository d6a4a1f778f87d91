"""Multi-process ("multi-host") smoke test: two CPU processes × 2 devices
each form one 4-device mesh and train through the ShardedEngine — the
multi-host test mode SURVEY §4 calls for.  Runs real
``jax.distributed.initialize`` over localhost."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["CU2REC_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["RANK"]),
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import numpy as np
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    from cu2rec_tpu.parallel.sharded import ShardedEngine, make_mesh
    from cu2rec_tpu.train.trainer import train
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.metrics import MetricsLogger

    rd = read_ratings_csv(os.path.join(os.environ["CU2REC_REPO"],
                                       "tests/data/test_ratings.csv"))
    csr = build_csr(rd)
    cfg = Config(total_iterations=10, n_factors=4, learning_rate=0.05,
                 check_error=5)
    engine = ShardedEngine(csr, csr, cfg, mesh=make_mesh(4, 1))
    model, losses = train(csr, csr, cfg, rd.global_bias,
                          logger=MetricsLogger(verbose=False),
                          engine=engine)
    assert losses[10] <= losses[1] * 1.5
    print(f"RANK{os.environ['RANK']} OK {losses[10]:.5f}")
""")


@pytest.mark.skipif(os.environ.get("CU2REC_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.join(os.path.dirname(__file__), os.pardir)

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ, COORD=coord, RANK=str(rank),
                   CU2REC_REPO=os.path.abspath(repo))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank} OK" in out
