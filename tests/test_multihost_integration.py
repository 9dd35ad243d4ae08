"""Real 2-process multi-host training integration test.

Spawns two OS processes that join one jax.distributed cluster (local
coordinator, 2 virtual CPU devices each → a 4-device global mesh) and run
the FULL ``train()`` driver end to end — exercising the code paths that
only execute with ``jax.process_count() > 1`` and that a single-process
test can never reach (SURVEY.md §2 "Communication backend"):

- cluster join via ``maybe_initialize_distributed`` from generic
  JAX_COORDINATOR_ADDRESS / JAX_PROCESS_COUNT / JAX_PROCESS_ID env vars,
- per-process file shards + per-process batch slices,
- dataset-wide pinned collate shapes (audio, labels, AND offset targets),
- global-array assembly (``make_array_from_process_local_data``) feeding
  the sharded train step (Gloo collectives on CPU),
- cross-host resume-decision agreement,
- process-0-only checkpoint/log writes.

The end assertion is bit-identical final params across processes — a
desync (different trip counts, unsynced grads) cannot pass it.
"""

import os
import socket
import subprocess
import sys
import random as pyrandom

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_end_to_end(tmp_path):
    from tests.test_preprocess import make_config, make_fixture_dataset
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess

    rng = pyrandom.Random(11)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=12)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 2
    config["model"].update({"encoder_type": "none",
                            "num_conformer_layers": 1,
                            "lang_emb_dim": 8})
    config["training"].update({
        # global batch 4 over a 2-host × 2-device mesh → local batch 2,
        # 2 rows per device; 10 train files shard 5/5 per process.
        "batch_size": 4, "max_steps": 3, "val_check_interval": 2,
        "seed": 0, "data_parallel": True,
        "optimizer": "adamw", "learning_rate": 1e-3,
        "scheduler": "ConstantLR",
    })
    run_preprocess(data_dir, config)
    cfg_path = os.path.join(save_dir, "config.yaml")

    port = _free_port()
    base_env = os.environ.copy()
    base_env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_PROCESS_COUNT": "2",
    })
    base_env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    base_env["PYTHONPATH"] = repo_root + os.pathsep + \
        base_env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        env = dict(base_env, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, cfg_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(WORKER))))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {pid} failed:\n{out[-4000:]}"

    # multi-host input feeding actually engaged, with ALL shapes pinned
    for pid, out in enumerate(outs):
        assert f"Multi-host input: process {pid}/2" in out
        assert "targets" in [l for l in out.splitlines()
                             if "Multi-host input" in l][0]

    # every process saw the same validation metrics (identical inputs +
    # synced params ⇒ identical local eval)
    vals = [[l for l in out.splitlines() if "[Validation]" in l]
            for out in outs]
    assert vals[0] and vals[0] == vals[1]

    # bit-identical final params across processes
    digests = []
    for out in outs:
        done = [l for l in out.splitlines() if l.startswith("WORKER_DONE")]
        assert len(done) == 1
        digests.append(done[0].split("params_l1=")[1])
    assert digests[0] == digests[1]

    # process-0-only writes: checkpoints exist exactly once (shared dir)
    assert os.path.exists(os.path.join(save_dir, "last_model.pt"))
    saved = [l for out in outs for l in out.splitlines()
             if "Saved best model" in l]
    # only process 0 prints/saves
    assert saved and all("Saved best model" not in l
                         for l in outs[1].splitlines())


def test_two_process_sharded_validation(tmp_path):
    """training.sharded_validation: each process evaluates a DISJOINT
    shard of the val set and the metric sums are allgather-reduced — both
    hosts must derive identical global metrics from different local
    inputs (the property that keeps plateau-style schedulers in sync)."""
    from tests.test_preprocess import make_config, make_fixture_dataset
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess

    rng = pyrandom.Random(23)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=11)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 3   # odd → uneven shards (2/1)
    config["model"].update({"encoder_type": "none",
                            "num_conformer_layers": 1,
                            "lang_emb_dim": 8})
    config["training"].update({
        "batch_size": 4, "max_steps": 2, "val_check_interval": 2,
        "seed": 0, "data_parallel": True, "sharded_validation": True,
        "optimizer": "adamw", "learning_rate": 1e-3,
        "scheduler": "ConstantLR",
    })
    run_preprocess(data_dir, config)
    cfg_path = os.path.join(save_dir, "config.yaml")

    port = _free_port()
    base_env = os.environ.copy()
    base_env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_PROCESS_COUNT": "2",
    })
    base_env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    base_env["PYTHONPATH"] = repo_root + os.pathsep + \
        base_env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        env = dict(base_env, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, cfg_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(WORKER))))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {pid} failed:\n{out[-4000:]}"

    # sharding engaged with disjoint shards covering the whole val set
    assert "Sharded validation: process 0 evaluates 2/3" in outs[0]
    assert "Sharded validation: process 1 evaluates 1/3" in outs[1]

    # identical global metrics from DIFFERENT local inputs — this is the
    # allgather reduction working, not merely identical local compute
    vals = [[l for l in out.splitlines() if "[Validation]" in l]
            for out in outs]
    assert vals[0] and vals[0] == vals[1]
    # sanity: the shared line carries a real token-weighted loss
    line = vals[0][0]
    loss = float(line.split("Loss:")[1].split("|")[0])
    assert 0.0 < loss < 100.0
