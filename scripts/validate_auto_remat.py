"""On-chip validation of ``training.remat: auto`` (train/loop.AutoRematStep).

Builds a synthetic 30 s dataset and runs the REAL train driver with the
wavlm-large preset at batch 8 — the configuration measured to exceed HBM
without gradient checkpointing (17.80 vs 15.75 GB,
docs/TPU_RUNS_r05_capacity.log). Expected behavior: the non-remat step
fails at compile, AutoRematStep prints the fallback warning, rebuilds
with remat, and training completes max_steps.

Usage: nohup python scripts/validate_auto_remat.py > /tmp/auto_remat.log &
(never SIGTERM mid-compile on the axon relay). ~10-15 min of chip time
(one failed + one successful wavlm-large compile).
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WORK = "/tmp/auto_remat_chip"
SR = 16000
DUR = 30.0


def main():
    import yaml
    from wfl_asr_tpu.data.audio import write_wav
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    from wfl_asr_tpu.train.loop import train

    data_dir = os.path.join(WORK, "data")
    os.makedirs(os.path.join(data_dir, "en"), exist_ok=True)
    rng = np.random.RandomState(0)
    n = int(SR * DUR)
    for i in range(10):
        y = (np.sin(np.linspace(0, 800 + 60 * i, n)) * 0.4
             + rng.randn(n) * 0.02).astype(np.float32)
        write_wav(os.path.join(data_dir, "en", f"u{i}.wav"), y, SR)
        with open(os.path.join(data_dir, "en", f"u{i}.lab"), "w") as f:
            t = 0
            for j, ph in enumerate(["SP", "aa", "ee", "oo"] * 7):
                e = t + int(1e7 * (0.8 + 0.1 * ((i + j) % 3)))
                f.write(f"{t} {min(e, int(DUR * 1e7))} {ph}\n")
                t = e
                if t >= DUR * 1e7:
                    break

    save_dir = os.path.join(WORK, "out")
    cfg = yaml.safe_load(open("/root/reference/config.yaml"))
    cfg["data"].update({"data_dir": data_dir, "num_val_files": 1})
    cfg["output"]["save_dir"] = save_dir
    cfg["model"].update({"encoder_type": "wavlm",
                         "wavlm_model": "microsoft/wavlm-large",
                         "num_languages": 0})
    cfg["training"].update({
        "log_dir": os.path.join(WORK, "logs"),
        "batch_size": 8, "max_steps": 2, "val_check_interval": 50,
        "num_workers": 0, "seed": 0, "compute_dtype": "bfloat16",
        "remat": "auto",
    })
    run_preprocess(data_dir, cfg)
    train(os.path.join(save_dir, "config.yaml"))
    print("AUTO-REMAT VALIDATION OK: driver completed max_steps after the "
          "fallback (check the [WARN] line above for the flip)", flush=True)


if __name__ == "__main__":
    main()
