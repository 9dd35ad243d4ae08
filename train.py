#!/usr/bin/env python
"""Drop-in CLI shim for the reference's ``python train.py config.yaml``."""
from wfl_asr_tpu.train.loop import main

if __name__ == "__main__":
    main()
