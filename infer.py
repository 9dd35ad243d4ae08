#!/usr/bin/env python
"""Drop-in CLI shim for the reference's ``python infer.py PATH -ckpt ... -c ...``."""
from wfl_asr_tpu.infer.cli import main

if __name__ == "__main__":
    main()
