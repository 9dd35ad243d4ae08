#!/usr/bin/env python
"""Drop-in CLI shim for the reference's ``python preprocess.py`` surface."""
from wfl_asr_tpu.preprocess import main

if __name__ == "__main__":
    main()
