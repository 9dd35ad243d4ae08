#!/usr/bin/env python
"""Drop-in CLI shim for the reference's ``python correct_label.py <path>``."""
from wfl_asr_tpu.correct_label import main

if __name__ == "__main__":
    main()
