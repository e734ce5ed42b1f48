#!/usr/bin/env python
"""Root shim mirroring the reference's ``preprocess.py`` entry point."""
from variational_mmt_tpu.cli.preprocess import main

if __name__ == "__main__":
    main()
