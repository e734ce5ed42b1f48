#!/usr/bin/env python
"""Root shim mirroring the reference's ``train_mm_vi_model1.py`` entry point
(VMMT training; use -model_type nmt for the text-only baseline)."""
from variational_mmt_tpu.cli.train import main

if __name__ == "__main__":
    main()
