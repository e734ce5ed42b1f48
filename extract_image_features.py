#!/usr/bin/env python
"""Root shim mirroring the reference lineage's ``extract_image_features.py``."""
from variational_mmt_tpu.cli.extract_features import main

if __name__ == "__main__":
    main()
