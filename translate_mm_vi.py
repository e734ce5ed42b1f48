#!/usr/bin/env python
"""Root shim mirroring the reference's ``translate_mm_vi.py`` entry point."""
from variational_mmt_tpu.cli.translate import main

if __name__ == "__main__":
    main()
