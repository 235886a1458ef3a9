#!/usr/bin/env python
"""Launcher for spmv_tpu.demos.demo_eig (source-checkout convenience;
the installed console script is `spmv-demo-eig`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spmv_tpu.demos.demo_eig import main

if __name__ == "__main__":
    sys.exit(main())
