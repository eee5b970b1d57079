#!/usr/bin/env python3
"""Drop-in replacement for the reference MiSTIPlot.py (see misti_tpu.cli.mistiplot)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from misti_tpu.cli.mistiplot import main

if __name__ == "__main__":
    sys.exit(main())
