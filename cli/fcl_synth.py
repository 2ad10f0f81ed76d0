#!/usr/bin/env python3
"""Shim -> fcl_taco2_tpu.cli.fcl_synth (console script: fcl-synth)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcl_taco2_tpu.cli.fcl_synth import *  # noqa: F401,F403,E402
from fcl_taco2_tpu.cli.fcl_synth import main  # noqa: F401,E402

if __name__ == "__main__":
    main()
