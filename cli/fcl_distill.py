#!/usr/bin/env python3
"""Shim -> fcl_taco2_tpu.cli.fcl_distill (used via fcl-train --perform-KD)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fcl_taco2_tpu.cli.fcl_distill import *  # noqa: F401,F403,E402
from fcl_taco2_tpu.cli.fcl_distill import run_kd_training  # noqa: F401,E402
