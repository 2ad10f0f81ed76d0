"""Back-compat shims: the CLI implementation lives in the installable
package (fcl_taco2_tpu.cli); `pip install -e .` exposes fcl-train,
fcl-synth, ... console scripts (pyproject.toml).  These keep the
documented `python cli/fcl_train.py ...` checkout invocations and
`from cli import fcl_x` imports working."""
