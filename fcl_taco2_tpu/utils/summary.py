"""Model-size reporting: per-submodule trainable parameter counts.

The reference prints exact per-module parameter counts at model
construction (/root/reference/nets/teacher_training/
e2e_tts_tacotron2_sa.py:483-517 and …_kd_student.py:625-670), which is how
the paper's teacher-vs-student size comparison is produced.  Same report
here, derived from the param pytree.
"""

import jax
import numpy as np


def param_counts(params):
    """{top-level submodule: #params} plus 'total' (BN running stats live
    in the separate state pytree and are not counted, matching torch's
    requires_grad=True set)."""
    counts = {}
    for name, sub in params.items():
        counts[name] = int(sum(
            np.prod(x.shape) for x in jax.tree_util.tree_leaves(sub)))
    counts["total"] = sum(counts.values())
    return counts


def format_param_report(params, title="model"):
    counts = param_counts(params)
    total = counts.pop("total")
    lines = [f"{title} parameters:"]
    for name in sorted(counts):
        lines.append(f"  {name:<22s} {counts[name]:>12,d}")
    lines.append(f"  {'TOTAL':<22s} {total:>12,d}  "
                 f"({total * 4 / 2 ** 20:.1f} MB fp32)")
    return "\n".join(lines)
