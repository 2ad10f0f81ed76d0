"""FCL-taco2-TPU: a TPU-native JAX/XLA/Pallas rebuild of FCL-taco2.

A phoneme-level semi-autoregressive Tacotron2 TTS framework (ICASSP 2021
"FCL-taco2: Towards Fast, Controllable and Lightweight Text-to-Speech
synthesis") rebuilt TPU-first:

- all recurrences are ``lax.scan`` with static, bucketed shapes
- the per-phoneme frame regrouping is index-based device gathers
  (host builds int32 plans, no per-phoneme Python loops)
- training is a single jitted step, data-parallel over a
  ``jax.sharding.Mesh``
- knowledge distillation (teacher -> student) runs teacher and student in
  one jitted step with ``stop_gradient`` on the teacher.

Reference behavior parity is documented per-module with file:line citations
into the upstream repo (mounted at /root/reference).
"""

__version__ = "0.1.0"
