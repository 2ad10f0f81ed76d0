"""Finetuning: partial init from checkpoints + module freezing.

Reference parity: ``--enc-init``/``--dec-init`` (+ ``*-init-mods``) build
the model through espnet's ``load_trained_modules``, copying matching
module subtrees from a pretrained snapshot (/root/reference/tts.py:353-355,
tts_train.py:258-281); ``--freeze-mods`` marks matching params
``requires_grad=False`` and filters them out of the optimizer AND the
grad-norm clip (/root/reference/tts.py:380-393).

TPU-native shape: params are a pytree, so module selection is path-prefix
matching over flattened tree paths, and freezing is an optax mask that
zeroes frozen updates — applied BEFORE the global-norm clip (so the norm
covers exactly the trainable set, like the reference's filtered
``model_params``) and again AFTER the core transform (so adamw's weight
decay cannot move frozen params either).

Module names use the pytree keys (``encoder``, ``decoder``,
``duration_predictor``, ...; nest with ``.`` or ``/``). The reference's
torch attribute names ``enc``/``dec`` are accepted as aliases so
reference yaml/CLI strings like ``--freeze-mods enc.`` work unchanged.
"""

from typing import List, Sequence, Tuple

import jax
import numpy as np
from flax import serialization

_ALIASES = {"enc": "encoder", "dec": "decoder"}


def normalize_mod(mod: str) -> str:
    """``"enc."`` -> ``"encoder"``, ``"dec.lstm0"`` -> ``"decoder/lstm0"``."""
    mod = mod.strip().strip(".").strip("/").replace(".", "/")
    if not mod:
        raise ValueError("empty module prefix")
    head, sep, rest = mod.partition("/")
    return _ALIASES.get(head, head) + sep + rest


def _path_str(path) -> str:
    parts = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            parts.append(str(k.key))
        elif isinstance(k, jax.tree_util.SequenceKey):
            parts.append(str(k.idx))
        else:  # GetAttrKey / FlattenedIndexKey
            parts.append(str(getattr(k, "name", getattr(k, "key", k))))
    return "/".join(parts)


def _matches(path: str, prefixes: Sequence[str]) -> bool:
    return any(path == p or path.startswith(p + "/") for p in prefixes)


def freeze_mask_fn(freeze_mods: Sequence[str]):
    """Callable params -> bool pytree (True = frozen), for optax.masked."""
    prefixes = [normalize_mod(m) for m in freeze_mods]

    def mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: _matches(_path_str(p), prefixes), params)

    return mask


def frozen_paths(params, freeze_mods: Sequence[str]) -> List[str]:
    """The leaf paths a freeze spec selects (for logging; tts.py:388)."""
    prefixes = [normalize_mod(m) for m in freeze_mods]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [_path_str(p) for p, _ in flat if _matches(_path_str(p), prefixes)]


def _copy_matching(dst: dict, src: dict, prefixes, at: str, copied: list):
    """Recursively copy src leaves into dst under matched prefixes.

    Both trees are in flax state-dict form (nested string-keyed dicts,
    numpy-able leaves). A matched leaf missing from src or with a
    different shape raises — espnet silently skips mismatches
    (asr_utils filter by shape); loud is safer for a from-scratch stack.
    """
    for key, val in dst.items():
        path = f"{at}/{key}" if at else key
        if isinstance(val, dict):
            sub = src.get(key) if isinstance(src, dict) else None
            _copy_matching(val, sub if isinstance(sub, dict) else {},
                           prefixes, path, copied)
            continue
        if not _matches(path, prefixes):
            continue
        if not isinstance(src, dict) or key not in src:
            raise KeyError(
                f"checkpoint has no value for selected param {path!r}")
        new = np.asarray(src[key])
        old = np.asarray(val)
        if new.shape != old.shape:
            raise ValueError(
                f"shape mismatch for {path!r}: checkpoint "
                f"{new.shape} vs model {old.shape}")
        dst[key] = new.astype(old.dtype)
        copied.append(path)


def load_partial(params, model_state, ckpt_path: str,
                 mods: Sequence[str]) -> Tuple[dict, dict, List[str]]:
    """Copy the ``mods`` subtrees of a checkpoint into (params, state).

    The reference path: ``load_trained_modules`` copies matching,
    shape-equal tensors from ``torch_load(enc_init)`` into the fresh
    model (tts.py:353-355). Model state (BN running stats) rides along
    for the same prefixes — torch keeps those in the same state_dict.

    Returns (params, model_state, copied_leaf_paths); raises if a prefix
    selects nothing (typo guard).
    """
    from fcl_taco2_tpu.train.checkpoint import restore_checkpoint
    prefixes = [normalize_mod(m) for m in mods]
    payload, _, _ = restore_checkpoint(ckpt_path)

    dst_p = serialization.to_state_dict(params)
    dst_s = serialization.to_state_dict(model_state)
    copied: List[str] = []
    _copy_matching(dst_p, payload["params"], prefixes, "", copied)
    n_params = len(copied)
    _copy_matching(dst_s, payload.get("model_state", {}), prefixes, "",
                   copied)
    if n_params == 0:
        raise ValueError(
            f"init mods {list(mods)!r} matched no parameters; available "
            f"top-level modules: {sorted(dst_p)}")
    params = serialization.from_state_dict(params, dst_p)
    model_state = serialization.from_state_dict(model_state, dst_s)
    return params, model_state, copied
