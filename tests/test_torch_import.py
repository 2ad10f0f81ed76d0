"""Torch checkpoint import: roundtrip through the reference key layout."""

import numpy as np
import jax

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.utils.torch_import import (export_reference_state_dict,
                                              import_reference_state_dict,
                                              load_reference_checkpoint)

from helpers import tiny_config


def test_state_dict_roundtrip():
    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)
    state = jax.tree_util.tree_map(np.asarray, state)

    sd = export_reference_state_dict(params, state, cfg)
    # reference-layout sanity: ZoneOutCell nesting, Sequential indices
    assert "dec.lstm.0.cell.weight_ih" in sd
    assert "enc.convs.0.1.running_mean" in sd
    assert "duration_predictor.conv.0.2.weight" in sd
    assert sd["dec.feat_out.weight"].shape == (
        cfg.odim, cfg.eunits + cfg.dunits)

    p2, s2 = import_reference_state_dict(sd, cfg)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path((params, state)),
            jax.tree_util.tree_leaves_with_path((p2, s2))):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


def test_load_checkpoint_file_with_amp_layout(tmp_path):
    """amp_checkpoint files wrap the state dict as {'model': sd}
    (tts.py:190-198); DataParallel 'module.' prefixes are stripped."""
    import torch

    cfg = tiny_config()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)
    state = jax.tree_util.tree_map(np.asarray, state)
    sd = export_reference_state_dict(params, state, cfg)
    sd_t = {"module." + k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}
    path = str(tmp_path / "amp_checkpoint_100.pt")
    torch.save({"model": sd_t, "optimizer": {}, "amp": {}}, path)

    p2, s2 = load_reference_checkpoint(path, cfg)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(p2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
