"""PWG vocoder: shapes, upsampling factor, importer roundtrip, CLI."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.vocoder.pwg import (PWGConfig, import_pwg_state_dict,
                                       pwg_generate, pwg_init, upsample_mel)


def small_cfg():
    return PWGConfig(layers=6, stacks=2, residual_channels=8,
                     gate_channels=16, skip_channels=8, aux_channels=10,
                     upsample_scales=(2, 2), aux_context_window=1)


def test_generate_shapes_and_hop():
    cfg = small_cfg()
    assert cfg.hop == 4
    params = pwg_init(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((2, 12, cfg.aux_channels))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 12 * cfg.hop))
    wav = pwg_generate(params, cfg, mel, noise)
    assert wav.shape == (2, 48)
    assert np.isfinite(np.asarray(wav)).all()


def test_upsample_is_time_aligned():
    """Constant mel -> constant upsampled conditioning (smoothing convs
    average a constant to itself)."""
    cfg = small_cfg()
    params = pwg_init(jax.random.PRNGKey(0), cfg)
    mel = jnp.ones((1, 8, cfg.aux_channels))
    up = np.asarray(upsample_mel(params, cfg, mel))
    assert up.shape == (1, 32, cfg.aux_channels)
    mid = up[0, 10:-10]  # boundary halo: conv_in edge + smoothing convs
    dev = float(np.abs(mid - mid[0:1]).max())
    assert dev < 1e-5, f"interior not constant, max dev {dev}"


def test_import_official_layout_roundtrip():
    """Build a torch-layout state dict with the official key names and
    check the importer consumes it and generation runs."""
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    sd = {
        "first_conv.weight": rng.normal(size=(8, 1, 1)).astype(np.float32),
        "first_conv.bias": rng.normal(size=(8,)).astype(np.float32),
        "upsample_net.conv_in.weight": rng.normal(
            size=(10, 10, 3)).astype(np.float32),
        "last_conv_layers.1.weight": rng.normal(
            size=(8, 8, 1)).astype(np.float32),
        "last_conv_layers.1.bias": rng.normal(size=(8,)).astype(np.float32),
        "last_conv_layers.3.weight": rng.normal(
            size=(1, 8, 1)).astype(np.float32),
        "last_conv_layers.3.bias": rng.normal(size=(1,)).astype(np.float32),
    }
    for i, s in enumerate(cfg.upsample_scales):
        sd[f"upsample_net.upsample.up_layers.{2 * i + 1}.weight"] = \
            rng.normal(size=(1, 1, 1, 2 * s + 1)).astype(np.float32)
    for i in range(cfg.layers):
        sd[f"conv_layers.{i}.conv.weight"] = rng.normal(
            size=(16, 8, 3)).astype(np.float32)
        sd[f"conv_layers.{i}.conv.bias"] = rng.normal(
            size=(16,)).astype(np.float32)
        sd[f"conv_layers.{i}.conv1x1_aux.weight"] = rng.normal(
            size=(16, 10, 1)).astype(np.float32)
        sd[f"conv_layers.{i}.conv1x1_out.weight"] = rng.normal(
            size=(8, 8, 1)).astype(np.float32)
        sd[f"conv_layers.{i}.conv1x1_out.bias"] = rng.normal(
            size=(8,)).astype(np.float32)
        sd[f"conv_layers.{i}.conv1x1_skip.weight"] = rng.normal(
            size=(8, 8, 1)).astype(np.float32)
        sd[f"conv_layers.{i}.conv1x1_skip.bias"] = rng.normal(
            size=(8,)).astype(np.float32)
    params = import_pwg_state_dict(sd, cfg)
    mel = jnp.zeros((1, 6, cfg.aux_channels))
    wav = pwg_generate(params, cfg, mel,
                       jax.random.normal(jax.random.PRNGKey(0), (1, 24)))
    assert wav.shape == (1, 24)


def test_vocode_cli(tmp_path):
    """feats.scp (from the ark writer) -> wav files via the CLI."""
    from cli import fcl_vocode
    from fcl_taco2_tpu.infer.ark import ArkScpWriter

    rng = np.random.default_rng(0)
    ark = os.path.join(str(tmp_path), "feats.ark")
    scp = os.path.join(str(tmp_path), "feats.scp")
    with ArkScpWriter(ark, scp) as w:
        w.write("utt1", rng.normal(size=(7, 80)).astype(np.float32))
    out = os.path.join(str(tmp_path), "wavs")
    fcl_vocode.main(["--feats-scp", scp, "--outdir", out])
    import wave
    with wave.open(os.path.join(out, "utt1.wav")) as f:
        assert f.getframerate() == 22050
        assert f.getnframes() == 7 * 256


def test_streaming_kernel_matches_full():
    """Fused streaming Pallas vocoder (interpret mode): exact match with
    the full conv graph over the WHOLE utterance, tail included (each
    layer's stream is masked to the graph's zero padding on both edges,
    pwg_pallas.py docstring)."""
    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.vocoder.pwg import PWGConfig, pwg_generate, pwg_init
    from fcl_taco2_tpu.vocoder.pwg_pallas import pwg_generate_streaming

    cfg = PWGConfig(layers=6, stacks=2, residual_channels=8,
                    gate_channels=16, skip_channels=8, aux_channels=5,
                    upsample_scales=(2, 2))
    params = pwg_init(jax.random.PRNGKey(0), cfg)
    B, Tm = 2, 30
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(B, Tm, 5)).astype(np.float32))
    noise = jnp.asarray(
        rng.normal(size=(B, Tm * cfg.hop)).astype(np.float32))
    want = np.asarray(pwg_generate(params, cfg, mel, noise))
    got = np.asarray(pwg_generate_streaming(params, cfg, mel, noise,
                                            tile=16, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vocode_dispatch_cpu_uses_exact_chunked():
    """vocode(backend='auto') falls back to the chunked XLA path off TPU:
    exact vs the full conv graph in the interior; the first/last
    ~receptive-field samples follow the static-pad convention (the
    zero-noise pad region carries first_conv bias where the full graph's
    implicit 'same' padding is literal zeros) and are only bounded."""
    import jax
    import jax.numpy as jnp

    from fcl_taco2_tpu.vocoder.pwg import PWGConfig, pwg_generate, pwg_init
    from fcl_taco2_tpu.vocoder.pwg_pallas import total_delay, vocode

    cfg = PWGConfig(layers=6, stacks=2, residual_channels=8,
                    gate_channels=16, skip_channels=8, aux_channels=5,
                    upsample_scales=(2, 2))
    params = pwg_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(2, 40, 5)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 160)).astype(np.float32))
    want = np.asarray(pwg_generate(params, cfg, mel, noise))
    got = np.asarray(vocode(params, cfg, mel, noise, backend="auto"))
    rf = 2 * total_delay(cfg) + 8 * cfg.hop  # conv + mel-grid reach
    np.testing.assert_allclose(got[:, rf:-rf], want[:, rf:-rf], atol=1e-5)
    assert np.abs(got - want).max() < 0.1 * np.abs(want).max() + 1e-3
