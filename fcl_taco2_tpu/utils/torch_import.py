"""Import reference PyTorch checkpoints into fcl_taco2_tpu params.

The reference saves torch state dicts (chainer torch_snapshot 'model' entry
or amp_checkpoint_N.pt {'model': ...}, /root/reference/tts.py:190-198,
553-554).  Key layout follows the module tree of
nets/teacher_training/e2e_tts_tacotron2_sa.py:

    enc.embed.weight                         (V, E)
    enc.convs.{i}.0.weight                   conv (Cout, Cin, W), no bias
    enc.convs.{i}.1.{weight,bias,running_mean,running_var}   BN (if used)
    enc.blstm.{weight_ih_l{k}[,_reverse],...}     k in range(elayers)
    duration_predictor.conv.{i}.{0,2}.*      conv + LayerNorm (espnet)
    duration_predictor.linear.{weight,bias}
    pitch_predictor.conv... / energy_predictor.conv...
    pitch_embed.0.{weight,bias} / energy_embed.0.*
    dec.prenet.prenet.{i}.0.{weight,bias}
    dec.lstm.{i}.cell.{weight_ih,weight_hh,bias_ih,bias_hh}  (ZoneOutCell;
        zoneout_rate=0 stores the bare LSTMCell without the .cell prefix,
        decoder_sa.py:366-369)
    dec.feat_out.weight
    dec.postnet.postnet.{i}.{0,1}.*          conv (no bias) + BN (if used)

Transpositions: torch Linear (out,in) -> ours (in,out); torch conv
(Cout,Cin,W) -> ours (W,Cin,Cout); LSTM (4H,in) -> (in,4H).
"""

import numpy as np


def _lin(sd, key):
    return np.ascontiguousarray(np.asarray(sd[key]).T)


def _conv(sd, key):
    return np.ascontiguousarray(np.asarray(sd[key]).transpose(2, 1, 0))


def _arr(sd, key):
    return np.asarray(sd[key])


def _lstm(sd, prefix):
    if f"{prefix}.cell.weight_ih" in sd:  # ZoneOutCell wrapper
        prefix = f"{prefix}.cell"
    return {
        "wx": _lin(sd, f"{prefix}.weight_ih"),
        "wh": _lin(sd, f"{prefix}.weight_hh"),
        "bx": _arr(sd, f"{prefix}.bias_ih"),
        "bh": _arr(sd, f"{prefix}.bias_hh"),
    }


def _blstm_dir(sd, layer, sfx):
    return {
        "wx": _lin(sd, f"enc.blstm.weight_ih_l{layer}{sfx}"),
        "wh": _lin(sd, f"enc.blstm.weight_hh_l{layer}{sfx}"),
        "bx": _arr(sd, f"enc.blstm.bias_ih_l{layer}{sfx}"),
        "bh": _arr(sd, f"enc.blstm.bias_hh_l{layer}{sfx}"),
    }


def _variance(sd, prefix, n_layers):
    convs, lns = [], []
    for i in range(n_layers):
        convs.append({"kernel": _conv(sd, f"{prefix}.conv.{i}.0.weight"),
                      "bias": _arr(sd, f"{prefix}.conv.{i}.0.bias")})
        lns.append({"scale": _arr(sd, f"{prefix}.conv.{i}.2.weight"),
                    "bias": _arr(sd, f"{prefix}.conv.{i}.2.bias")})
    return {"convs": convs, "lns": lns,
            "linear": {"w": _lin(sd, f"{prefix}.linear.weight"),
                       "b": _arr(sd, f"{prefix}.linear.bias")}}


def _conv_bn_stack(sd, prefix, n_layers, use_bn=True):
    convs, bns, bn_states = [], [], []
    for i in range(n_layers):
        convs.append({"kernel": _conv(sd, f"{prefix}.{i}.0.weight")})
        if use_bn:
            bns.append({"scale": _arr(sd, f"{prefix}.{i}.1.weight"),
                        "bias": _arr(sd, f"{prefix}.{i}.1.bias")})
            bn_states.append({
                "mean": _arr(sd, f"{prefix}.{i}.1.running_mean"),
                "var": _arr(sd, f"{prefix}.{i}.1.running_var")})
    return {"convs": convs, "bns": bns}, {"bns": bn_states}


def import_reference_state_dict(sd, cfg):
    """torch state dict (tensors or arrays) -> (params, state) pytrees."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v))
          for k, v in sd.items()}

    params = {"encoder": {"embed": _arr(sd, "enc.embed.weight")}}
    state = {"encoder": {}, "decoder": {}}
    if cfg.econv_layers > 0:
        enc_convs, enc_convs_state = _conv_bn_stack(
            sd, "enc.convs", cfg.econv_layers, use_bn=cfg.use_batch_norm)
        params["encoder"]["convs"] = enc_convs
        state["encoder"]["convs"] = enc_convs_state
    if cfg.elayers > 0:
        params["encoder"]["blstm_fwd"] = _blstm_dir(sd, 0, "")
        params["encoder"]["blstm_bwd"] = _blstm_dir(sd, 0, "_reverse")
        if cfg.elayers > 1:
            params["encoder"]["blstm_extra"] = [
                {"fwd": _blstm_dir(sd, k, ""),
                 "bwd": _blstm_dir(sd, k, "_reverse")}
                for k in range(1, cfg.elayers)]
    params["duration_predictor"] = _variance(sd, "duration_predictor",
                                             cfg.duration_predictor_layers)

    dec = {"feat_out": {"w": _lin(sd, "dec.feat_out.weight")}}
    if cfg.prenet_layers > 0:
        dec["prenet"] = {"layers": [
            {"w": _lin(sd, f"dec.prenet.prenet.{i}.0.weight"),
             "b": _arr(sd, f"dec.prenet.prenet.{i}.0.bias")}
            for i in range(cfg.prenet_layers)]}
    for i in range(cfg.dlayers):
        dec[f"lstm{i}"] = _lstm(sd, f"dec.lstm.{i}")
    if cfg.postnet_layers > 0:
        post_convs, post_state = _conv_bn_stack(
            sd, "dec.postnet.postnet", cfg.postnet_layers,
            use_bn=cfg.use_batch_norm)
        dec["postnet"] = post_convs
        state["decoder"]["postnet"] = post_state
    params["decoder"] = dec
    if cfg.use_fe_condition:
        params["pitch_predictor"] = _variance(sd, "pitch_predictor",
                                              cfg.pitch_predictor_layers)
        params["energy_predictor"] = _variance(sd, "energy_predictor",
                                               cfg.energy_predictor_layers)
        params["pitch_embed"] = {
            "kernel": _conv(sd, "pitch_embed.0.weight"),
            "bias": _arr(sd, "pitch_embed.0.bias")}
        params["energy_embed"] = {
            "kernel": _conv(sd, "energy_embed.0.weight"),
            "bias": _arr(sd, "energy_embed.0.bias")}
    return params, state


def load_reference_checkpoint(path, cfg):
    """Load a reference snapshot/amp-checkpoint file via torch.load."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        payload = payload["model"]  # amp checkpoint layout (tts.py:190-198)
    # strip a possible DataParallel 'module.' prefix
    sd = {(k[7:] if k.startswith("module.") else k): v
          for k, v in payload.items()}
    return import_reference_state_dict(sd, cfg)


def export_reference_state_dict(params, state, cfg):
    """Inverse mapping (ours -> torch layout), for tests and tooling."""
    sd = {}

    def lin(key, w):
        sd[key] = np.ascontiguousarray(np.asarray(w).T)

    def conv(key, k):
        sd[key] = np.ascontiguousarray(np.asarray(k).transpose(2, 1, 0))

    def conv_bn_stack(prefix, p, st):
        for i, c in enumerate(p["convs"]):
            conv(f"{prefix}.{i}.0.weight", c["kernel"])
            if cfg.use_batch_norm:
                sd[f"{prefix}.{i}.1.weight"] = np.asarray(
                    p["bns"][i]["scale"])
                sd[f"{prefix}.{i}.1.bias"] = np.asarray(p["bns"][i]["bias"])
                sd[f"{prefix}.{i}.1.running_mean"] = np.asarray(
                    st["bns"][i]["mean"])
                sd[f"{prefix}.{i}.1.running_var"] = np.asarray(
                    st["bns"][i]["var"])

    def blstm_dir(layer, sfx, pp):
        lin(f"enc.blstm.weight_ih_l{layer}{sfx}", pp["wx"])
        lin(f"enc.blstm.weight_hh_l{layer}{sfx}", pp["wh"])
        sd[f"enc.blstm.bias_ih_l{layer}{sfx}"] = np.asarray(pp["bx"])
        sd[f"enc.blstm.bias_hh_l{layer}{sfx}"] = np.asarray(pp["bh"])

    enc = params["encoder"]
    sd["enc.embed.weight"] = np.asarray(enc["embed"])
    if cfg.econv_layers > 0:
        conv_bn_stack("enc.convs", enc["convs"], state["encoder"]["convs"])
    if cfg.elayers > 0:
        blstm_dir(0, "", enc["blstm_fwd"])
        blstm_dir(0, "_reverse", enc["blstm_bwd"])
        for k, layer in enumerate(enc.get("blstm_extra", []), start=1):
            blstm_dir(k, "", layer["fwd"])
            blstm_dir(k, "_reverse", layer["bwd"])

    def variance(prefix, p):
        for i, (c, ln) in enumerate(zip(p["convs"], p["lns"])):
            conv(f"{prefix}.conv.{i}.0.weight", c["kernel"])
            sd[f"{prefix}.conv.{i}.0.bias"] = np.asarray(c["bias"])
            sd[f"{prefix}.conv.{i}.2.weight"] = np.asarray(ln["scale"])
            sd[f"{prefix}.conv.{i}.2.bias"] = np.asarray(ln["bias"])
        lin(f"{prefix}.linear.weight", p["linear"]["w"])
        sd[f"{prefix}.linear.bias"] = np.asarray(p["linear"]["b"])

    variance("duration_predictor", params["duration_predictor"])
    if cfg.use_fe_condition:
        variance("pitch_predictor", params["pitch_predictor"])
        variance("energy_predictor", params["energy_predictor"])
        conv("pitch_embed.0.weight", params["pitch_embed"]["kernel"])
        sd["pitch_embed.0.bias"] = np.asarray(params["pitch_embed"]["bias"])
        conv("energy_embed.0.weight", params["energy_embed"]["kernel"])
        sd["energy_embed.0.bias"] = np.asarray(
            params["energy_embed"]["bias"])

    dec = params["decoder"]
    if cfg.prenet_layers > 0:
        for i, layer in enumerate(dec["prenet"]["layers"]):
            lin(f"dec.prenet.prenet.{i}.0.weight", layer["w"])
            sd[f"dec.prenet.prenet.{i}.0.bias"] = np.asarray(layer["b"])
    cell = ".cell" if cfg.zoneout_rate > 0.0 else ""
    for i in range(cfg.dlayers):
        pp = dec[f"lstm{i}"]
        lin(f"dec.lstm.{i}{cell}.weight_ih", pp["wx"])
        lin(f"dec.lstm.{i}{cell}.weight_hh", pp["wh"])
        sd[f"dec.lstm.{i}{cell}.bias_ih"] = np.asarray(pp["bx"])
        sd[f"dec.lstm.{i}{cell}.bias_hh"] = np.asarray(pp["bh"])
    lin("dec.feat_out.weight", dec["feat_out"]["w"])
    if cfg.postnet_layers > 0:
        conv_bn_stack("dec.postnet.postnet", dec["postnet"],
                      state["decoder"]["postnet"])
    return sd
