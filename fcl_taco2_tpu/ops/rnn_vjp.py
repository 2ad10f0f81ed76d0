"""Custom-VJP teacher-forced zoneout-LSTM scan — the training hot path.

XLA's autodiff of the decoder scan ("strategy A" in results/
PALLAS_decoder.json train_kernel_roofline) transposes the scan and
read-modify-writes the (3H, 4H) fp32 weight-gradient accumulators in HBM on
EVERY step: measured 19.85 ms backward at B=16 against a 10.07 ms analytic
bound (68.16 vs 16.79 ms at B=64).  This module implements "strategy B"
from that roofline, pure XLA:

- the forward scan saves the ACTIVATED gates and the (h, c) sequences
  (O(S·P·6H) per layer, bf16 under the mixed-precision policy);
- the backward is a reverse ``lax.scan`` that carries only (dh, dc) per
  layer and streams per-step PRE-activation gate gradients;
- every weight gradient is then ONE post-scan batched GEMM over the saved
  activations (dW = acts^T @ dgates flattened over all S·P step-rows),
  so no gradient accumulator ever round-trips HBM inside the loop.

Step-invariant hoists mirror the forward (models/decoder.py): the
``out_t = h_last @ wf_z`` projection moves OUT of the forward scan (one
(S·P, H) GEMM over the saved h), and its cotangent ``douts @ wf_z^T`` is
hoisted before the reverse scan.

The reference runs this loop under torch autograd, re-invoking LSTMCell's
CUDA kernels per step (/root/reference/nets/modules/decoder_sa.py:493-513);
its backward is whatever autograd records.  Here the backward is hand-built
to the HBM roofline.

Gate packing is torch order (i, f, g, o) throughout, matching ops/rnn.py.
Zoneout keep-masks are recomputed in the backward from the same per-step
uint32 keys (ops/rnn.zoneout_keep_masks is deterministic) instead of saved.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fcl_taco2_tpu.ops.rnn import zoneout_keep_masks


class ScanSpec(NamedTuple):
    """Static (hashable) configuration of one teacher-forced scan."""
    dlayers: int
    dunits: int
    zoneout_rate: float
    zoneout_impl: str  # 'rbg' | 'threefry'
    train: bool
    capture_kd: bool
    append_position: bool
    use_enc_out: bool  # enc_out operand present (cfg.use_concate)
    unroll: int = 1    # lax.scan unroll for BOTH scans: with the dW
    #                    GEMMs post-scan, unrolling no longer multiplies
    #                    weight-gradient accumulator traffic (the reason
    #                    unroll>1 lost under autodiff — CLAUDE.md perf
    #                    notes), it only amortizes loop overhead


def _use_zoneout(spec):
    return spec.zoneout_rate > 0.0


def _split4(gates):
    return jnp.split(gates, 4, axis=-1)


def _f32(*operands, out_dtype, subscripts):
    """Batched GEMM with fp32 accumulation (matches XLA's bf16 matmul
    behavior), cast back to the param dtype custom_vjp requires."""
    acc = jnp.einsum(subscripts, *operands,
                     preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


# weights pytree layout (diffable primal arg #0):
#   (w_pre (u,4H), w_pos (4H,)|None, wf_z (H,W), layers)
#   layers[0]  = (wh0 (H,4H), bh0 (4H,))
#   layers[i>0] = (wx (H,4H), wh (H,4H), bx (4H,), bh (4H,))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def zoneout_lstm_scan(spec, weights, enc_gates, enc_out, prenet_steps,
                      pos_steps, zo_keys):
    """Teacher-forced scan of a ``spec.dlayers``-deep zoneout-LSTM stack.

    Args:
        weights: see layout above; layer 0's input projection is pre-folded
            into ``enc_gates``/``prenet_steps @ w_pre`` by the caller
            (models/decoder.py hoists, mirroring ops/decoder_pallas.py:59).
        enc_gates: (P, 4H) step-invariant layer-0 gate contribution
            ``enc_seg @ w_enc + bx0``.
        enc_out: (P, W) step-invariant feat_out contribution or None.
        prenet_steps: (S, P, u) per-step prenet outputs (step-major).
        pos_steps: (S, P) position scalars or None.
        zo_keys: (S, 2) uint32 per-step zoneout key data (ignored unless
            train and zoneout_rate > 0).
    Returns:
        outs (S, P, W); with capture_kd also (z0s, z1s) each (S, P, H) —
        the post-zoneout hidden sequences of layers 0 and 1
        (decoder_sa_kd.py:627-629).
    """
    out, _ = _scan_fwd(spec, weights, enc_gates, enc_out, prenet_steps,
                       pos_steps, zo_keys)
    return out


def _step_forward(spec, weights, enc_gates, hs, cs, prenet_t, pos_t, zo_key):
    """One forward step; returns (new_hs, new_cs, activated gates (L,P,4H))."""
    w_pre, w_pos, _, layers = weights
    L = spec.dlayers
    P = enc_gates.shape[0]
    keep = None
    if spec.train and _use_zoneout(spec):
        keep = zoneout_keep_masks(zo_key, 2 * L, P, spec.dunits,
                                  spec.zoneout_rate, spec.zoneout_impl)
    xproj = enc_gates + prenet_t @ w_pre
    if spec.append_position:
        xproj = xproj + pos_t[:, None] * w_pos
    new_hs, new_cs, gates_out = [], [], []
    x = None  # layer i>0 input = h_new of layer i-1
    for i in range(L):
        if i == 0:
            wh, bh = layers[0]
            pre = xproj + hs[0] @ wh + bh
        else:
            wx, wh, bx, bh = layers[i]
            pre = x @ wx + bx + hs[i] @ wh + bh
        ig, fg, gg, og = _split4(pre)
        ig = jax.nn.sigmoid(ig)
        fg = jax.nn.sigmoid(fg)
        gg = jnp.tanh(gg)
        og = jax.nn.sigmoid(og)
        c_cand = fg * cs[i] + ig * gg
        h_cand = og * jnp.tanh(c_cand)
        if keep is not None:
            h_new = jnp.where(keep[2 * i], hs[i], h_cand)
            c_new = jnp.where(keep[2 * i + 1], cs[i], c_cand)
        elif not spec.train and _use_zoneout(spec):
            r = spec.zoneout_rate
            h_new = r * hs[i] + (1.0 - r) * h_cand
            c_new = r * cs[i] + (1.0 - r) * c_cand
        else:
            h_new, c_new = h_cand, c_cand
        gates_out.append(jnp.concatenate([ig, fg, gg, og], axis=-1))
        new_hs.append(h_new)
        new_cs.append(c_new)
        x = h_new
    return tuple(new_hs), tuple(new_cs), jnp.stack(gates_out)


def _scan_fwd(spec, weights, enc_gates, enc_out, prenet_steps, pos_steps,
              zo_keys):
    w_pre, w_pos, wf_z, layers = weights
    L, H = spec.dlayers, spec.dunits
    S, P = prenet_steps.shape[0], enc_gates.shape[0]
    dtype = enc_gates.dtype

    def step(carry, inp):
        hs, cs = carry
        prenet_t, pos_t, zo_key = inp
        new_hs, new_cs, gates = _step_forward(
            spec, weights, enc_gates, hs, cs, prenet_t, pos_t, zo_key)
        return (new_hs, new_cs), (gates, jnp.stack(new_hs),
                                  jnp.stack(new_cs))

    zeros = tuple(jnp.zeros((P, H), dtype) for _ in range(L))
    pos_xs = pos_steps if pos_steps is not None else jnp.zeros(
        (S, 1), dtype)
    _, (gates_all, h_all, c_all) = lax.scan(
        step, (zeros, zeros), (prenet_steps, pos_xs, zo_keys),
        unroll=max(1, int(spec.unroll)))
    # hoisted feat_out: ONE (S*P, H) GEMM over the saved last-layer h
    outs = jnp.einsum("sph,hw->spw", h_all[:, L - 1], wf_z)
    if spec.use_enc_out:
        outs = outs + enc_out
    primal = (outs, h_all[:, 0], h_all[:, 1]) if spec.capture_kd else outs
    residuals = (weights, gates_all, h_all, c_all, prenet_steps, pos_steps,
                 zo_keys)
    return primal, residuals


def _scan_bwd(spec, residuals, cts):
    weights, gates_all, h_all, c_all, prenet_steps, pos_steps, zo_keys = \
        residuals
    w_pre, w_pos, wf_z, layers = weights
    L, H = spec.dlayers, spec.dunits
    S, _, P, _ = gates_all.shape
    dtype = gates_all.dtype
    if spec.capture_kd:
        douts, dz0, dz1 = cts
    else:
        douts, dz0, dz1 = cts, None, None

    # hoisted cotangents of the post-scan feat_out GEMM
    h_last = h_all[:, L - 1]
    d_wf_z = _f32(h_last, douts, subscripts="sph,spw->hw",
                  out_dtype=wf_z.dtype)
    d_enc_out = jnp.sum(douts, axis=0) if spec.use_enc_out else None
    dh_direct = jnp.einsum("spw,hw->sph", douts, wf_z).astype(dtype)

    # previous-step states: c for the f-gate path, h for the post-scan dW
    zero_row = jnp.zeros((1, L, P, H), dtype)
    c_prev_all = jnp.concatenate([zero_row, c_all[:-1]], axis=0)
    h_prev_all = jnp.concatenate([zero_row, h_all[:-1]], axis=0)

    use_zo = _use_zoneout(spec)

    def step(carry, inp):
        dhs, dcs = carry
        gates_t, c_prev_t, dh_dir_t, zo_key, dz0_t, dz1_t = inp
        keep = None
        if spec.train and use_zo:
            keep = zoneout_keep_masks(zo_key, 2 * L, P, H,
                                      spec.zoneout_rate, spec.zoneout_impl)
        new_dhs, new_dcs = list(dhs), list(dcs)
        dgates_out = [None] * L
        dx = None  # cotangent flowing from layer i+1's input to h_new[i]
        for i in reversed(range(L)):
            dh_new = dhs[i]
            if i == L - 1:
                dh_new = dh_new + dh_dir_t
            if dx is not None:
                dh_new = dh_new + dx
            if dz0_t is not None and i == 0:
                dh_new = dh_new + dz0_t
            if dz1_t is not None and i == 1:
                dh_new = dh_new + dz1_t
            dc_new = dcs[i]
            if keep is not None:
                kh, kc = keep[2 * i], keep[2 * i + 1]
                dh_cand = jnp.where(kh, 0, dh_new)
                dh_prev = jnp.where(kh, dh_new, 0)
                dc_cand = jnp.where(kc, 0, dc_new)
                dc_prev = jnp.where(kc, dc_new, 0)
            elif not spec.train and use_zo:
                r = spec.zoneout_rate
                dh_cand, dh_prev = (1.0 - r) * dh_new, r * dh_new
                dc_cand, dc_prev = (1.0 - r) * dc_new, r * dc_new
            else:
                dh_cand, dh_prev = dh_new, jnp.zeros_like(dh_new)
                dc_cand, dc_prev = dc_new, jnp.zeros_like(dc_new)
            ig, fg, gg, og = _split4(gates_t[i])
            c_prev = c_prev_t[i]
            tc = jnp.tanh(fg * c_prev + ig * gg)  # tanh(c_cand), recomputed
            do = dh_cand * tc
            dc_cand = dc_cand + dh_cand * og * (1.0 - tc * tc)
            di = dc_cand * gg
            df = dc_cand * c_prev
            dg = dc_cand * ig
            dc_prev = dc_prev + dc_cand * fg
            dpre = jnp.concatenate(
                [di * ig * (1.0 - ig), df * fg * (1.0 - fg),
                 dg * (1.0 - gg * gg), do * og * (1.0 - og)], axis=-1)
            wh = layers[i][0] if i == 0 else layers[i][1]
            dh_prev = dh_prev + dpre @ wh.T
            dx = (dpre @ layers[i][0].T) if i > 0 else None
            new_dhs[i], new_dcs[i] = dh_prev, dc_prev
            dgates_out[i] = dpre
        return (tuple(new_dhs), tuple(new_dcs)), jnp.stack(dgates_out)

    zeros = tuple(jnp.zeros((P, H), dtype) for _ in range(L))
    unroll = max(1, int(spec.unroll))
    if spec.capture_kd:
        xs = (gates_all, c_prev_all, dh_direct, zo_keys, dz0, dz1)
        _, dgates_all = lax.scan(step, (zeros, zeros), xs, reverse=True,
                                 unroll=unroll)
    else:
        xs = (gates_all, c_prev_all, dh_direct, zo_keys)

        def step_nokd(carry, inp):
            g, cp, dd, zk = inp
            return step(carry, (g, cp, dd, zk, None, None))

        _, dgates_all = lax.scan(step_nokd, (zeros, zeros), xs,
                                 reverse=True, unroll=unroll)

    # ---- post-scan weight gradients: one batched GEMM each ----
    dgates0 = dgates_all[:, 0]  # (S, P, 4H)
    d_w_pre = _f32(prenet_steps, dgates0, subscripts="spu,spg->ug",
                   out_dtype=w_pre.dtype)
    d_prenet = jnp.einsum("spg,ug->spu", dgates0, w_pre).astype(
        prenet_steps.dtype)
    d_enc_gates = jnp.sum(dgates0, axis=0)
    if spec.append_position:
        d_w_pos = _f32(pos_steps, dgates0, subscripts="sp,spg->g",
                       out_dtype=w_pos.dtype)
        d_pos = jnp.einsum("spg,g->sp", dgates0, w_pos).astype(
            pos_steps.dtype)
    else:
        d_w_pos, d_pos = None, None
    d_layers = []
    for i in range(L):
        dg_i = dgates_all[:, i]
        d_wh = _f32(h_prev_all[:, i], dg_i, subscripts="sph,spg->hg",
                    out_dtype=layers[i][0].dtype)
        d_b = jnp.sum(dg_i, axis=(0, 1))
        if i == 0:
            d_layers.append((d_wh, d_b.astype(layers[0][1].dtype)))
        else:
            d_wx = _f32(h_all[:, i - 1], dg_i, subscripts="sph,spg->hg",
                        out_dtype=layers[i][0].dtype)
            d_b = d_b.astype(layers[i][2].dtype)
            d_layers.append((d_wx, d_wh, d_b, d_b))
    d_weights = (d_w_pre, d_w_pos, d_wf_z, tuple(d_layers))
    d_zo = np.zeros(zo_keys.shape, dtype=jax.dtypes.float0)
    return d_weights, d_enc_gates, d_enc_out, d_prenet, d_pos, d_zo


zoneout_lstm_scan.defvjp(_scan_fwd, _scan_bwd)
