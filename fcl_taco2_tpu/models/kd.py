"""Knowledge distillation: FCL-taco2-T teacher -> FCL-taco2-S student.

Reference:
- teacher KD wrapper returns detached knowledge instead of loss
  (/root/reference/nets/knowledge_distillation/e2e_tts_tacotron2_sa_kd_teacher.py:521-608)
- student adds per-layer linear projections to teacher dims
  (encoder_sa_kd.py:110-122, decoder_sa_kd.py:478-490, pemb/eemb at
  …_kd_student.py:602-603) and 4 toggleable distillation losses
  (…_kd_student.py:759-801):
    1. output: L1+MSE student-vs-teacher mel, before+after postnet
    2. encoder: MSE over [embed, conv0, conv1, conv2, blstm]
    3. decoder: MSE over [prenet, lstm0, lstm1, post0..post4]
    4. prosody: MSE over [d_outs, p_outs, e_outs, p_embs, e_embs]

TPU-first: teacher and student run in ONE jitted step; the teacher is under
stop_gradient (no backward, no detach bookkeeping), and both forwards share
the batch's regroup plan.  Projections are applied to captured
pre-projection activations — same math as projecting inside the modules
(linear commutes with the gather-based regrouping).
"""

import jax
import jax.numpy as jnp
from jax import random

from fcl_taco2_tpu.models.config import ModelConfig
from fcl_taco2_tpu.models.taco2_sa import Batch, Tacotron2SA
from fcl_taco2_tpu.ops.masking import (lengths_to_non_pad_mask, masked_l1,
                                       masked_mse, weighted_l1, weighted_mse)
from fcl_taco2_tpu.utils import initializers as init


def _proj_init(key, d_in, d_out):
    return {"w": init.linear_weight(key, (d_in, d_out))}


def _proj(p, x):
    return x @ p["w"]


class KDStudent:
    """Student model + projections + KD loss assembly."""

    def __init__(self, student_cfg: ModelConfig, teacher_cfg: ModelConfig,
                 share_proj=True, distill_output=True, distill_encoder=True,
                 distill_decoder=True, distill_prosody=True):
        for name, cfg in (("student", student_cfg), ("teacher", teacher_cfg)):
            if (cfg.elayers != 1 or cfg.dlayers != 2
                    or cfg.reduction_factor != 1 or cfg.prenet_layers == 0
                    or cfg.postnet_layers == 0 or cfg.econv_layers == 0):
                raise ValueError(
                    f"KD requires the reference KD topology for the {name} "
                    "(elayers=1, dlayers=2, reduction_factor=1, convs, "
                    "prenet and postnet present): the KD modules hard-code "
                    "these captures (encoder_sa_kd.py:144-197, "
                    "decoder_sa_kd.py:627-702)")
        if (student_cfg.econv_layers != teacher_cfg.econv_layers
                or student_cfg.postnet_layers != teacher_cfg.postnet_layers):
            raise ValueError("KD requires matching encoder-conv and postnet "
                             "depths between student and teacher")
        self.student = Tacotron2SA(student_cfg)
        self.teacher = Tacotron2SA(teacher_cfg)
        self.scfg = student_cfg
        self.tcfg = teacher_cfg
        self.share_proj = share_proj
        self.distill_output = distill_output
        self.distill_encoder = distill_encoder
        self.distill_decoder = distill_decoder
        self.distill_prosody = distill_prosody

    # ---------------- init ----------------

    def init(self, key):
        k_student, k_proj = random.split(key)
        params, state = self.student.init(k_student)
        s, t = self.scfg, self.tcfg
        n_convs = 1 if self.share_proj else s.econv_layers
        n_lstm = 1 if self.share_proj else 2
        n_post = 1 if self.share_proj else s.postnet_layers - 1
        ks = iter(random.split(k_proj, 5 + n_convs + n_lstm + n_post))
        proj = {
            "embed": _proj_init(next(ks), s.embed_dim, t.embed_dim),
            "convs": [_proj_init(next(ks), s.econv_chans, t.econv_chans)
                      for _ in range(n_convs)],
            "blstm": _proj_init(next(ks), s.eunits, t.eunits),
            "prenet": _proj_init(next(ks), s.prenet_units, t.prenet_units),
            "lstm": [_proj_init(next(ks), s.dunits, t.dunits)
                     for _ in range(n_lstm)],
            "post": [_proj_init(next(ks), s.postnet_chans, t.postnet_chans)
                     for _ in range(n_post)],
            "pemb": _proj_init(next(ks), s.eunits, t.eunits),
            "eemb": _proj_init(next(ks), s.eunits, t.eunits),
        }
        params["kd_proj"] = proj
        return params, state

    # ---------------- knowledge loss helpers ----------------

    @staticmethod
    def _knowledge_mse(students, teachers, mask):
        """Sum of masked-mean MSEs over tensor pairs, accumulated in fp32
        regardless of compute dtype (Knowledge_loss,
        …_kd_student.py:156-179)."""
        total = 0.0
        for s_item, t_item in zip(students, teachers):
            total = total + masked_mse(s_item.astype(jnp.float32),
                                       t_item.astype(jnp.float32), mask)
        return total

    def _pick(self, plist, i):
        return plist[0] if self.share_proj else plist[i]

    # ---------------- loss ----------------

    def loss_fn(self, params, state, teacher_params, teacher_state,
                batch: Batch, rng, train=True):
        """Student base losses + distillation losses.

        teacher params/state are NOT differentiated (frozen teacher,
        tts_distill.py:396-398); the teacher forward runs in train mode like
        the reference (the KD teacher module is never .eval()'ed).
        """
        k_teacher, k_student = random.split(rng)
        _, (_, _, t_know) = self.teacher.loss_fn(
            teacher_params, teacher_state, batch, k_teacher, train=train,
            capture_kd=True)
        t_know = jax.lax.stop_gradient(t_know)

        loss, (report, new_state, s_know) = self.student.loss_fn(
            {k: v for k, v in params.items() if k != "kd_proj"}, state,
            batch, k_student, train=train, capture_kd=True)

        proj = params["kd_proj"]
        B, Tmax = batch.tokens.shape
        Lmax = batch.mel.shape[1]
        in_mask = lengths_to_non_pad_mask(batch.ilens, Tmax)[..., None]
        out_mask = lengths_to_non_pad_mask(batch.olens, Lmax)[..., None]

        if self.distill_output:
            f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
            sa, ta = f32(s_know["after_outs"]), f32(t_know["after_outs"])
            sb, tb = f32(s_know["before_outs"]), f32(t_know["before_outs"])
            if self.student.cfg.use_weighted_masking:
                # Tacotron2Loss_kd's weighted branch is the one KD criterion
                # whose weighted path actually works in the reference
                # (…_kd_student.py:72-80); the Knowledge_loss weighted path
                # is latent-broken (reduction='none' never re-reduced,
                # :156-179), so the knowledge terms stay masked means.
                n_valid = jnp.sum(batch.olens > 0).astype(jnp.float32)
                out_l1 = weighted_l1(sa, ta, out_mask, n_valid) \
                    + weighted_l1(sb, tb, out_mask, n_valid)
                out_mse = weighted_mse(sa, ta, out_mask, n_valid) \
                    + weighted_mse(sb, tb, out_mask, n_valid)
            else:
                out_l1 = masked_l1(sa, ta, out_mask) \
                    + masked_l1(sb, tb, out_mask)
                out_mse = masked_mse(sa, ta, out_mask) \
                    + masked_mse(sb, tb, out_mask)
            loss = loss + out_l1 + out_mse
            report["output_l1_loss"] = out_l1
            report["output_mse_loss"] = out_mse

        if self.distill_encoder:
            s_embed, *s_convs, s_blstm = s_know["encoder"]
            s_items = [_proj(proj["embed"], s_embed)]
            s_items += [_proj(self._pick(proj["convs"], i), sc)
                        for i, sc in enumerate(s_convs)]
            s_items.append(_proj(proj["blstm"], s_blstm))
            enc_loss = self._knowledge_mse(s_items, t_know["encoder"],
                                           in_mask)
            loss = loss + enc_loss
            report["encoder_loss"] = enc_loss

        if self.distill_decoder:
            s_pre, s_l0, s_l1_, *s_post = s_know["decoder"]
            s_items = [
                _proj(proj["prenet"], s_pre),
                _proj(self._pick(proj["lstm"], 0), s_l0),
                _proj(self._pick(proj["lstm"], 1), s_l1_),
            ]
            # postnet convs 0..n-2 projected; final (odim) layer compared
            # directly (decoder_sa_kd.py:675-691)
            for i, sp in enumerate(s_post[:-1]):
                s_items.append(_proj(self._pick(proj["post"], i), sp))
            s_items.append(s_post[-1])
            dec_loss = self._knowledge_mse(s_items, t_know["decoder"],
                                           out_mask)
            loss = loss + dec_loss
            report["decoder_loss"] = dec_loss

        if self.distill_prosody:
            s_d, s_p, s_e, s_pe, s_ee = s_know["prosody"]
            s_items = [s_d, s_p, s_e, _proj(proj["pemb"], s_pe),
                       _proj(proj["eemb"], s_ee)]
            pro_loss = self._knowledge_mse(s_items, t_know["prosody"],
                                           in_mask)
            loss = loss + pro_loss
            report["prosody_loss"] = pro_loss

        report["loss"] = loss
        return loss, (report, new_state, None)
