"""Model hyperparameter schema.

Knob names mirror the reference CLI flags (tts_train.py:22-372 and
nets/teacher_training/e2e_tts_tacotron2_sa.py:138-287) so the yaml configs in
conf/ stay interchangeable.  Teacher defaults == conf/
train_pytorch_tacotron2.sa.yaml; the student overrides dims to 256/128
(conf/train_pytorch_tacotron2.sa.student.yaml).

Pitch/energy predictor dims are hard-coded in the reference ctor
(e2e_tts_tacotron2_sa.py:419-451); here they are explicit fields with those
values as defaults.
"""

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    idim: int  # vocabulary size (phonemes incl. PAD=0)
    odim: int = 80  # mel bins

    # encoder (encoder_sa.py:23-37)
    embed_dim: int = 512
    elayers: int = 1
    eunits: int = 512
    econv_layers: int = 3
    econv_chans: int = 512
    econv_filts: int = 5
    use_residual: bool = False

    # decoder (decoder_sa.py:303-322)
    dlayers: int = 2
    dunits: int = 1024
    prenet_layers: int = 2
    prenet_units: int = 256
    postnet_layers: int = 5
    postnet_chans: int = 512
    postnet_filts: int = 5
    use_batch_norm: bool = True
    use_concate: bool = True
    reduction_factor: int = 1

    # regularization
    dropout_rate: float = 0.5
    zoneout_rate: float = 0.1

    # losses
    use_masking: bool = True

    # duration predictor (espnet DurationPredictor wiring,
    # e2e_tts_tacotron2_sa.py:406-414)
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 384
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_rate: float = 0.1
    duration_predictor_offset: float = 1.0

    # prosody conditioning (e2e_tts_tacotron2_sa.py:416-471)
    use_fe_condition: bool = True
    append_position: bool = True
    pitch_predictor_layers: int = 2
    pitch_predictor_chans: int = 384
    pitch_predictor_kernel_size: int = 3
    pitch_predictor_dropout_rate: float = 0.5
    pitch_embed_kernel_size: int = 9
    pitch_embed_dropout_rate: float = 0.5
    energy_predictor_layers: int = 2
    energy_predictor_chans: int = 384
    energy_predictor_kernel_size: int = 3
    energy_predictor_dropout_rate: float = 0.5
    energy_embed_kernel_size: int = 9
    energy_embed_dropout_rate: float = 0.5

    # optional multi-speaker conditioning (e2e_tts_tacotron2_sa.py:555-557:
    # L2-normalized speaker embedding concatenated to encoder outputs)
    spk_embed_dim: int = 0  # 0 = single speaker (reference default None)

    # static shape budget: max frames per phoneme segment
    # (reference caps at 50, preprocess.py:203)
    max_dur: int = 50

    # numerics: 'bfloat16' runs matmuls in bf16 on the MXU (losses, BN and
    # softmax-free reductions stay fp32); 'float32' for parity tests.
    compute_dtype: str = "bfloat16"

    # rematerialize the decoder scan step on backward: trades ~1 extra
    # forward of the step for O(D) less saved activation memory (enables
    # ~2x larger batches; jax.checkpoint per SURVEY HBM guidance)
    remat_decoder: bool = False

    @property
    def dec_idim(self):
        return self.eunits + self.spk_embed_dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def teacher_config(idim, **overrides):
    """FCL-taco2-T (conf/train_pytorch_tacotron2.sa.teacher.yaml)."""
    return ModelConfig(idim=idim, **overrides)


def student_config(idim, **overrides):
    """FCL-taco2-S (conf/train_pytorch_tacotron2.sa.student.yaml:
    everything 256, postnet 128, dunits 256)."""
    base = dict(
        embed_dim=256, eunits=256, econv_chans=256, dunits=256,
        prenet_units=256, postnet_chans=128,
    )
    base.update(overrides)
    return ModelConfig(idim=idim, **base)
